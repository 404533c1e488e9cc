package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational combinators the reference exercises but Spark has no single
  * builtin for (SURVEY.md §2.4/§2.6 ⚠ rows).
  */
object Relational {

  /** ClickHouse `GROUP BY keys WITH TOTALS` (README.md:83): the grouped
    * rows plus ONE grand-total row (group keys null). Implemented with
    * `groupingSets((keys), ())` — exactly CH's lattice, one aggregation
    * pass with partial aggregation. (A `rollup` would also compute every
    * intermediate subtotal level for multi-key calls only to discard
    * them — at scale that is Expand output proportional to the key
    * count for nothing.)
    */
  def withTotals(df: DataFrame, keys: Seq[String], aggs: Seq[Column]): DataFrame = {
    require(keys.nonEmpty, "withTotals needs at least one group key")
    require(aggs.nonEmpty, "withTotals needs at least one aggregate")
    val keyCols = keys.map(col)
    df.groupingSets(Seq(keyCols, Seq.empty), keyCols: _*)
      .agg(aggs.head, aggs.tail: _*)
  }

  /** ClickHouse/MySQL `LIMIT offset, n` (README.md:86,119). */
  def limitOffset(df: DataFrame, offset: Int, n: Int): DataFrame =
    if (offset == 0) df.limit(n) else df.offset(offset).limit(n)

  /** Deterministic hash sampling — the Spark analogue of the reference's
    * `SAMPLE BY CounterUserIDHash` (ddl/hits.sql:119): same rows selected
    * on every run and every engine, because selection is a pure function
    * of the sampling key. `hashFn` defaults to Spark's Murmur3 `hash`;
    * pass an arithmetic function for cross-engine reproducibility.
    */
  def sampleByHash(df: DataFrame, key: Column, everyKth: Int,
      hashFn: Column => Column = c => hash(c)): DataFrame =
    df.filter(pmod(hashFn(key), lit(everyKth)) === 0)

  /** SCD2 / temporal-validity join (README.md:292-296): equi-join on
    * `key` with a range residual on the fact's date vs the dimension's
    * [from, to] validity window. The dimension is broadcast — SCD2 dims
    * are small by construction, and at 100 TB fact scale a shuffle of the
    * fact table to join a KB-sized dim would be the single worst plan
    * choice available. Catalyst keeps the equi conjunct as the hash key
    * and evaluates the range conjuncts as a join filter.
    */
  def scd2Join(fact: DataFrame, dim: DataFrame, keyCond: Column,
      factDate: Column, dimFrom: Column, dimTo: Column,
      joinType: String = "inner"): DataFrame =
    fact.join(broadcast(dim),
      keyCond && factDate >= dimFrom && factDate <= dimTo,
      joinType)

  /** Skew-safe equi-join by key salting. For a hot fact key at 100 TB
    * (one key = a double-digit share of the table) the join-key hash
    * sends the whole hot key to ONE task. Preference order is broadcast
    * (dim small) then AQE skew-join splitting (sort-merge only); this is
    * the explicit fallback when neither applies — e.g. a shuffled hash
    * join, or when downstream work must also spread. Mechanics: the
    * fact side derives a deterministic salt in [0, saltN) from
    * `spreadBy` (any fact column that varies within a key — an id/line
    * number), the other side is replicated saltN times, and the join
    * key becomes (key, salt) — the hot key now lands on saltN tasks.
    * Output equals the unsalted join exactly (q39's oracle asserts it);
    * cost is saltN copies of the replicated side's shuffle.
    */
  def saltedJoin(fact: DataFrame, other: DataFrame, factKey: String,
      otherKey: String, spreadBy: Column, saltN: Int,
      joinType: String = "inner"): DataFrame = {
    // right/full outer would emit each unmatched REPLICATED-side row
    // once per salt value (and once per uncovered salt of matched
    // keys), breaking the equals-the-plain-join contract; the fact
    // side is never replicated, so fact-preserving types are safe
    require(Set("inner", "left", "left_outer", "leftouter", "left_semi",
        "leftsemi", "left_anti", "leftanti", "semi", "anti")
        .contains(joinType.toLowerCase.replace(" ", "_")),
      s"saltedJoin supports inner/left/semi/anti join types, not $joinType " +
        "(outer-preserving the replicated side would duplicate its rows)")
    val f = fact.withColumn("__salt", pmod(hash(spreadBy), lit(saltN)))
    val o = other.withColumn("__salt",
      explode(sequence(lit(0), lit(saltN - 1))))
    f.join(o, f(factKey) === o(otherKey) && f("__salt") === o("__salt"),
        joinType)
      .drop("__salt")
  }

  /** Latest-row-per-key via `max_by` aggregation — the scale-preferred
    * form of the row_number-window compaction. A window forces a full
    * shuffle AND a per-partition sort of every row with no map-side
    * reduction (and AQE skew splitting does not apply to windows); this
    * aggregation form gets partial aggregation, so each map task reduces
    * its rows to one candidate per key before the shuffle — on a skewed
    * key (power users) at 100x scale that is the difference between a
    * bounded shuffle and a scale-killer. Rows are compared by the
    * lexicographic order of `ordCols` (make the combination unique, e.g.
    * include an id column, for deterministic results).
    */
  def latestByKey(df: DataFrame, keyCols: Seq[String],
      ordCols: Seq[String]): DataFrame = {
    val payload = df.columns.toIndexedSeq.filterNot(keyCols.contains)
    df.groupBy(keyCols.map(col): _*)
      .agg(max_by(struct(payload.map(col): _*),
        struct(ordCols.map(col): _*)).as("__latest"))
      .select(keyCols.map(col) :+ col("__latest.*"): _*)
  }

  /** Latest-version-per-entity compaction for VersionedCollapsingMergeTree
    * data (ddl/visits.sql:229-233): a state row (sign=+1) is live unless a
    * cancel row (sign=-1) with the same (id, version) exists; the current
    * state of an entity is its live row with the highest version.
    *
    * Shuffle analysis: the anti-join and the window both hash-partition by
    * `idCols`, so AQE/EnsureRequirements reuses one exchange; cancel rows
    * are a small fraction of state rows, so the anti-join's right side is
    * cheap. At 100 TB this runs per week-partition (versions of a visit
    * share StartDate's week), keeping state bounded.
    */
  def latestVersions(df: DataFrame, idCols: Seq[String], versionCol: String,
      signCol: String): DataFrame = {
    val plus = df.filter(col(signCol) === 1)
    val minus = df.filter(col(signCol) === -1)
      .select((idCols :+ versionCol).map(col): _*)
    val live = plus.join(minus, idCols :+ versionCol, "left_anti")
    val w = Window.partitionBy(idCols.map(col): _*)
      .orderBy(col(versionCol).desc)
    live.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
  }
}
