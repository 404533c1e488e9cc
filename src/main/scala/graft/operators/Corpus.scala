package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus telemetry over snapshots — the longitudinal reports a
  * continuously-crawled training corpus needs next to the point-in-time
  * corpus card (q157): is the crawl still finding NEW content, or
  * re-fetching the same pages (dedup effectiveness), and how fast is
  * the vocabulary saturating (tokenizer/vocab planning)?
  */
object Corpus {

  /** Vocabulary-growth curve: per snapshot, the total token
    * occurrences, the distinct vocabulary seen IN that snapshot, and
    * the vocabulary seen for the FIRST time in it (min-snapshot
    * attribution — deterministic, replayable as a plain `min` in any
    * engine). A flattening `new_vocab` curve under constant token
    * volume is the saturation signal.
    *
    * Scale shape: tokens explode map-side; `occurrences` partial-
    * aggregates per snapshot (≤ |snapshots| rows out); the distinct
    * (snapshot, token) frame drives both the per-snapshot distinct
    * count and — via ONE token-keyed min-rollup whose cardinality is
    * the vocabulary, not the corpus — the first-seen attribution.
    * Nothing corpus-sized crosses a window and the outputs are
    * snapshot-cardinality tables.
    */
  def vocabGrowth(df: DataFrame, snapshotCol: String,
      textCol: String): DataFrame = {
    val snap = col(s"`$snapshotCol`")
    val toks = df.select(snap.as("__snap"),
      explode(graft.functions.text.tokenize(col(s"`$textCol`")))
        .as("__tok"))
      .filter(col("__tok") =!= "")
    val occ = toks.groupBy(col("__snap"))
      .agg(count(lit(1)).as("tokens"))
    val st = toks.select(col("__snap"), col("__tok")).distinct()
    val perSnap = st.groupBy(col("__snap"))
      .agg(count(lit(1)).as("distinct_vocab"))
    val firstSeen = st.groupBy(col("__tok"))
      .agg(min(col("__snap")).as("__snap"))
      .groupBy(col("__snap"))
      .agg(count(lit(1)).as("new_vocab"))
    occ.join(perSnap, Seq("__snap"))
      .join(firstSeen, Seq("__snap"), "left")
      .select(col("__snap").as(snapshotCol), col("tokens"),
        col("distinct_vocab"),
        coalesce(col("new_vocab"), lit(0L)).as("new_vocab"))
  }

  /** Out-of-vocabulary rate per source against the corpus's own
    * top-`vocabSize` token vocabulary — the tokenizer-planning /
    * source-quality report (a source whose tokens mostly fall outside
    * the shared vocabulary is another language, a charset problem, or
    * boilerplate/code the tokenizer will shred). Vocabulary membership
    * uses a DETERMINISTIC top-K: count desc, token asc tie-break, so
    * the cut is identical in any engine.
    *
    * Scale shape: token counts are one map-side-combined rollup whose
    * cardinality is the token-type count (not the corpus); the top-K
    * cut is a TakeOrdered (no full sort shuffle) bounded by
    * `vocabSize`; membership is a broadcast join of the exploded
    * token stream against the vocabSize-row vocab; the output is one
    * row per source. Nothing corpus-sized is collected or windowed.
    */
  def oovRate(docs: DataFrame, srcCol: String, textCol: String,
      vocabSize: Int): DataFrame = {
    val toks = docs.select(col(s"`$srcCol`").as("__src"),
      explode(graft.functions.text.tokenize(col(s"`$textCol`")))
        .as("__tok"))
      .filter(col("__tok") =!= "")
    val vocab = toks.groupBy(col("__tok"))
      .agg(count(lit(1)).as("__c"))
      .orderBy(col("__c").desc, col("__tok").asc)
      .limit(vocabSize)
      .select(col("__tok"), lit(1L).as("__in_vocab"))
    toks.join(broadcast(vocab), Seq("__tok"), "left")
      .groupBy(col("__src"))
      .agg(
        count(lit(1)).as("n_tokens"),
        sum(when(col("__in_vocab").isNull, 1L).otherwise(0L))
          .as("n_oov"),
        countDistinct(when(col("__in_vocab").isNull, col("__tok")))
          .as("distinct_oov"))
      .select(col("__src").as("source"), col("n_tokens"),
        col("n_oov").cast("long").as("n_oov"),
        round(col("n_oov").cast("double") / col("n_tokens"), 6)
          .as("oov_rate"),
        col("distinct_oov"))
  }


  /** Vocabulary coverage curve — for each candidate vocab size k, the
    * fraction of all token OCCURRENCES covered by the top-k token
    * types (count desc, token asc — the deterministic cut [[oovRate]]
    * uses): the tokenizer-sizing chart ("32k types cover 97.2%").
    *
    * Scale shape: one type-bounded count rollup (map-side combined),
    * ONE TakeOrdered of max(ks) rows (no full sort shuffle), and a
    * window over those max(ks) rows only — never corpus-sized. The
    * coverage fraction is an exact integer ratio, so any engine
    * computes the identical double.
    */
  def vocabCoverage(docs: DataFrame, textCol: String,
      ks: Seq[Int]): DataFrame = {
    require(ks.nonEmpty && ks.forall(_ > 0),
      "vocabCoverage: ks must be positive")
    import org.apache.spark.sql.expressions.Window
    val spark = docs.sparkSession
    val toks = docs.select(
      explode(graft.functions.text.tokenize(col(s"`$textCol`")))
        .as("__tok"))
      .filter(col("__tok") =!= "")
    val counts = toks.groupBy(col("__tok"))
      .agg(count(lit(1)).as("__c"))
    val total = counts.agg(sum(col("__c"))).head().getLong(0)
    val kmax = ks.max
    val top = counts.orderBy(col("__c").desc, col("__tok").asc)
      .limit(kmax)
    val w = Window.orderBy(col("__c").desc, col("__tok").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = top
      .withColumn("__rn", row_number().over(
        Window.orderBy(col("__c").desc, col("__tok").asc)))
      .withColumn("__cum", sum(col("__c")).over(w))
      .select(col("__rn"), col("__cum"))
    val vTypes = cum.count()
    import spark.implicits._
    val kdf = ks.map(k => (k.toLong, math.min(k.toLong, vTypes)))
      .toDF("k", "__k0")
    kdf.join(cum, col("__k0") === col("__rn"))
      .select(col("k"),
        col("__k0").as("types_used"),
        col("__cum").as("occ_covered"),
        (col("__cum").cast("double") / total).as("coverage"))
      .orderBy(col("k"))
  }


  /** Per-source KL divergence from the corpus token distribution —
    * the data-mixing diagnostic ("how far does this source's language
    * drift from the blend?"): over the corpus's deterministic top-K
    * vocabulary (the [[oovRate]] cut), KL(source ‖ corpus) =
    * Σ p·ln(p/q) with p, q renormalized WITHIN the vocabulary (so the
    * measure compares shape, not OOV mass — OOV is [[oovRate]]'s job).
    *
    * Scale shape: vocab-bounded count tables broadcast against the
    * exploded token stream; per-source sums are map-side combined;
    * output is one row per source. Counts exact; the ln fold rounds
    * at 6 dp on compared surfaces.
    */
  def sourceDivergence(docs: DataFrame, srcCol: String, textCol: String,
      vocabSize: Int): DataFrame = {
    val toks = docs.select(col(s"`$srcCol`").as("__src"),
      explode(graft.functions.text.tokenize(col(s"`$textCol`")))
        .as("__tok"))
      .filter(col("__tok") =!= "")
    val vocab = toks.groupBy(col("__tok"))
      .agg(count(lit(1)).as("__qc"))
      .orderBy(col("__qc").desc, col("__tok").asc)
      .limit(vocabSize)
    val vtoks = toks.join(broadcast(vocab.select(col("__tok"))), "__tok")
    val qTot = vtoks.count()
    val q = vocab.withColumn("__q",
      col("__qc").cast("double") / qTot)
    val pCounts = vtoks.groupBy(col("__src"), col("__tok"))
      .agg(count(lit(1)).as("__pc"))
    val pTot = vtoks.groupBy(col("__src"))
      .agg(count(lit(1)).as("__pt"))
    pCounts.join(pTot, "__src")
      .join(broadcast(q.select(col("__tok"), col("__q"))), "__tok")
      .withColumn("__p", col("__pc").cast("double") / col("__pt"))
      .groupBy(col("__src"))
      .agg(
        sum(col("__p") * log(col("__p") / col("__q"))).as("kl"),
        count(lit(1)).as("vocab_types"),
        max(col("__pt")).as("vocab_tokens"))
      .select(col("__src").as("source"), col("kl"),
        col("vocab_types"), col("vocab_tokens"))
  }

  /** Key-skew report (X161, round 10) — the shuffle-health diagnostic
    * run BEFORE keying a 100 TB join/aggregation: per-key row counts
    * summarized as count-of-keys, total, max, exact interpolated
    * p50/p90/p99 of the per-key counts, the top-1 key share, and the
    * GINI coefficient of the count distribution (0 = perfectly even,
    * →1 = one key owns everything — the salting trigger).
    *
    * Gini via the sorted-cumulative identity
    * G = 2·Σᵢ i·cᵢ / (n·Σc) − (n+1)/n (cᵢ ascending, i 1-based) —
    * Σ i·cᵢ folds as an EXACT long (tie order cannot change it), the
    * two divisions are the only IEEE ops. Everything after the
    * per-key groupBy is KEY-cardinality-sized, and the single window
    * runs over that bounded count table, not the corpus (the
    * documented global-window exception class).
    */
  def keySkewReport(df: DataFrame, key: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val counts = df.groupBy(key.as("__ks_k"))
      .agg(count(lit(1)).as("__ks_c"))
    val ranked = counts.select(col("__ks_c"),
      row_number().over(
        Window.orderBy(col("__ks_c"), col("__ks_k"))).as("__ks_i"))
    ranked.agg(
        count(lit(1)).cast("long").as("n_keys"),
        sum(col("__ks_c")).cast("long").as("total_rows"),
        max(col("__ks_c")).cast("long").as("max_key_rows"),
        // exact interpolated percentiles, 6-dp rounded DOUBLES — a
        // long cast here would be Spark-truncate vs DuckDB-round (the
        // q137 trap) on every .5 interpolation
        round(percentile(col("__ks_c"), lit(0.5)), 6).as("p50"),
        round(percentile(col("__ks_c"), lit(0.9)), 6).as("p90"),
        round(percentile(col("__ks_c"), lit(0.99)), 6).as("p99"),
        sum(col("__ks_i") * col("__ks_c")).cast("long").as("__ks_ic"))
      .select(col("n_keys"), col("total_rows"), col("max_key_rows"),
        col("p50"), col("p90"), col("p99"),
        round(col("max_key_rows").cast("double") /
          col("total_rows").cast("double"), 6).as("top_share"),
        round(lit(2.0) * col("__ks_ic").cast("double") /
          (col("n_keys").cast("double") * col("total_rows").cast("double"))
          - (col("n_keys") + lit(1L)).cast("double") /
            col("n_keys").cast("double"), 6).as("gini"))
  }

  // -------------------------------------------------------------------
  // X194 (round 12): deterministic Poisson-bootstrap confidence
  // intervals — the error bars a corpus report needs before anyone
  // compares two pipeline versions' per-source statistics. Standard
  // Poisson(1) bootstrap (the streaming-friendly resample: each row's
  // weight in replica b is an independent Poisson(1) draw, so a
  // replica is ONE weighted pass, never a materialized resample), made
  // engine-exact: the draw is an integer hash — lowbias32-style
  // avalanche of (id, b) in plain 64-bit arithmetic both engines
  // evaluate identically — compared against the exact integer
  // thresholds floor(CDF_Poisson(1)(k) * 2^32), and each replica mean
  // is an exact integer pair (Σ w·x, Σ w) divided ONCE.

  /** floor(2^32 · P(Poisson(1) ≤ k)) for k = 0..8; a draw ≥ t(8) gets
    * weight 9 (P ≈ 1.1e-7 — the bounded tail).
    */
  private[graft] val poissonThresholds: Seq[Long] = Seq(
    1580030168L, 3160060337L, 3950075421L, 4213413783L, 4279248373L,
    4292415291L, 4294609777L, 4294923276L, 4294962463L)

  /** 32-bit avalanche of (id, replica) in pure +,*,%,^,>> arithmetic
    * — every engine computes the identical value (no engine-native
    * hash anywhere).
    *
    * The id multiply is SPLIT 16/16 (round-13 ADVICE): a direct
    * `id * 2654435761` overflows signed 64-bit for ids above ~3.4e9 —
    * Spark silently wraps (non-ANSI) while the DuckDB oracle raises
    * and ANSI mode would throw. `(id mod 2³²) = ih·2¹⁶ + il`, so
    * `id·K mod 2³² = ((ih·K mod 2¹⁶)·2¹⁶ + il·K) mod 2³²` with every
    * intermediate < 2⁴⁸ — overflow-free for ANY long id, and
    * bit-identical to the old value wherever the old value was
    * defined (q284's oracle mirrors the same split).
    */
  private[graft] def mix32(id: Column, b: Column): Column = {
    val m = lit(4294967296L)
    val k = lit(2654435761L)
    val idm = pmod(id.cast("long"), m)
    val ih = shiftright(idm, 16)
    val il = pmod(idm, lit(65536L))
    val prod = pmod(ih * k, lit(65536L)) * lit(65536L) + il * k
    val h0 = pmod(prod + b.cast("long") * lit(40503L), m)
    val h1 = pmod((shiftright(h0, 16).bitwiseXOR(h0)) * lit(0x45d9f3bL), m)
    val h2 = pmod((shiftright(h1, 16).bitwiseXOR(h1)) * lit(0x45d9f3bL), m)
    shiftright(h2, 16).bitwiseXOR(h2)
  }

  /** Poisson(1) weight of row `id` in replica `b` (0..9). */
  private[graft] def poissonWeight(id: Column, b: Column): Column = {
    val h = mix32(id, b)
    poissonThresholds.zipWithIndex.foldRight(lit(9): Column) {
      case ((t, k), rest) => when(h < lit(t), lit(k)).otherwise(rest)
    }
  }

  /** Type-7 quantile of the sorted `arr` at `q` — the engine-wide
    * convention (guarded by the caller for empty arrays).
    */
  private def q7(arr: Column, q: Double): Column = {
    val n = size(arr)
    val h = (n - 1).cast("double") * lit(q)
    val lo = floor(h).cast("int")
    val frac = h - lo.cast("double")
    element_at(arr, lo + 1) +
      frac * (element_at(arr, least(lo + 2, n)) - element_at(arr, lo + 1))
  }

  /** Per-`groupCol` mean of integral `valueCol` with a bootstrap
    * [lo, hi] interval: `reps` Poisson(1) replicas drawn on the
    * portable row identity `idCol`, replica mean = exact integer
    * (Σ w·x) / (Σ w) (one IEEE division), interval = type-7 quantiles
    * (the engine-wide convention) at (alpha/2, 1−alpha/2) over the
    * sorted replica means. A group whose every replica drew all-zero
    * weights (1-2 row groups only) surfaces with a null interval and
    * `reps_used = 0`.
    *
    * Scale shape (round 13, verdict ask #8 — the native partial): ONE
    * aggregation pass over the ROWS — each row's `reps` draws happen
    * inside [[graft.plans.NativeBoot.bootstrapPairs]]'s update, so
    * the former `explode(sequence(1, reps))` 64× row inflation is
    * gone; per-group state is `2·reps` longs, map-side combined, and
    * the base (n, mean) ride the SAME aggregation (no second scan, no
    * join). Bit-identical to the exploded form (integer sums are
    * order-free; Round13Spec pins parity). Integral values only (the
    * byTokenBudget rule) so every sum is exact.
    */
  def bootstrapMeanCI(df: DataFrame, groupCol: String, valueCol: String,
      idCol: String, reps: Int = 64, alpha: Double = 0.05): DataFrame = {
    require(reps >= 2 && alpha > 0 && alpha < 1,
      "bootstrapMeanCI: reps >= 2 and alpha in (0,1)")
    val vType = df.schema(valueCol).dataType.typeName
    require(Seq("byte", "short", "integer", "long").contains(vType),
      s"bootstrapMeanCI: value column '$valueCol' is $vType — integral " +
        "values keep the replica sums exact (the byTokenBudget rule)")
    val grp = col(s"`$groupCol`")
    val agg = df.select(grp,
        col(s"`$idCol`").cast("long").as("__bs_id"),
        col(s"`$valueCol`").cast("long").as("__bs_x"))
      .groupBy(grp)
      .agg(graft.plans.NativeBoot.bootstrapPairs(
          col("__bs_id"), col("__bs_x"), reps).as("__bs"),
        count(lit(1)).cast("long").as("n"),
        sum(col("__bs_x")).as("__sx"))
    // replica means from the (wx, wn) arrays: zero-weight replicas
    // drop out (null -> filtered), then one sort over a reps-sized
    // array per GROUP row — never a corpus-sized HOF
    val means = array_sort(filter(
      zip_with(col("__bs.wx"), col("__bs.wn"), (wx, wn) =>
        when(wn > 0, wx.cast("double") / wn.cast("double"))),
      m => m.isNotNull))
    agg.withColumn("__bs_means", means)
      .select(grp, col("n"),
        (col("__sx").cast("double") / col("n").cast("double")).as("mean"),
        when(size(col("__bs_means")) > 0, q7(col("__bs_means"), alpha / 2))
          .as("ci_lo"),
        when(size(col("__bs_means")) > 0,
          q7(col("__bs_means"), 1 - alpha / 2)).as("ci_hi"),
        size(col("__bs_means")).cast("long").as("reps_used"))
  }

  /** The pre-round-13 exploded form, kept as the parity reference for
    * the native partial (Round13Spec): `reps × rows` exploded weights,
    * (group, replica) integer partials, then the same quantiles.
    */
  private[graft] def bootstrapMeanCIExploded(df: DataFrame,
      groupCol: String, valueCol: String, idCol: String, reps: Int,
      alpha: Double): DataFrame = {
    val grp = col(s"`$groupCol`")
    val weighted = df.select(grp, col(s"`$idCol`").cast("long").as("__bs_id"),
        col(s"`$valueCol`").cast("long").as("__bs_x"))
      .select(grp, col("__bs_id"), col("__bs_x"),
        explode(sequence(lit(1), lit(reps))).as("__bs_b"))
      .withColumn("__bs_w", poissonWeight(col("__bs_id"), col("__bs_b")))
    val repMeans = weighted.groupBy(grp, col("__bs_b"))
      .agg(sum(col("__bs_w") * col("__bs_x")).as("__bs_wx"),
        sum(col("__bs_w")).as("__bs_wn"))
      .withColumn("__bs_mean",
        when(col("__bs_wn") > 0,
          col("__bs_wx").cast("double") / col("__bs_wn").cast("double")))
    val base = df.groupBy(grp)
      .agg(count(lit(1)).cast("long").as("n"),
        sum(col(s"`$valueCol`").cast("long")).as("__sx"))
      .withColumn("mean",
        col("__sx").cast("double") / col("n").cast("double"))
      .drop("__sx")
    val ci = repMeans
      .filter(col("__bs_mean").isNotNull) // an all-zero-weight replica
      .groupBy(grp)
      .agg(array_sort(collect_list(col("__bs_mean"))).as("__bs_means"))
      .select(grp, q7(col("__bs_means"), alpha / 2).as("ci_lo"),
        q7(col("__bs_means"), 1 - alpha / 2).as("ci_hi"),
        size(col("__bs_means")).cast("long").as("reps_used"))
    base.join(ci, Seq(groupCol), "left")
      .select(grp, col("n"), col("mean"), col("ci_lo"), col("ci_hi"),
        coalesce(col("reps_used"), lit(0L)).as("reps_used"))
  }
}
