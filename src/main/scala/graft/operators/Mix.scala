package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Data-mixing operators for training-corpus curation: per-stratum
  * quota sampling and mixture-weight computation.
  *
  * The naive quota sample — `row_number() OVER (PARTITION BY stratum
  * ORDER BY hash)` then `rank <= quota` — shuffles the WHOLE corpus
  * into |strata| window partitions; with 5 languages at 100 TB that is
  * five 20 TB partitions through five tasks. [[stratifiedSample]] is
  * the two-pass form that scales: a tiny count aggregate sizes a
  * per-stratum hash THRESHOLD (quota/count of the 32-bit hash space,
  * with 30% headroom), the threshold filters map-side at the scan, and
  * only the ~1.3x-quota survivors enter the exact window trim. The
  * window sees O(|strata| x quota) rows, not the corpus.
  *
  * The hash is the engine-portable multiplicative hash the SAMPLE
  * clause already uses (Knuth 2654435761 on the id's low 16 bits) —
  * deterministic and replayable in any SQL engine, so a mixture drawn
  * here is reproducible anywhere.
  */
object Mix {

  /** The portable 32-bit-space hash (same family as `ChSample`'s
    * portable mode).
    */
  def portableHash(id: Column): Column =
    pmod(pmod(id, lit(65536L)) * lit(2654435761L), lit(4294967296L))

  /** Deterministic quota sample per stratum: exactly
    * `min(quota, |stratum|)` rows each, chosen by portable-hash order
    * (ties broken by id). The per-stratum counts are collected to the
    * driver — strata are categorical (languages, sources), bounded by
    * the same contract as dictionaries, and guarded by `maxStrata`.
    */
  def stratifiedSample(df: DataFrame, stratumCol: String, idCol: String,
      quota: Int, maxStrata: Int = 100000): DataFrame = {
    require(quota > 0, "stratifiedSample: quota > 0")
    val stratum = col(s"`$stratumCol`")
    val id = col(s"`$idCol`")
    val counts = df.groupBy(stratum).count()
      .limit(maxStrata + 1).collect()
    require(counts.length <= maxStrata,
      s"stratifiedSample: more than $maxStrata strata — a continuous " +
        "stratum column? Bucket it first.")
    // threshold = share of the 32-bit hash space that yields ~1.3x the
    // quota; full space when the stratum is smaller than the quota
    val thresholds = counts.map { r =>
      val n = r.getLong(1)
      val t =
        if (n <= quota) 4294967296L
        else math.min(4294967296L,
          (4294967296L * 1.3 * quota / n).toLong + 1)
      (r.get(0), t)
    }.toMap
    val thrCol = thresholds.foldLeft(lit(4294967296L)) {
      case (acc, (k, t)) => when(stratum <=> lit(k), lit(t)).otherwise(acc)
    }
    val w = Window.partitionBy(stratum)
      .orderBy(col("__mix_h"), id)
    df.withColumn("__mix_h", portableHash(id))
      // map-side: the corpus never reaches the window
      .filter(col("__mix_h") < thrCol)
      .withColumn("__mix_rk", row_number().over(w))
      .filter(col("__mix_rk") <= quota)
      .drop("__mix_h", "__mix_rk")
  }

  /** Temperature-scaled mixture weights per stratum:
    * `w_s = m_s^alpha / sum(m^alpha)` over a measure column (token
    * counts, usually). alpha=1 is proportional sampling, alpha->0
    * approaches uniform — the standard multilingual-mixing dial.
    * Output: (stratum, measure, weight).
    */
  def mixtureWeights(df: DataFrame, stratumCol: String,
      measureCol: String, alpha: Double): DataFrame = {
    val stratum = col(s"`$stratumCol`")
    val m = df.groupBy(stratum)
      .agg(sum(col(s"`$measureCol`")).cast("long").as("measure"))
    m.withColumn("__pow", pow(col("measure").cast("double"), lit(alpha)))
      .withColumn("weight",
        round(col("__pow") / sum(col("__pow")).over(Window.partitionBy()),
          6))
      .drop("__pow")
  }
}
