package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.text

/** Hashed-feature linear quality classifier (X198, round 13) — the
  * fastText/CCNet-style model that decides "keep or drop" for most
  * public LLM corpora, re-expressed as two bounded Spark passes:
  *
  *  - '''train''': tokens hash into `buckets` slots (the hashing
  *    trick — vocabulary-free, collision-tolerant), per-slot label
  *    totals aggregate map-side (output bounded by `buckets`, never
  *    the corpus), and each slot's weight is the additive-smoothed
  *    log-odds `ln((pos + ½) / (neg + ½))` in 1e-6 fixed point — the
  *    Naive-Bayes/logistic-init weight both engines replay (the BM25
  *    `idf_fp` precedent: exact integer counts, one `ln`, one round);
  *  - '''score''': the weight table collects into ONE dense
  *    `buckets`-length array (bounded by contract, the byTokenBudget
  *    dictionary rule), ships to executors as a codegen reference
  *    object, and every document's logit is one tight kernel loop
  *    over its tokens ([[graft.plans.NativeHashes.hashedScore]]) —
  *    ZERO shuffle, zero interpreted lambdas, the corpus never
  *    leaves its scan partitioning.
  *
  * Composes with [[Select.calibrateIsotonic]] (bin the logit, fit
  * calibrated keep-probabilities) exactly the way production quality
  * filters are deployed.
  */
object Classify {

  val defaultHashP = 1000000007L

  /** Per-bucket training table: `bucket`, `n_pos`, `n`, and `w_fp` =
    * round(ln((n_pos + 0.5) / (n − n_pos + 0.5)) · 1e6). `labelCol`
    * must be integral 0/1 (the engine-wide integer-inputs policy).
    */
  def trainHashedLogOdds(df: DataFrame, textCol: String,
      labelCol: String, buckets: Int,
      p: Long = defaultHashP): DataFrame = {
    require(buckets >= 2 && buckets <= (1 << 20),
      s"trainHashedLogOdds: buckets $buckets out of [2, 2^20]")
    val integral = Seq("byte", "short", "integer", "long")
    require(integral.contains(df.schema(labelCol).dataType.typeName),
      s"trainHashedLogOdds: label '$labelCol' must be integral 0/1")
    val toks = df.select(col(s"`$labelCol`").cast("long").as("__y"),
        explode(text.tokenize(col(s"`$textCol`"))).as("__tok"))
      .filter(col("__tok") =!= "")
    toks.select(pmod(graft.plans.NativeHashes.rollingHash(
          col("__tok"), p), lit(buckets.toLong)).as("bucket"),
        col("__y"))
      .groupBy(col("bucket"))
      .agg(sum(col("__y")).as("n_pos"), count(lit(1)).as("n"))
      .withColumn("w_fp",
        round(log((col("n_pos").cast("double") + 0.5) /
          ((col("n") - col("n_pos")).cast("double") + 0.5)) * 1e6)
          .cast("long"))
  }

  /** `df` plus `logit_fp` — the fixed-point hashed linear score of
    * `textCol` under a [[trainHashedLogOdds]] table. The table
    * collects to a dense array (absent buckets weigh 0, the hashing-
    * trick neutral default) and broadcasts inside the expression;
    * scoring is map-side only.
    */
  def scoreHashedLogOdds(df: DataFrame, textCol: String,
      weights: DataFrame, buckets: Int,
      p: Long = defaultHashP): DataFrame = {
    require(buckets >= 2 && buckets <= (1 << 20),
      s"scoreHashedLogOdds: buckets $buckets out of [2, 2^20]")
    val w = new Array[Long](buckets)
    weights.select(col("bucket").cast("long"), col("w_fp").cast("long"))
      .collect().foreach { r =>
        val b = r.getLong(0)
        require(b >= 0 && b < buckets,
          s"scoreHashedLogOdds: bucket $b outside [0, $buckets)")
        w(b.toInt) = r.getLong(1)
      }
    df.withColumn("logit_fp", graft.plans.NativeHashes.hashedScore(
      filter(text.tokenize(col(s"`$textCol`")), t => t =!= ""),
      w.toIndexedSeq, p))
  }
}
