package graft

import org.apache.spark.sql.functions._

/** Scratch stage-profiler for q22 (not part of the driver contract). */
object Prof {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Graft.local("graft-prof")
    import graft.functions.text
    def time(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"PROF $name ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    val docs = Graft.table(spark, dir, "documents")
    time("scan_only")(noop(docs.select(col("doc_id"), col("text"))))
    time("tokenize_ngrams")(noop(docs.select(col("doc_id"),
      text.ngrams(text.tokenize(col("text")), 3).as("__sh"))))
    val sh = docs.select(col("doc_id"),
      text.ngrams(text.tokenize(col("text")), 3).as("__sh"))
    time("signature")(noop(sh.filter(size(col("__sh")) > 0)
      .select(col("doc_id"),
        graft.plans.NativeHashes.minHashSignature64(col("__sh"), 64).as("sig"))))
    time("cand_pairs")(noop(
      graft.operators.Dedup.lshCandidatePairs(sh, "doc_id", "__sh", 64, 16)))
    time("full_q22")(noop(
      graft.operators.Dedup.nearDupPairs(docs, "doc_id", "text", 3, 64, 16, 0.5)))
    time("full_q22_again")(noop(
      graft.operators.Dedup.nearDupPairs(docs, "doc_id", "text", 3, 64, 16, 0.5)))

    // the registered q38 (cold + steady state)
    def q38() = SparkEntry.queries("q38_pipeline_e2e")(spark, dir)
    time("q38")(noop(q38()))
    time("q38_again")(noop(q38()))
    spark.stop()
  }
}
