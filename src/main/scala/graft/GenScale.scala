package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

/** Dev/bench-only generator of a ~sf1 slice (10x sf0.1) of the three
  * PIPELINE tables — documents, events, embeddings — used by
  * [[Bench]]'s large-scale section. The driver's corpus stops at sf0.1;
  * the 100x-design claims (chunked asof, banded near-dup, two-stage
  * ANN) deserve at least one order of magnitude of headroom check.
  *
  * Distribution-matched to the driver's sf0.1 tables (TESTDATA.md), not
  * row-replicated: replicating rows 10x would plant 10-sized
  * exact-duplicate clusters and turn the near-dup benchmarks into a
  * different (quadratic-in-cluster) workload. Instead, documents draw
  * fresh token sequences from the SAME vocabulary (extracted from the
  * sf0.1 corpus) with ~2.5% planted near-dup pairs, events spread over
  * the same 30-day window / 5 types / 10x users with nanos-long
  * timestamps exactly like the driver's parquet, and embeddings are
  * label-clustered 64-dim float vectors. Everything derives from
  * xxhash64(id) — deterministic under any partitioning.
  */
object GenScale {

  private def hmod(salt: Int, n: Long, cols: Column*): Column =
    pmod(xxhash64((lit(salt) +: cols): _*), lit(n))

  /** Generate into `outDir` unless the completion marker exists. */
  def ensure(spark: SparkSession, srcSf: String, outDir: String): Unit = {
    val marker = Paths.get(s"$outDir/_GRAFT_COMPLETE")
    if (Files.exists(marker)) return
    FsUtil.rmTree(outDir)

    // ---- documents: 50k docs over the sf0.1 vocabulary -------------
    val vocab = spark.read.parquet(s"$srcSf/documents.parquet")
      .select(explode(split(col("text"), " ")).as("w"))
      .where(length(col("w")) > 0)
      .distinct().orderBy(col("w"))
      .collect().map(_.getString(0)).toIndexedSeq
    val vArr = array(vocab.map(lit): _*)
    val v = vocab.length.toLong
    def word(seed: Int, cols: Column*): Column =
      element_at(vArr, (hmod(seed, v, cols: _*) + 1).cast("int"))
    val langs = array(Seq("en", "es", "de", "fr", "zh").map(lit): _*)
    val docs = spark.range(50000).select(col("id").as("doc_id"),
        // a doc with id%40==1 re-derives its neighbour's token stream
        // and APPENDS one extra token — a planted near-dup pair at
        // 3-shingle Jaccard s/(s+1) ∈ [0.89, 0.99], matching the
        // driver's sf0.1 plant (measured J 0.80–1.0, median 0.98).
        // Round 11: the original every-17th-token perturbation landed
        // short docs at J 0.5–0.7, where 16x4 MinHash-LSH detection is
        // only 0.64–0.95 — the first sf1 gate caught 44 of 1238 planted
        // pairs missing (q22/q75/q233). The corpus premise the oracles
        // rely on is "near-dups sit where LSH detection ~ 1", and the
        // scaled corpus must preserve the driver's contract, not invent
        // a harder one.
        when(pmod(col("id"), lit(40)) === 1, col("id") - 1)
          .otherwise(col("id")).as("base"),
        (pmod(col("id"), lit(40)) === 1).as("perturb"))
      .select(col("doc_id"),
        concat_ws(" ", concat(
          transform(
            sequence(lit(1L), hmod(1, 96, col("base")) + 10),
            j => word(2, col("base"), j)),
          when(col("perturb"), array(word(3, col("base"), lit(0L))))
            .otherwise(array().cast("array<string>")))).as("text"),
        element_at(langs, (hmod(4, 5, col("doc_id")) + 1).cast("int"))
          .as("lang"),
        concat(lit("src"), hmod(5, 20, col("doc_id"))).as("source"))
      .withColumn("n_chars", length(col("text")).cast("long"))
    docs.repartition(8).write.mode("overwrite")
      .parquet(s"$outDir/documents.parquet")

    // ---- events: 1M rows, ts = NANOS-since-epoch long (the driver's
    // parquet is a ns timestamp read via nanosAsLong — a long column
    // reads identically through Graft.table / `ts DIV 1000`) ---------
    val t0 = java.time.Instant.parse("2024-01-01T00:00:00Z")
      .getEpochSecond * 1000000000L
    val spanNs = 30L * 86400 * 1000000000L
    val types = array(Seq("view", "click", "purchase", "signup", "error")
      .map(lit): _*)
    val events = spark.range(1000000).select(col("id").as("event_id"),
        (lit(t0) + hmod(6, spanNs, col("id"))).as("ts"),
        hmod(7, 15000, col("id")).as("user_id"),
        element_at(types, (hmod(8, 5, col("id")) + 1).cast("int"))
          .as("event_type"),
        (hmod(9, 56021, col("id")) / 100.0).as("value"),
        concat(lit("{\"k\": "), hmod(10, 100, col("id")), lit("}"))
          .as("props"))
    events.repartition(16).write.mode("overwrite")
      .parquet(s"$outDir/events.parquet")

    // ---- embeddings: 20k 64-dim float vectors in 10 label clusters
    // (center + small noise, like the driver's IVF-recoverable layout)
    val emb = spark.range(20000).select(col("id").as("vec_id"),
        hmod(11, 10, col("id")).cast("int").as("label"))
      .select(col("vec_id"),
        transform(sequence(lit(0), lit(63)), d =>
          ((hmod(12, 2000, col("label"), d) / 1000.0 - 1.0) +
            (hmod(13, 2000, col("vec_id"), d) / 4000.0 - 0.25))
            .cast("float")).as("embedding"),
        col("label"))
    emb.repartition(4).write.mode("overwrite")
      .parquet(s"$outDir/embeddings.parquet")

    Files.createFile(marker)
  }
}
