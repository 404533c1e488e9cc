package graft

import org.apache.spark.sql.functions._

import graft.operators.Multimodal

/** Multimodal plumbing invariants: deterministic stub decode, batch
  * discipline, frame-sample plans, aspect-preserving resize.
  */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("decodeStub: byte count, mod-997 checksum, normalized histogram") {
    val (n, ck, feat) = Multimodal.decodeStub(Array[Byte](0, 15, 16, -1))
    assert(n == 4L)
    assert(ck == (0 + 15 + 16 + 255) % 997)
    assert(feat.length == 16)
    assert(math.abs(feat.sum - 1.0f) < 1e-6) // histogram normalized
    assert(feat(0) == 0.5f) // bytes 0 and 15 land in bin 0
  }

  test("extractFeatures is a partition-local map: no shuffle in the plan") {
    val docs = Seq((1L, "abc", 3), (2L, "defg", 4))
      .toDF("doc_id", "text", "n_chars")
    val feats = Multimodal.extractFeatures(
      Multimodal.mediaFromDocuments(spark, docs))
    val plan = feats.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle:\n$plan")
    val got = feats.collect().map(f => f.media_id -> f.n_bytes).toMap
    assert(got == Map(1L -> 3L, 2L -> 4L))
  }

  test("fitDims: aspect preserved, never upscales, degenerate-safe") {
    assert(Multimodal.fitDims(640, 480, 320, 320) == ((320, 240)))
    assert(Multimodal.fitDims(480, 640, 320, 320) == ((240, 320)))
    assert(Multimodal.fitDims(100, 100, 320, 320) == ((100, 100))) // no upscale
    assert(Multimodal.fitDims(0, 480, 320, 320) == ((0, 0)))
  }

  test("resize: batched, payload shrinks with area, dims from fitDims") {
    val docs = Seq((1L, "x" * 1000, 1000)).toDF("doc_id", "text", "n_chars")
    val resized = Multimodal.resize(
      Multimodal.mediaFromDocuments(spark, docs), 64, 64).collect().head
    assert((resized.width, resized.height) == ((64, 48))) // 640x480 -> fit 64
    // area shrank 100x -> stride 100 -> ~10 of 1000 bytes survive
    assert(resized.payload.length == 10)
  }

  test("frameSampleMs: even spacing, capped, empty for zero duration") {
    val got = Seq((10000L, 0L)).toDF("d", "z")
      .select(
        Multimodal.frameSampleMs(col("d"), 1000, 8).as("f"),
        Multimodal.frameSampleMs(col("z"), 1000, 8).as("e"))
      .as[(Seq[Long], Seq[Long])].head()
    assert(got._1 == Seq(0L, 1000L, 2000L, 3000L, 4000L, 5000L, 6000L, 7000L))
    assert(got._2.isEmpty)
  }
}
