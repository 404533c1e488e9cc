package graft

import org.apache.spark.sql.functions._

import graft.operators.{Codecs, Multimodal}

/** Multimodal plumbing invariants, round 13: REAL codecs (binary PPM
  * + RIFF PCM-16 WAV) — encode→decode round-trips bit-exactly, decode
  * rejects malformed payloads, feature extraction is partition-local,
  * and the generated fixture's metadata matches its decoded payload.
  */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  // ---- PPM codec ----

  test("ppm: encode -> decode round-trips pixels and dims bit-exactly") {
    val px = Array.tabulate(5 * 3 * 3)(i => ((i * 37 + 11) % 256).toByte)
    val img = Codecs.decodePpm(Codecs.encodePpm(5, 3, px))
    assert(img.width == 5 && img.height == 3)
    assert(img.pixels.toSeq == px.toSeq)
  }

  test("ppm: decoder handles header comments and rejects malformed input") {
    val px = Array.fill(2 * 2 * 3)(7.toByte)
    val withComment = ("P6\n# a netpbm comment\n2 2\n255\n".getBytes("US-ASCII") ++ px)
    val img = Codecs.decodePpm(withComment)
    assert(img.width == 2 && img.height == 2 && img.pixels.forall(_ == 7))
    // wrong magic, truncated raster, bad maxval — all must fail loudly
    intercept[IllegalArgumentException](
      Codecs.decodePpm("P5\n2 2\n255\n".getBytes ++ px))
    intercept[IllegalArgumentException](
      Codecs.decodePpm("P6\n2 2\n255\n".getBytes ++ px.take(5)))
    intercept[IllegalArgumentException](
      Codecs.decodePpm("P6\n2 2\n65535\n".getBytes ++ px))
  }

  test("ppm: nearest-neighbor resize picks exact source pixels") {
    // 4x2 image, pixel value = 10*x + y per channel
    val px = Array.tabulate(4 * 2 * 3) { i =>
      val p = i / 3; val x = p % 4; val y = p / 4
      (10 * x + y).toByte
    }
    val resized = Codecs.decodePpm(
      Codecs.resizePpm(Codecs.decodePpm(Codecs.encodePpm(4, 2, px)), 2, 1))
    assert(resized.width == 2 && resized.height == 1)
    // out (0,0) <- in (0,0) = 0; out (1,0) <- in (2,0) = 20
    assert(resized.pixels.toSeq == Seq[Byte](0, 0, 0, 20, 20, 20))
  }

  // ---- WAV codec ----

  test("wav: encode -> decode round-trips samples, rate, channels") {
    val s = Array.tabulate(480)(i => ((i * 131 - 7919) % 32768).toShort)
    val wav = Codecs.decodeWav(Codecs.encodeWav(1, 8000, s))
    assert(wav.channels == 1 && wav.sampleRate == 8000)
    assert(wav.samples.toSeq == s.toSeq)
    assert(wav.durationMs == 60L) // 480 samples @ 8 kHz
  }

  test("wav: decoder skips foreign chunks and rejects non-PCM-16") {
    val s = Array[Short](1, -2, 3, -4)
    val base = Codecs.encodeWav(2, 44100, s)
    // splice a LIST chunk between fmt and data: RIFF(12) + fmt(8+16)
    val listChunk = "LIST".getBytes ++ Array[Byte](4, 0, 0, 0) ++ "INFO".getBytes
    val spliced = base.take(36) ++ listChunk ++ base.drop(36)
    // fix the RIFF size field (bytes 4-7, LE)
    val riffSize = spliced.length - 8
    for (k <- 0 until 4) spliced(4 + k) = ((riffSize >> (8 * k)) & 0xff).toByte
    val wav = Codecs.decodeWav(spliced)
    assert(wav.channels == 2 && wav.sampleRate == 44100)
    assert(wav.samples.toSeq == s.toSeq)
    // 8-bit PCM must be rejected: patch bits-per-sample (offset 34)
    val bad = base.clone(); bad(34) = 8
    intercept[IllegalArgumentException](Codecs.decodeWav(bad))
  }

  // ---- Spark-side plumbing ----

  test("mediaFromDocuments: metadata matches the DECODED payload " +
      "(dims, rate, duration), and features come from real bytes") {
    val docs = (0L to 9L).map(i => (i, s"doc$i", 10)).toDF("doc_id", "text", "n_chars")
    val media = Multimodal.mediaFromDocuments(spark, docs).collect()
    assert(media.length == 10)
    media.foreach { m =>
      if (m.format == "ppm") {
        val img = Codecs.decodePpm(m.payload)
        assert((img.width, img.height) == ((m.width, m.height)), m.media_id)
        assert(m.kind == "image" && m.duration_ms == 0L)
      } else {
        val wav = Codecs.decodeWav(m.payload)
        assert(wav.sampleRate == m.sample_rate, m.media_id)
        assert(wav.durationMs == m.duration_ms, m.media_id)
        assert(m.kind == "audio")
      }
    }
    // features: doc 0 is an image (seed 0): pixel p = 7p % 256, w=8 h=6
    val f0 = Multimodal.decodeFeatures(media.find(_.media_id == 0L).get)
    assert(f0.n_units == 8 * 6 * 3)
    assert(f0.unit_sum == (0 until 8 * 6 * 3).map(p => (7 * p) % 256).sum)
    assert(math.abs(f0.feat.sum - 1.0f) < 1e-5)
  }

  test("extractFeatures is a partition-local map: no shuffle in the plan") {
    val docs = Seq((1L, "abc", 3), (2L, "defg", 4))
      .toDF("doc_id", "text", "n_chars")
    val feats = Multimodal.extractFeatures(
      Multimodal.mediaFromDocuments(spark, docs))
    val plan = feats.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle:\n$plan")
    val got = feats.collect()
    assert(got.map(_.media_id).sorted.toSeq == Seq(1L, 2L))
    got.foreach(f => assert(f.n_units > 0 && f.content_fp >= 0))
  }

  test("fitDims: aspect preserved, never upscales, degenerate-safe") {
    assert(Multimodal.fitDims(640, 480, 320, 320) == ((320, 240)))
    assert(Multimodal.fitDims(480, 640, 320, 320) == ((240, 320)))
    assert(Multimodal.fitDims(100, 100, 320, 320) == ((100, 100))) // no upscale
    assert(Multimodal.fitDims(0, 480, 320, 320) == ((0, 0)))
  }

  test("resize: real resample — output payload is a valid PPM at the " +
      "fitted dims whose pixels come from the source") {
    val docs = Seq((2L, "x", 1)).toDF("doc_id", "text", "n_chars")
    val media = Multimodal.mediaFromDocuments(spark, docs) // id 2: 10x8 image
    val resized = Multimodal.resize(media, 5, 5).collect().head
    assert((resized.width, resized.height) == ((5, 4))) // 10x8 fit 5x5
    val img = Codecs.decodePpm(resized.payload)
    assert(img.width == 5 && img.height == 4)
    val src = Codecs.decodePpm(media.collect().head.payload)
    // spot-check nearest-neighbor: out (0,0) == in (0,0)
    assert(img.pixels(0) == src.pixels(0))
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
