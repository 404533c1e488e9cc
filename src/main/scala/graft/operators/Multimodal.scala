package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video payloads ride through
  * the engine as opaque `binary` columns with a typed metadata struct;
  * decode / feature-extraction runs as a BATCHED partition-local
  * transform over the typed Dataset API (the JVM analogue of
  * `mapInPandas`: executors stream fixed-size batches through the
  * extractor, so peak memory is one batch of payloads per task — never
  * a whole partition of blobs).
  *
  * The actual codec call is STUBBED (`decodeStub`) — no image/audio
  * library ships in this environment — with a deterministic
  * byte-derived fake, so the Spark-side contract (schema, batch shape,
  * partitioning, checksum math) is real and oracle-testable while the
  * codec remains a drop-in replacement point.
  */
object Multimodal {

  /** Typed media row: the payload is opaque bytes; `meta` carries what
    * a pipeline knows without decoding.
    */
  final case class MediaRow(
      media_id: Long,
      kind: String, // image | audio | video
      payload: Array[Byte],
      format: String,
      width: Int,
      height: Int,
      sample_rate: Int,
      duration_ms: Long)

  /** Extracted features per media item. */
  final case class MediaFeatures(
      media_id: Long,
      n_bytes: Long,
      checksum: Long,
      feat: Array[Float])

  /** Number of payloads decoded together per task — the `mapInPandas`
    * batch-size analogue; bounds executor memory at batchSize × payload.
    */
  val decodeBatchSize = 64

  /** ??? STUB ??? — stands in for the real codec (JPEG decode, PCM
    * resample, frame sample). Deterministic: byte count, byte-sum
    * checksum mod 997, and a 16-bin byte histogram normalized to [0,1]
    * as the "embedding".
    */
  def decodeStub(payload: Array[Byte]): (Long, Long, Array[Float]) = {
    val hist = new Array[Float](16)
    var sum = 0L
    var i = 0
    while (i < payload.length) {
      val b = payload(i) & 0xff
      sum += b
      hist(b / 16) += 1f
      i += 1
    }
    val n = math.max(payload.length, 1)
    (payload.length.toLong, sum % 997, hist.map(_ / n))
  }

  /** Batched partition-local feature extraction. One pass, no shuffle;
    * the iterator is consumed lazily in `decodeBatchSize` groups.
    */
  def extractFeatures(ds: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { rows =>
      rows.grouped(decodeBatchSize).flatMap { batch =>
        batch.map { m =>
          val (nBytes, checksum, feat) = decodeStub(m.payload)
          MediaFeatures(m.media_id, nBytes, checksum, feat)
        }
      }
    }
  }

  /** Wrap a text corpus as a media table (deterministic payloads:
    * UTF-8 bytes of the text) — the sandbox's media fixture.
    */
  def mediaFromDocuments(spark: SparkSession, docs: DataFrame): Dataset[MediaRow] = {
    import spark.implicits._
    docs.select(
        col("doc_id").as("media_id"),
        when(pmod(col("doc_id"), lit(3)) === 0, lit("image"))
          .when(pmod(col("doc_id"), lit(3)) === 1, lit("audio"))
          .otherwise(lit("video")).as("kind"),
        encode(col("text"), "UTF-8").as("payload"),
        lit("raw").as("format"),
        lit(640).cast("int").as("width"),
        lit(480).cast("int").as("height"),
        lit(16000).cast("int").as("sample_rate"),
        (col("n_chars") * 10).cast("long").as("duration_ms"))
      .as[MediaRow]
  }

  /** A resized media item: real output dimensions, stub-resampled
    * payload.
    */
  final case class ResizedMedia(
      media_id: Long,
      kind: String,
      width: Int,
      height: Int,
      payload: Array[Byte])

  /** Aspect-preserving fit of (w, h) into (maxW, maxH); never
    * upscales; degenerate inputs map to (0, 0). Pure metadata math —
    * this part is REAL (it is what decides bytes decoded per item at
    * 100 TB), only the pixel resample is stubbed.
    */
  def fitDims(w: Int, h: Int, maxW: Int, maxH: Int): (Int, Int) =
    if (w <= 0 || h <= 0) (0, 0)
    else {
      val scale = math.min(1.0,
        math.min(maxW.toDouble / w, maxH.toDouble / h))
      (math.max(1, math.round(w * scale).toInt),
        math.max(1, math.round(h * scale).toInt))
    }

  /** ??? STUB ??? — stands in for the real resampler: deterministic
    * byte decimation proportional to the area reduction, so payload
    * size scales the way a real resize would and the batch contract is
    * testable.
    */
  def resizeStub(payload: Array[Byte], inW: Int, inH: Int,
      outW: Int, outH: Int): Array[Byte] = {
    val inArea = math.max(1L, inW.toLong * inH)
    val outArea = math.max(1L, outW.toLong * outH)
    val stride = math.max(1L, inArea / outArea).toInt
    payload.indices.collect { case i if i % stride == 0 => payload(i) }.toArray
  }

  /** Batched partition-local resize (same shape discipline as
    * [[extractFeatures]]): one pass, no shuffle, peak memory one batch.
    */
  def resize(ds: Dataset[MediaRow], maxW: Int, maxH: Int): Dataset[ResizedMedia] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { rows =>
      rows.grouped(decodeBatchSize).flatMap { batch =>
        batch.map { m =>
          val (w, h) = fitDims(m.width, m.height, maxW, maxH)
          ResizedMedia(m.media_id, m.kind, w, h,
            resizeStub(m.payload, m.width, m.height, w, h))
        }
      }
    }
  }

  /** Frame-sampling plan for a video payload: evenly spaced frame
    * timestamps (ms), at most `maxFrames`, from typed metadata only —
    * the decode of each frame is again [[decodeStub]] territory.
    */
  def frameSampleMs(durationMs: org.apache.spark.sql.Column,
      everyMs: Int, maxFrames: Int): org.apache.spark.sql.Column =
    when(durationMs > 0,
      slice(sequence(lit(0L), durationMs - 1, lit(everyMs.toLong)), lit(1),
        lit(maxFrames)))
      .otherwise(array().cast("array<bigint>"))
}
