package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, BinaryType, StringType, StructType}

/** CSV-with-header + gzip export/import — the reference's S3 export path
  * (README.md:138-168): `ENGINE = S3(url, 'CSVWithNames', 'gzip')`,
  * day-sliced INSERTs (each insert = new object), then schema-on-read
  * with glob paths, plus `_path`/`_file` virtual provenance columns.
  */
object CsvGzip {

  /** Export as CSVWithNames + gzip. Spark writes one object per task,
    * so every append is a new set of files — the
    * `s3_create_new_file_on_insert=1` behavior is the default here.
    */
  def exportCsv(df: DataFrame, path: String,
      mode: String = "append"): Unit =
    df.write.mode(mode)
      .option("header", "true")
      .option("compression", "gzip")
      // RFC 4180 quote-doubling (Spark's default is backslash-escape):
      // the objects must be readable by ANY downstream engine
      .option("escape", "\"")
      .csv(path)

  /** Day-sliced export, single-pass (README.md:145-147): ONE scan of the
    * source, `partitionBy` on the slice date, so every day still lands in
    * its own directory of fresh objects but the source is read once. At
    * 100 TB a 30-day export must not be 30 full scans — this is the
    * default path. Use [[exportDaySlicedLooped]] only as the
    * timeout-mitigation mode the reference describes (README.md:171),
    * where each day must be an independently retryable job.
    */
  def exportDaySliced(df: DataFrame, dateCol: Column, days: Seq[String],
      path: String, mode: String = "append"): Unit =
    df.filter(dateCol.isin(days.map(d => java.sql.Date.valueOf(d)): _*))
      .withColumn("__day", dateCol)
      .write.mode(mode)
      .partitionBy("__day")
      .option("header", "true")
      .option("compression", "gzip")
      .option("escape", "\"")
      .csv(path)

  /** Day-sliced export, one job per day (one scan each) — the fallback
    * mode for oversized single exports (README.md:171): a failed or
    * timed-out day retries alone instead of restarting the whole export.
    */
  def exportDaySlicedLooped(df: DataFrame, dateCol: Column, days: Seq[String],
      path: String): Unit =
    days.foreach { d =>
      exportCsv(df.filter(dateCol === to_date(lit(d))), path)
    }

  /** Schema-on-read import over a glob path (README.md:234-254).
    * `recursiveFileLookup` descends into `partitionBy` day directories
    * without inferring partition columns, so the declared schema is the
    * whole schema.
    */
  def read(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema)
      .option("header", "true")
      .option("escape", "\"")
      .option("recursiveFileLookup", "true")
      .csv(path)

  /** The reference's `_path` / `_file` virtual columns (README.md:150-154)
    * via Spark's `_metadata` struct (available on any file source).
    */
  def withFileMeta(df: DataFrame): DataFrame =
    df.withColumn("_path", col("_metadata.file_path"))
      .withColumn("_file", col("_metadata.file_name"))

  // -------------------------------------------------------------------
  // Wide-row support: CSV cells are scalar, but the reference exports
  // its FULL hits row through CSVWithNames — including Array columns
  // (ClickHouse serializes them as quoted array literals) and the raw
  // IPv6 FixedString(16). The engine-neutral equivalents: arrays ride
  // as JSON text (losslessly parseable back by schema on ANY reader —
  // DuckDB included), binary as hex.

  /** Encode complex-typed columns to CSV-safe strings (arrays → JSON,
    * binary → hex). Scalar columns pass through untouched.
    */
  def encodeComplex(df: DataFrame): DataFrame =
    df.select(df.schema.fields.toSeq.map { f =>
      val c = col(s"`${f.name}`")
      (f.dataType match {
        case _: ArrayType => to_json(c)
        case BinaryType => hex(c)
        case _ => c
      }).as(f.name)
    }: _*)

  /** The schema [[encodeComplex]] output conforms to: array and binary
    * fields become strings — the schema to declare when reading the
    * exported CSV back.
    */
  def encodedSchema(schema: StructType): StructType =
    StructType(schema.fields.map { f =>
      f.dataType match {
        case _: ArrayType | BinaryType =>
          f.copy(dataType = StringType, nullable = true)
        case _ => f
      }
    })

  /** Decode an [[encodeComplex]]-encoded frame back to `schema`:
    * JSON cells parse to their array types, hex to binary. The exact
    * inverse — the wide-row roundtrip q51 hash-checks.
    */
  def decodeComplex(df: DataFrame, schema: StructType): DataFrame =
    df.select(schema.fields.toSeq.map { f =>
      val c = col(s"`${f.name}`")
      (f.dataType match {
        case a: ArrayType => from_json(c, a)
        // the Catalyst Unhex node directly: functions.unhex resolves
        // BY NAME in Spark 4 and would hit the CH dialect's `unhex`
        // (whose CH contract returns String, not binary) — found by
        // MetricaSpec's round-trip when that registration landed
        case BinaryType => org.apache.spark.sql.GraftSqlBridge.column(
          org.apache.spark.sql.catalyst.expressions.Unhex(
            org.apache.spark.sql.GraftSqlBridge.expression(c)))
        case _ => c
      }).as(f.name)
    }: _*)
}
