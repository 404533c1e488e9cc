package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

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
  def export(df: DataFrame, path: String,
      mode: String = "append"): Unit =
    df.write.mode(mode)
      .option("header", "true")
      .option("compression", "gzip")
      .csv(path)

  /** Day-sliced export (README.md:145-147): one INSERT per day so a
    * single oversized write can't time out — and, at 100 TB, so each
    * slice's tasks parallelize independently and failures retry a day,
    * not the whole export.
    */
  def exportDaySliced(df: DataFrame, dateCol: Column, days: Seq[String],
      path: String): Unit =
    days.foreach { d =>
      export(df.filter(dateCol === to_date(lit(d))), path)
    }

  /** Schema-on-read import over a glob path (README.md:234-254). */
  def read(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema)
      .option("header", "true")
      .csv(path)

  /** The reference's `_path` / `_file` virtual columns (README.md:150-154)
    * via Spark's `_metadata` struct (available on any file source).
    */
  def withFileMeta(df: DataFrame): DataFrame =
    df.withColumn("_path", col("_metadata.file_path"))
      .withColumn("_file", col("_metadata.file_name"))
}
