package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** `JSONEachRow` (newline-delimited JSON) export/import — ClickHouse's
  * other workhorse object format beside CSVWithNames
  * (`ENGINE = S3(url, 'JSONEachRow', 'gzip')`). Unlike the csv path
  * there is no codec layer: arrays and nested structs serialize
  * natively, and read-back is by FIELD NAME, not position.
  */
object JsonEachRow {

  /** Every append is a new set of objects (one per task) — the
    * `s3_create_new_file_on_insert=1` behavior, as in
    * [[CsvGzip.exportCsv]]. Nulls are written explicitly (`"k":null`),
    * matching ClickHouse's JSONEachRow output of Nullable columns —
    * Spark's default omits them, which round-trips but diverges from
    * what a CH consumer sees on the wire.
    */
  def export(df: DataFrame, path: String, mode: String = "append",
      compression: String = "gzip"): Unit =
    df.write.mode(mode)
      .option("compression", compression)
      .option("ignoreNullFields", "false")
      .json(path)

  /** Schema-on-read over a (possibly day-sliced) object tree. The
    * declared schema is authoritative — no sampling inference pass,
    * which at 100 TB would be a full extra scan.
    */
  def read(spark: SparkSession, path: String,
      schema: StructType): DataFrame =
    spark.read.schema(schema)
      .option("recursiveFileLookup", "true")
      .json(path)
}
