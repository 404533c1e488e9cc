package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** A named external-table binding: (name, path, format, schema, options).
  *
  * Mirrors the reference's Yandex Query S3 *bindings* and *connections*
  * (README.md:192-216, 234-254): a pre-declared (path, format, schema)
  * triple that queries then address by name. Registered bindings become
  * Spark temp views, so `spark.sql("SELECT ... FROM `binding`")` works
  * exactly like YQ's `SELECT ... FROM `metrica-hits-s3``.
  */
final case class Binding(
    name: String,
    path: String,
    format: String = "parquet",
    schema: Option[StructType] = None,
    options: Map[String, String] = Map.empty)

object Catalog {

  /** Resolve a binding to a DataFrame (schema-on-read when a schema is
    * declared — nullability included, matching YQ's `NOT NULL` markers).
    */
  def resolve(spark: SparkSession, b: Binding): DataFrame = {
    val reader = spark.read.format(b.format).options(b.options)
    b.schema.fold(reader)(reader.schema).load(b.path)
  }

  /** Register bindings as temp views addressable from spark.sql. */
  def register(spark: SparkSession, bindings: Binding*): Unit =
    bindings.foreach(b => resolve(spark, b).createOrReplaceTempView(b.name))
}
