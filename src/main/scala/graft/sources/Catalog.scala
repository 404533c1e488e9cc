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
  *
  * Federation (S8, README.md:264-266): a second engine joins the plan
  * as just another binding — `format = "jdbc"` with
  * `options = Map("url" -> "jdbc:clickhouse://...", "dbtable" -> t,
  * "driver" -> ...)` resolves through `spark.read.format("jdbc")`
  * (path is unused; Spark pushes filters/projection to the remote
  * engine where the dialect allows). In production the url points at
  * ClickHouse; in this harness q35 exercises the identical code path
  * against an embedded Derby database (the JDBC engine available
  * offline), and q15 additionally covers multi-binding file joins.
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
    val withSchema = b.schema.fold(reader)(reader.schema)
    // connection-style sources (jdbc) take their address from options,
    // not a path
    if (b.format == "jdbc") withSchema.load() else withSchema.load(b.path)
  }

  /** Register bindings as temp views addressable from spark.sql. The
    * binding definition is also retained by name so DDL-shaped
    * statements (the `ALTER TABLE ... DELETE/UPDATE` mutations) can
    * find the storage path behind the view.
    */
  def register(spark: SparkSession, bindings: Binding*): Unit =
    bindings.foreach { b =>
      resolve(spark, b).createOrReplaceTempView(b.name)
      bound.put(b.name, b)
    }

  // JVM-wide like the dictionary registry; last registration wins
  private val bound =
    new java.util.concurrent.ConcurrentHashMap[String, Binding]()

  /** The binding behind a registered name, if any. */
  def binding(name: String): Option[Binding] = Option(bound.get(name))
}
