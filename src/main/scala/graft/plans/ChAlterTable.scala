package graft.plans

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference}
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.functions.expr
import org.apache.spark.sql.types.StringType

/** CH mutations as verbatim SQL: `ALTER TABLE t DELETE WHERE cond` /
  * `ALTER TABLE t UPDATE a = e1, b = e2 WHERE cond`. The table must be
  * a registered [[graft.sources.Catalog]] binding over a
  * week-partitioned Parquet warehouse — the binding supplies the
  * storage path behind the view name, and
  * [[graft.sources.Warehouse.deleteWhere]]/`updateWhere` do the
  * selective partition rewrite (only weeks containing matches are
  * touched). Returns one row per rewritten week partition, CH's
  * parts-touched visibility.
  */
case class ChAlterTableCommand(table: String,
    assignments: Seq[(String, String)], condSql: String)
    extends LeafRunnableCommand {

  override val output: Seq[Attribute] =
    Seq(AttributeReference("week_rewritten", StringType, nullable = false)())

  override def run(spark: SparkSession): Seq[Row] = {
    val b = graft.sources.Catalog.binding(table).getOrElse(
      throw new IllegalArgumentException(
        s"ALTER TABLE: '$table' is not a registered Catalog binding " +
          "(mutations need the storage path behind the view)"))
    require(b.format == "parquet",
      s"ALTER TABLE mutations support parquet warehouse bindings, " +
        s"'$table' is ${b.format}")
    val cond = expr(condSql)
    val weeks =
      if (assignments.isEmpty)
        graft.sources.Warehouse.deleteWhere(spark, b.path, cond)
      else
        graft.sources.Warehouse.updateWhere(spark, b.path, cond,
          assignments.map { case (c, e) => c -> expr(e) }.toMap)
    // the registered view captured its file listing at registration —
    // re-register so the next read sees the mutated files, and drop
    // any cache entries for the path
    spark.catalog.refreshByPath(b.path)
    graft.sources.Catalog.register(spark, b)
    weeks.map(Row(_))
  }
}
