package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.UnresolvedRelation
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule

/** CH `system.tables` introspection — the ops-runbook staple
  * (`SELECT name, engine FROM system.tables WHERE ...`). The
  * two-part name resolves to a driver-built row set listing Catalog
  * bindings (engine = the binding's format), attached materialized
  * views, and the session's other temp views. Built fresh at each
  * resolution: the registries are the source of truth, nothing is
  * cached, so a query issued after a CREATE/DROP sees the new state
  * — exactly CH's behavior. Driver-sized by construction (a catalog
  * listing, not data).
  */
case class ChSystemRule(spark: SparkSession) extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.resolveOperatorsUp {
      case u: UnresolvedRelation
          if u.multipartIdentifier
            .map(_.toLowerCase(java.util.Locale.ROOT)) ==
            Seq("system", "tables") =>
        tablesRelation
    }

  private def tablesRelation: LogicalPlan = {
    val bindings = graft.sources.Catalog.bindings.map(b =>
      ("default", b.name, b.format, b.path))
    val mvs = ChMatView.names.map(n =>
      ("default", n, "MaterializedView", ""))
    val owned = bindings.map(_._2).toSet ++ mvs.map(_._2).toSet
    // a binding registers a backing temp view under its own name —
    // list it once, as the binding
    val views = spark.catalog.listTables().collect().toSeq
      .filter(t => t.tableType == "TEMPORARY" && !owned.contains(t.name))
      .map(t => ("default", t.name, "View", ""))
    val rows = (bindings ++ mvs ++ views).sortBy(_._2)
    import spark.implicits._
    rows.toDF("database", "name", "engine", "data_path")
      .queryExecution.analyzed
  }
}
