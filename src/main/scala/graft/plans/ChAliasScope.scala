package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule

/** ClickHouse's SELECT-alias scoping liberty: an alias defined in the
  * select list is referenceable from the SAME query's WHERE clause
  * (`/root/reference/README.md:80-81`: `WHERE \`ym:s:date\` >=
  * {{interval_from}}` where `ym:s:date` is `StartDate AS
  * \`ym:s:date\``). ANSI (and Spark) evaluate WHERE before the select
  * list, so the name is unresolvable there; CH substitutes the
  * alias's EXPRESSION into the predicate. Spark already accepts the
  * alias in GROUP BY / HAVING / ORDER BY — WHERE is the one missing
  * scope, so this rule closes exactly that gap.
  *
  * Mechanics: for a Filter directly under the Project/Aggregate that
  * defines the alias, every single-part attribute in the filter
  * condition that (a) does NOT resolve against the filter's child —
  * a source column always wins, so valid Spark SQL never changes
  * meaning — and (b) matches an alias name in the parent's list, is
  * replaced by that alias's child expression; normal resolution then
  * proceeds. An alias whose expression aggregates fails analysis
  * exactly as it would in CH (no aggregates in WHERE).
  */
case class ChAliasScopeRule(spark: SparkSession) extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.resolveOperatorsUp {
      case p @ Project(projList, f @ Filter(cond, child))
          if child.resolved && hasCandidate(cond, child) =>
        p.copy(child = f.copy(condition = expand(projList, cond, child)))
      case a @ Aggregate(_, aggExprs, f @ Filter(cond, child), _)
          if child.resolved && hasCandidate(cond, child) =>
        a.copy(child = f.copy(condition = expand(aggExprs, cond, child)))
    }

  private def resolver = spark.sessionState.conf.resolver

  private def hasCandidate(cond: Expression, child: LogicalPlan): Boolean =
    cond.exists {
      case u: UnresolvedAttribute =>
        u.nameParts.length == 1 &&
          child.resolve(u.nameParts, resolver).isEmpty
      case _ => false
    }

  private def expand(exprs: Seq[NamedExpression], cond: Expression,
      child: LogicalPlan): Expression = {
    val aliases = exprs.collect { case al: Alias => al }
    cond.transformUp {
      case u: UnresolvedAttribute if u.nameParts.length == 1 &&
          child.resolve(u.nameParts, resolver).isEmpty =>
        aliases.find(al => resolver(al.name, u.nameParts.head))
          .map(_.child).getOrElse(u)
    }
  }
}
