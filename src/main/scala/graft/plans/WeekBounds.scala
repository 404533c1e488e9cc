package graft.plans

import org.apache.spark.sql.catalyst.expressions.{And, AttributeReference, EqualTo, Expression, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual, Literal}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.types.DateType

/** Partition-prune week directories from DATE predicates — the
  * MergeTree behavior the reference's tables get from
  * `PARTITION BY toMonday(EventDate)` (ddl/hits.sql:114): a query
  * bounded on the date column reads only the matching week partitions,
  * without the user having to restate the bound on the partition
  * column.
  *
  * [[graft.sources.Warehouse.write]] stamps the source date column's
  * field metadata with `graft.weekOf = true`, recording the physical
  * invariant `week = toMonday(dateCol)` (metadata survives the parquet
  * schema roundtrip). This rule finds Filters directly above such a
  * relation and, for every top-level conjunct bounding the stamped
  * date column with a literal, adds the implied bound on `week`:
  *
  *   d >= L  →  week >= monday(L)     d <= L  →  week <= monday(L)
  *   d >  L  →  week >= monday(L)     d <  L  →  week <= monday(L)
  *   d == L  →  week == monday(L)
  *
  * (toMonday is monotone, so the implications are exact; the derived
  * conjunct is redundant logically but becomes a PARTITION filter at
  * planning — directory pruning instead of a full scan.) Runs in the
  * user-provided optimizer batch (after predicate pushdown and
  * constant folding, so date casts have folded to literals and the
  * Filter sits on the relation); re-application finds the derived
  * conjunct already present and is a no-op, keeping the fixpoint.
  */
object WeekBoundsRule extends Rule[LogicalPlan] {

  val flag = "graft.weekOf"

  private def mondayOf(epochDay: Int): Literal = {
    val m = java.time.LocalDate.ofEpochDay(epochDay.toLong)
      .`with`(java.time.temporal.TemporalAdjusters.previousOrSame(
        java.time.DayOfWeek.MONDAY))
    Literal(m.toEpochDay.toInt, DateType)
  }

  private def conjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => conjuncts(l) ++ conjuncts(r)
    case other => Seq(other)
  }

  private def isWeekSource(a: AttributeReference): Boolean =
    a.dataType == DateType && a.metadata.contains(flag)

  private def derived(c: Expression, wk: AttributeReference): Option[Expression] = c match {
    case GreaterThanOrEqual(a: AttributeReference, Literal(d: Int, DateType))
        if isWeekSource(a) => Some(GreaterThanOrEqual(wk, mondayOf(d)))
    case GreaterThan(a: AttributeReference, Literal(d: Int, DateType))
        if isWeekSource(a) => Some(GreaterThanOrEqual(wk, mondayOf(d)))
    case LessThanOrEqual(a: AttributeReference, Literal(d: Int, DateType))
        if isWeekSource(a) => Some(LessThanOrEqual(wk, mondayOf(d)))
    case LessThan(a: AttributeReference, Literal(d: Int, DateType))
        if isWeekSource(a) => Some(LessThanOrEqual(wk, mondayOf(d)))
    case EqualTo(a: AttributeReference, Literal(d: Int, DateType))
        if isWeekSource(a) => Some(EqualTo(wk, mondayOf(d)))
    // literal-first spellings
    case LessThanOrEqual(Literal(d: Int, DateType), a: AttributeReference)
        if isWeekSource(a) => Some(GreaterThanOrEqual(wk, mondayOf(d)))
    case LessThan(Literal(d: Int, DateType), a: AttributeReference)
        if isWeekSource(a) => Some(GreaterThanOrEqual(wk, mondayOf(d)))
    case GreaterThanOrEqual(Literal(d: Int, DateType), a: AttributeReference)
        if isWeekSource(a) => Some(LessThanOrEqual(wk, mondayOf(d)))
    case GreaterThan(Literal(d: Int, DateType), a: AttributeReference)
        if isWeekSource(a) => Some(LessThanOrEqual(wk, mondayOf(d)))
    case EqualTo(Literal(d: Int, DateType), a: AttributeReference)
        if isWeekSource(a) => Some(EqualTo(wk, mondayOf(d)))
    case _ => None
  }

  /** `week` must be an actual PARTITION column of the relation — the
    * stamped date attribute alone is not enough: metadata travels with
    * the column through arbitrary user transforms and rewrites, so a
    * table carrying the stamp but a re-derived `week` DATA column
    * would get a false bound. A partition-column `week` next to the
    * stamped date column is the Warehouse layout (only
    * `Warehouse.write` produces it), and it is also the only case
    * where the derived predicate prunes anything.
    */
  private def weekIsPartitionCol(rel: LogicalRelation): Boolean =
    rel.relation match {
      case fs: HadoopFsRelation =>
        fs.partitionSchema.fieldNames.contains(graft.sources.Warehouse.weekCol)
      case _ => false
    }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, rel: LogicalRelation) if weekIsPartitionCol(rel) =>
      rel.output.find(a =>
          a.name == graft.sources.Warehouse.weekCol &&
            a.dataType == DateType) match {
        case Some(wk: AttributeReference) =>
          val cs = conjuncts(cond)
          val add = cs.flatMap(c => derived(c, wk))
            .filterNot(d => cs.exists(_.semanticEquals(d)))
            .distinct
          if (add.isEmpty) f
          else Filter(add.foldLeft(cond)(And(_, _)), rel)
        case _ => f
      }
  }
}
