package graft.plans

import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.parser.{ParseException, ParserInterface}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.types.{DataType, StructType}

/** ClickHouse SQL-clause surface Spark's grammar lacks (README.md:83,86):
  *
  *  - `GROUP BY <keys> WITH TOTALS` → `GROUP BY GROUPING SETS
  *    ((<keys>), ())` — exactly CH's lattice for ANY key count: the
  *    groups plus ONE grand-total row with NULL keys (never ROLLUP's
  *    intermediate subtotals), HAVING applying to the totals row as CH
  *    defaults to.
  *  - `LIMIT offset, n` (the CH/MySQL form) → `LIMIT n OFFSET offset`.
  *
  * Both rewrites sit BEHIND the delegate parser's failure: Spark's
  * parser runs first and only a text it rejects is rewritten, so valid
  * Spark SQL — including string literals containing these phrases — is
  * never touched.
  */
class TotalsParser(delegate: ParserInterface) extends ParserInterface {

  // the keys group refuses to cross another GROUP BY, so each WITH
  // TOTALS binds to its NEAREST preceding GROUP BY — a plain lazy `.+?`
  // would pair a TOTALS-less GROUP BY earlier in the text (e.g. in a
  // sibling subquery) with a later clause's TOTALS
  private val totals =
    """(?is)(GROUP\s+BY\s+)((?:(?!GROUP\s+BY).)+?)\s+WITH\s+TOTALS""".r
  private val limitOffset =
    """(?is)LIMIT\s+(\d+)\s*,\s*(\d+)""".r
  // a single-quoted SQL literal, '' being the escaped quote
  private val stringLit = """'(?:[^']|'')*'""".r

  /** Replace every string literal with an opaque placeholder before the
    * clause regexes run, and restore afterwards — so neither rewrite
    * can fire inside a literal, and a comma inside a quoted string is
    * never mistaken for a multi-key TOTALS.
    */
  // \u0001 cannot appear in parseable SQL text, so the placeholder can
  // never collide with real query content
  private def placeholder(i: Int): String = "\u0001" + i + "\u0001"

  private def maskLiterals(sqlText: String): (String, Seq[String]) = {
    val found = stringLit.findAllIn(sqlText).toVector
    val masked = found.zipWithIndex.foldLeft(sqlText) {
      case (acc, (lit, i)) =>
        acc.replaceFirst(java.util.regex.Pattern.quote(lit),
          java.util.regex.Matcher.quoteReplacement(placeholder(i)))
    }
    (masked, found)
  }

  private def unmaskLiterals(sqlText: String, lits: Seq[String]): String =
    lits.zipWithIndex.foldLeft(sqlText) {
      case (acc, (lit, i)) =>
        acc.replace(placeholder(i), lit)
    }

  private def rewrite(sqlText: String): Option[String] = {
    val (masked, lits) = maskLiterals(sqlText)
    // ALL occurrences: the clause may appear in a subquery AND the
    // outer query (each match substitutes its own keys)
    val afterTotals = totals.replaceAllIn(masked, m =>
      java.util.regex.Matcher.quoteReplacement(
        s"${m.group(1)}GROUPING SETS ((${m.group(2).trim}), ())"))
    val rewritten = limitOffset.replaceAllIn(afterTotals,
      m => s"LIMIT ${m.group(2)} OFFSET ${m.group(1)}")
    Some(unmaskLiterals(rewritten, lits)).filter(_ != sqlText)
  }

  override def parsePlan(sqlText: String): LogicalPlan =
    try delegate.parsePlan(sqlText)
    catch {
      case e: ParseException =>
        rewrite(sqlText) match {
          case Some(rw) =>
            try delegate.parsePlan(rw) catch { case _: ParseException => throw e }
          case None => throw e
        }
    }

  override def parseQuery(sqlText: String): LogicalPlan =
    try delegate.parseQuery(sqlText)
    catch {
      case e: ParseException =>
        rewrite(sqlText) match {
          case Some(rw) =>
            try delegate.parseQuery(rw) catch { case _: ParseException => throw e }
          case None => throw e
        }
    }

  override def parseExpression(sqlText: String): Expression =
    delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseTableSchema(sqlText: String): StructType =
    delegate.parseTableSchema(sqlText)
  override def parseDataType(sqlText: String): DataType =
    delegate.parseDataType(sqlText)
  override def parseRoutineParam(sqlText: String): StructType =
    delegate.parseRoutineParam(sqlText)
}
