package graft.plans

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.expressions.{ArrayExists, ArrayFilter, ArrayTransform, Expression, Literal}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DecimalType, DoubleType, FloatType}

import graft.functions.ch

/** ClickHouse-named SQL functions (README.md:103-109; ddl/hits.sql:114),
  * so a reference user's SQL runs verbatim through `spark.sql`. Every
  * builder delegates to the corresponding `graft.functions.ch`
  * combinator via the Column↔Expression bridge — the SQL surface and
  * the Scala API cannot drift apart because they are the same
  * expressions. Registered by [[GraftExtensions]] (build-time sessions)
  * and [[NativeHashes.register]] (existing sessions).
  */
object ChDialect {

  private def col(e: Expression): Column = GraftSqlBridge.column(e)
  private def ex(c: Column): Expression = GraftSqlBridge.expression(c)

  /** CH `arr[i]` as a function (CH spells it `arrayElement`): 1-based,
    * returning the element type's default (empty string / 0), not null,
    * on i=0 or out of range. The default is derived from the resolved
    * array element type, exactly as ClickHouse derives it.
    */
  private def arrayElement(args: Seq[Expression]): Expression = {
    val elemType = args.head.dataType match {
      case ArrayType(t, _) => t
      case other => throw new IllegalArgumentException(
        s"arrayElement expects an array argument, got ${other.catalogString}")
    }
    ex(ch.chElementAt(col(args.head), col(args(1)),
      col(Literal.default(elemType))))
  }

  /** CH `sumArray(arr)`: aggregate sum of every element of every row's
    * array. Accumulator type follows the element type (double for
    * fractional, long otherwise), matching CH's widening. Builders run
    * after the analyzer has resolved the argument (verified: lambda-
    * derived arrays arrive resolved), so the type is inspectable; a
    * non-array argument fails loudly rather than guessing an
    * accumulator and silently truncating.
    */
  private def sumArray(args: Seq[Expression]): Expression = {
    val elemType = args.head.dataType match {
      case ArrayType(t, _) => t
      case other => throw new IllegalArgumentException(
        s"sumArray expects an array argument, got ${other.catalogString}")
    }
    val perRow = elemType match {
      case DoubleType | FloatType | _: DecimalType =>
        ch.sumArrayDouble(col(args.head))
      case _ => ch.sumArrayLong(col(args.head))
    }
    ex(sum(perRow))
  }

  val functions: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "toMonday" -> (args => ex(ch.toMonday(col(args.head)))),
    "notEmpty" -> (args => ex(ch.notEmpty(col(args.head)))),
    "indexOf" -> (args => ex(ch.indexOf(col(args.head), col(args(1))))),
    "toInt64" -> (args => ex(ch.toInt64(col(args.head)))),
    "isFinite" -> (args => ex(ch.isFiniteCol(col(args.head)))),
    "uniqExact" -> (args => ex(ch.uniqExact(col(args.head)))),
    "uniq" -> (args => ex(ch.uniq(col(args.head)))),
    "arrayElement" -> arrayElement,
    "sumArray" -> sumArray,
    // CH argument order: lambda FIRST — arrayMap(x -> e, arr)
    "arrayMap" -> (args => ArrayTransform(args(1), args(0))),
    "arrayFilter" -> (args => ArrayFilter(args(1), args(0))),
    "arrayExists" -> (args => ArrayExists(args(1), args(0))),
    // CH `has(arr, v)` returns UInt8 (1/0). NULL is a MATCHABLE value
    // in CH arrays: has([1,NULL], NULL) = 1 — so a NULL needle looks
    // for a stored NULL element rather than short-circuiting to 0.
    // Only a NULL array gives 0.
    "has" -> (args => {
      val arr = col(args.head)
      val v = col(args(1))
      ex(coalesce(
        when(v.isNotNull, array_contains(arr, v))
          .otherwise(exists(arr, x => x.isNull)),
        lit(false)).cast("long"))
    }),
    // conditional aggregates — the countIf/sumIf family returns 0 (not
    // NULL) over an empty/no-match set, as CH does; avgIf of an empty
    // set is CH's nan
    "countIf" -> (args =>
      ex(coalesce(sum(when(col(args.head), 1L).otherwise(0L)), lit(0L)))),
    "sumIf" -> (args =>
      ex(coalesce(sum(when(col(args(1)), col(args.head))), lit(0)))),
    "avgIf" -> (args =>
      ex(coalesce(avg(when(col(args(1)), col(args.head))),
        lit(Double.NaN)))),
    // date helpers
    "toStartOfMonth" -> (args =>
      ex(date_trunc("month", col(args.head)).cast("date"))),
    "toYYYYMM" -> (args =>
      ex(date_format(col(args.head), "yyyyMM").cast("long"))),
    "toDate" -> (args => ex(col(args.head).cast("date"))),
  )
}
