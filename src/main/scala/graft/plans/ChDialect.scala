package graft.plans

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.expressions.{ArrayTransform, Expression, Literal}
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
    val elemType = args.head.dataType.asInstanceOf[ArrayType].elementType
    ex(ch.chElementAt(col(args.head), col(args(1)),
      col(Literal.default(elemType))))
  }

  /** CH `sumArray(arr)`: aggregate sum of every element of every row's
    * array. Accumulator type follows the element type (double for
    * fractional, long otherwise), matching CH's widening. When the
    * argument's type is not yet known at build time (a lambda-derived
    * array whose variables bind in a later analyzer rule), the integral
    * accumulator is used — CH's own default for Int arrays.
    */
  private def sumArray(args: Seq[Expression]): Expression = {
    val floating =
      try {
        args.head.dataType.asInstanceOf[ArrayType].elementType match {
          case DoubleType | FloatType | _: DecimalType => true
          case _ => false
        }
      } catch { case _: Throwable => false }
    val perRow =
      if (floating) ch.sumArrayDouble(col(args.head))
      else ch.sumArrayLong(col(args.head))
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
  )
}
