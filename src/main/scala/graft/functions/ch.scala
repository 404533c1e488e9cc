package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** ClickHouse-compatible scalar/array function combinators.
  *
  * Each mirrors a builtin the reference's queries rely on (SURVEY.md §2.7),
  * expressed as pure `Column` combinators so Catalyst keeps them inside
  * whole-stage codegen — no UDFs, no closures.
  *
  * References (semantics only): `/root/reference/README.md:103-109`
  * (arr[i], indexOf, arrayMap, if, isFinite, notEmpty, toInt64, sumArray),
  * `/root/reference/ddl/hits.sql:114` (toMonday partition expression).
  */
object ch {

  /** ClickHouse `arr[i]`: 1-based element access that returns a *default*
    * value (not null, not an error) when `i = 0` or out of range. This is
    * load-bearing for the traffic-sources query: visits without a model-2
    * traffic source must map to `''` (README.md:103).
    */
  def chElementAt(arr: Column, idx: Column, default: Column): Column = {
    val i = idx.cast("int")
    when(i >= 1 && i <= size(arr), element_at(arr, i)).otherwise(default)
  }

  /** ClickHouse `indexOf(arr, v)`: 1-based position, 0 when absent.
    * NULL is a matchable value in CH arrays — indexOf([1,NULL], NULL)
    * = 2 — so a NULL needle searches for the first stored NULL (as a
    * position scan over the isNull map, keeping the non-null fast path
    * on the `array_position` builtin); only a NULL array gives 0.
    */
  def indexOf(arr: Column, v: Column): Column =
    when(v.isNotNull, coalesce(array_position(arr, v), lit(0L)))
      .otherwise(coalesce(
        array_position(transform(arr, x => x.isNull), lit(true)), lit(0L)))

  /** ClickHouse `arrayMap(x -> e, arr)`. */
  def arrayMap(arr: Column, f: Column => Column): Column = transform(arr, f)

  /** ClickHouse `if(cond, a, b)`. */
  def chIf(cond: Column, a: Column, b: Column): Column =
    when(cond, a).otherwise(b)

  /** ClickHouse `sumArray(arr)` for integral arrays: sum of all elements
    * of the array in each row (pair with an outer `sum(...)` to aggregate
    * across rows, matching `sumArray` as an aggregate combinator).
    */
  def sumArrayLong(arr: Column): Column =
    aggregate(arr, lit(0L), (acc, x) => acc + x.cast("long"))

  /** `sumArray` for floating-point arrays (accumulates in double). */
  def sumArrayDouble(arr: Column): Column =
    aggregate(arr, lit(0.0), (acc, x) => acc + x.cast("double"))

  /** ClickHouse `notEmpty(s)` → 1/0 (UInt8-as-int). A NULL string maps
    * to 0, matching CH's non-nullable String default (`length(null)>0`
    * alone would propagate NULL and silently break oracle parity).
    */
  def notEmpty(s: Column): Column =
    (coalesce(length(s), lit(0)) > 0).cast("long")

  /** ClickHouse `isFinite(x)` for doubles; constant-true for integers. */
  def isFiniteCol(x: Column): Column = {
    val d = x.cast("double")
    !isnan(d) && d =!= lit(Double.PositiveInfinity) &&
      d =!= lit(Double.NegativeInfinity)
  }

  /** ClickHouse `toInt64(x)`. */
  def toInt64(x: Column): Column = x.cast("long")

  /** ClickHouse `toMonday(d)`: Date of the Monday of d's week — the
    * reference's partition expression. Spark weeks start Monday, so
    * `date_trunc` matches exactly.
    */
  def toMonday(d: Column): Column = date_trunc("week", d).cast("date")

  /** ClickHouse `uniqExact` — exact distinct count. */
  def uniqExact(c: Column): Column = count_distinct(c)

  /** ClickHouse `uniq` — HLL-approximate distinct count. */
  def uniq(c: Column): Column = approx_count_distinct(c)
}
