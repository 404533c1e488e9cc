package graft.plans

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Native vector-math kernel for the similarity operators.
  *
  * The Column formulation of a dot product —
  * `aggregate(zip_with(a, b, (x,y) => x*y), 0.0, (acc,v) => acc+v)` —
  * is a nested higher-order function, which Catalyst evaluates
  * interpreted: two closure invocations per vector component per row.
  * On the ANN paths that lambda tree IS the hot loop (corpus × probes ×
  * 64 components). [[DotProduct64Expr]] does the identical
  * index-ordered double accumulation in one tight JVM loop and stays
  * inside whole-stage codegen, so similarity scoring runs at scan
  * speed. Value-identical to the combinator (same IEEE operation
  * order); `SimilaritySpec` asserts the equivalence.
  */
object NativeMath {

  /** `array<double> x array<double> -> double` dot product. Inputs of
    * other numeric array types (the corpus's `array<float>`) arrive
    * through an implicit cast; float→double widening is exact.
    */
  def dot64(a: Column, b: Column): Column =
    GraftSqlBridge.column(
      DotProduct64Expr(GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))

  /** 0-based index of the max-cosine centroid for `v` among `cents`
    * (an `array<array<double>>`, normally a literal). First max wins on
    * ties; zero-norm sides score 0 — value-identical to the
    * `array_position(sims, array_max(sims))` combinator over a
    * `transform`-computed sims array, evaluated in one codegen'd loop
    * instead of one interpreted lambda per centroid per row.
    */
  def argmaxCosine(v: Column, cents: Column): Column =
    GraftSqlBridge.column(
      ArgMaxCosineExpr(GraftSqlBridge.expression(v), GraftSqlBridge.expression(cents)))
}

case class DotProduct64Expr(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {

  // inferred Seq[ArrayType] <: Seq[AbstractDataType] (which is
  // private[sql], so it cannot be named here)
  override def inputTypes = Seq(ArrayType(DoubleType), ArrayType(DoubleType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot64"

  // NULL on malformed inputs (length mismatch / null element), exactly
  // like the zip_with+aggregate combinator — so corrupt embeddings
  // surface as null sims instead of silently scoring over garbage
  override def nullable: Boolean = true

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val (x, y) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    if (MathKernels.dotDefined(x, y)) MathKernels.dot(x, y) else null
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
      if (graft.plans.MathKernels.dotDefined($a, $b)) {
        ${ev.value} = graft.plans.MathKernels.dot($a, $b);
      } else {
        ${ev.isNull} = true;
      }""")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression = copy(left = newLeft, right = newRight)
}

case class ArgMaxCosineExpr(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {

  // inferred Seq[ArrayType] <: Seq[AbstractDataType]
  override def inputTypes =
    Seq(ArrayType(DoubleType), ArrayType(ArrayType(DoubleType)))
  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_argmax_cosine"

  override protected def nullSafeEval(v: Any, cents: Any): Any =
    MathKernels.argmaxCosine(v.asInstanceOf[ArrayData],
      cents.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (v, c) => s"graft.plans.MathKernels.argmaxCosine($v, $c)")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression = copy(left = newLeft, right = newRight)
}

object MathKernels {

  /** The combinator's definedness domain: `zip_with` pads the shorter
    * side with nulls and a null product poisons the whole aggregate,
    * so the dot product is non-null exactly when lengths match and no
    * element is null. One branch-predictable validity pass; the caller
    * ([[DotProduct64Expr]]) turns false into SQL NULL.
    */
  def dotDefined(a: ArrayData, b: ArrayData): Boolean = {
    val n = a.numElements()
    if (b.numElements() != n) return false
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return false
      i += 1
    }
    true
  }

  /** Index-ordered double accumulation — the same operation order as
    * the `zip_with`+`aggregate` combinator, so results are bit-for-bit
    * equal on defined inputs (see [[dotDefined]]).
    */
  def dot(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    acc
  }

  /** First index of the max-cosine centroid (strict > keeps the first
    * max, matching `array_position`'s first-occurrence semantics);
    * cosine is `dot/(|v||c|)` with 0 for zero-norm sides — the same
    * doubles as the combinator formulation.
    */
  def argmaxCosine(v: ArrayData, cents: ArrayData): Int = {
    val vn = math.sqrt(dot(v, v))
    var best = Double.NegativeInfinity
    var bestI = 0
    var i = 0
    val n = cents.numElements()
    while (i < n) {
      val c = cents.getArray(i)
      val cn = math.sqrt(dot(c, c))
      val sim = if (vn > 0 && cn > 0) dot(v, c) / (vn * cn) else 0.0
      if (sim > best) { best = sim; bestI = i }
      i += 1
    }
    bestI
  }
}
