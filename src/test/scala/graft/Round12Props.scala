package graft

import org.scalacheck.{Gen, Prop, Properties, Test}
import org.scalacheck.Prop.propBoolean

import org.apache.spark.sql.functions._

import graft.functions.ch

/** Round-12 properties: the native X180 series kernels are
  * BIT-IDENTICAL to the combinator references they replace (verdict
  * ask #6, the X173 dot-kernel pattern):
  *
  *  - seriesPeriodDetectFFT ≡ the interpreted mean-centered-DFT
  *    combinator, on random series of arbitrary length (including the
  *    n < 4 NULL and constant-series 0.0 edges);
  *  - seriesDecomposeSTL ≡ the interpreted trend/phase/residual
  *    combinator chain, all four arrays, on random (series, period)
  *    including out-of-contract periods (NULL).
  *
  * Bit-identical means exact Double equality (same IEEE operation
  * order), not approximate.
  */
object Round12Props extends Properties("round12") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(20)

  private val seriesGen: Gen[List[Double]] = for {
    n <- Gen.frequency(3 -> Gen.choose(0, 3), 10 -> Gen.choose(4, 40))
    xs <- Gen.listOfN(n, Gen.oneOf(
      Gen.choose(-1000.0, 1000.0),
      Gen.choose(-1.0, 1.0),
      Gen.const(7.5))) // constant runs exercise the 0.0 sentinel
  } yield xs

  property("seriesPeriodDetectFFT native == combinator (bit-exact)") =
    Prop.forAll(seriesGen) { xs =>
      val spark = SparkSpec.spark
      val r = spark.range(1).select(
        ch.seriesPeriodDetectFFT(typedLit(xs)).as("native"),
        ch.seriesPeriodDetectFFTSpec(typedLit(xs)).as("spec"))
        .collect().head
      val same =
        if (r.isNullAt(0) || r.isNullAt(1)) r.isNullAt(0) == r.isNullAt(1)
        else java.lang.Double.doubleToRawLongBits(r.getDouble(0)) ==
          java.lang.Double.doubleToRawLongBits(r.getDouble(1))
      same :| s"n=${xs.size} native=${if (r.isNullAt(0)) "null" else r.getDouble(0)} " +
        s"spec=${if (r.isNullAt(1)) "null" else r.getDouble(1)}"
    }

  /** Brute-force minimax isotonic fit: ŷᵢ = max_{s≤i} min_{t≥i} of
    * (Σ y[s..t]) / (Σ c[s..t]) — exact integer sums, one division,
    * the oracle's form.
    */
  private def minimaxFit(ys: Vector[Long], cs: Vector[Long]): Vector[Double] = {
    val n = ys.size
    (0 until n).map { i =>
      (0 to i).map { s =>
        (i until n).map { t =>
          ys.slice(s, t + 1).sum.toDouble / cs.slice(s, t + 1).sum.toDouble
        }.min
      }.max
    }.toVector
  }

  property("isotonic PAV kernel == minimax identity (bit-exact) and " +
      "is non-decreasing") =
    Prop.forAll(Gen.choose(1, 20).flatMap(n =>
      Gen.listOfN(n, Gen.zip(Gen.choose(0L, 50L), Gen.choose(1L, 50L))))) { pts =>
      val spark = SparkSpec.spark
      val ys = pts.map { case (y, c) => math.min(y, c) }.toVector
      val cs = pts.map(_._2).toVector
      val got = spark.range(1).select(
        graft.plans.NativeCalib.isotonicFit(typedLit(ys), typedLit(cs))
          .as("f")).collect().head.getSeq[Double](0).toVector
      val want = minimaxFit(ys, cs)
      val bitEq = got.size == want.size && got.zip(want).forall {
        case (a, b) => java.lang.Double.doubleToRawLongBits(a) ==
          java.lang.Double.doubleToRawLongBits(b)
      }
      val mono = got.zip(got.drop(1)).forall { case (a, b) => a <= b }
      (bitEq :| s"pav=$got minimax=$want") && (mono :| s"not monotone: $got")
    }

  property("seriesDecomposeSTL native == combinator (bit-exact, all " +
      "four arrays)") =
    Prop.forAll(seriesGen, Gen.choose(1, 8)) { (xs, p) =>
      val spark = SparkSpec.spark
      val r = spark.range(1).select(
        ch.seriesDecomposeSTL(typedLit(xs), lit(p)).as("native"),
        ch.seriesDecomposeSTLSpec(typedLit(xs), lit(p)).as("spec"))
        .collect().head
      if (r.isNullAt(0) || r.isNullAt(1))
        (r.isNullAt(0) == r.isNullAt(1)) :| s"null mismatch n=${xs.size} p=$p"
      else {
        val a = r.getSeq[scala.collection.Seq[Double]](0).map(_.toVector)
        val b = r.getSeq[scala.collection.Seq[Double]](1).map(_.toVector)
        val same = a.size == b.size && a.zip(b).forall { case (x, y) =>
          x.size == y.size && x.zip(y).forall { case (u, v) =>
            java.lang.Double.doubleToRawLongBits(u) ==
              java.lang.Double.doubleToRawLongBits(v)
          }
        }
        same :| s"n=${xs.size} p=$p native=$a spec=$b"
      }
    }
}
