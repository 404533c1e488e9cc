package graft

import org.scalacheck.{Gen, Prop, Properties, Test}
import org.scalacheck.Prop.propBoolean

import org.apache.spark.sql.functions._

/** Round-13 properties: the round's native kernels are value-identical
  * to straightforward JVM references on random inputs:
  *
  *  - stepLookup ≡ a linear scan for the largest point ≤ x with the
  *    below-range floor clamp (random sorted tables, random probes);
  *  - packSignBits/hammingI64 ≡ the per-dimension sign-disagreement
  *    count (random float vectors, including the multi-word case);
  *  - hashedScore ≡ Σ weights[rollingHash(tok) mod buckets] folded by
  *    a scalar reference (random token lists and weight tables);
  *  - chunkByTokens: full coverage, chunk k == tokens[k·step,
  *    k·step+size), consecutive chunks share exactly `overlap`, and
  *    the chunk count matches the closed form (random n/size/overlap);
  *  - the bootstrap Poisson weight kernel (JVM) ≡ the column
  *    arithmetic for random ids spanning the full long range.
  */
object Round13Props extends Properties("round13") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(20)

  private val spark = SparkSpec.spark
  import spark.implicits._

  // ---- stepLookup ----

  private val calGen: Gen[(List[(Long, Double)], Long)] = for {
    n <- Gen.choose(1, 30)
    scores <- Gen.listOfN(n, Gen.choose(-500L, 500L)).map(_.distinct.sorted)
    vals <- Gen.listOfN(scores.length, Gen.choose(0.0, 1.0))
    x <- Gen.choose(-600L, 600L)
  } yield (scores.zip(vals), x)

  property("stepLookup == linear-scan reference") =
    Prop.forAll(calGen) { case (pts, x) =>
      val expected = pts.filter(_._1 <= x) match {
        case Nil => pts.head._2 // below range: floor clamp
        case hit => hit.last._2
      }
      val got = Seq(x).toDF("x")
        .select(graft.plans.NativeCalib.stepLookup(
          typedLit(pts.map(_._1)), typedLit(pts.map(_._2)),
          col("x")).as("v"))
        .collect().head.getDouble(0)
      got == expected
    }

  // ---- binary embedding kernels ----

  private val vecPairGen: Gen[(List[Float], List[Float])] = for {
    n <- Gen.oneOf(Gen.choose(1, 63), Gen.choose(64, 150))
    a <- Gen.listOfN(n, Gen.choose(-2.0f, 2.0f))
    b <- Gen.listOfN(n, Gen.choose(-2.0f, 2.0f))
  } yield (a, b)

  property("packSignBits+hammingI64 == per-dim sign-disagreement count") =
    Prop.forAll(vecPairGen) { case (a, b) =>
      val expected = a.zip(b).count { case (x, y) => (x > 0) != (y > 0) }
      val got = Seq((a, b)).toDF("a", "b")
        .select(graft.plans.NativeMath.hammingI64(
          graft.plans.NativeMath.packSignBits(col("a")),
          graft.plans.NativeMath.packSignBits(col("b"))).as("h"))
        .collect().head.getLong(0)
      got == expected.toLong
    }

  // ---- hashedScore ----

  private val scoreGen: Gen[(List[String], List[Long])] = for {
    nb <- Gen.oneOf(4, 16, 64)
    w <- Gen.listOfN(nb, Gen.choose(-1000000L, 1000000L))
    nt <- Gen.choose(0, 30)
    toks <- Gen.listOfN(nt, Gen.oneOf(
      Gen.alphaLowerStr.map(_.take(8)), Gen.const("the"),
      Gen.const("über"))) // non-ASCII exercises code-point hashing
  } yield (toks, w)

  property("hashedScore == scalar fold over rollingHash buckets") =
    Prop.forAll(scoreGen) { case (toks, w) =>
      val p = 1000000007L
      def rh(s: String): Long =
        s.codePoints().toArray.foldLeft(0L)((a, c) => (a * 31 + c) % p)
      val expected = toks.map(t => w((rh(t) % w.length).toInt)).sum
      val got = Seq(toks).toDF("t")
        .select(graft.plans.NativeHashes.hashedScore(col("t"),
          w.toIndexedSeq, p).as("s"))
        .collect().head.getLong(0)
      got == expected
    }

  // ---- chunkByTokens ----

  private val chunkGen: Gen[(Int, Int, Int)] = for {
    size <- Gen.choose(2, 20)
    overlap <- Gen.choose(0, size - 1)
    n <- Gen.choose(0, 100)
  } yield (n, size, overlap)

  property("chunkByTokens: slices, coverage, and count formula") =
    Prop.forAll(chunkGen) { case (n, size, overlap) =>
      val toks = (1 to n).map(i => s"w$i")
      val step = size - overlap
      val df = Seq((1L, toks.mkString(" "))).toDF("doc_id", "text")
      val got = graft.operators.Select
        .chunkByTokens(df, "doc_id", "text", size, overlap)
        .collect().map(r => (r.getLong(1), r.getString(3)))
        .sortBy(_._1)
      val expectedN =
        if (n == 0) 0
        else if (n <= size) 1
        else math.ceil((n - size).toDouble / step).toInt + 1
      val countOk = got.length == expectedN
      val slicesOk = got.forall { case (k, text) =>
        text.split(" ").filter(_.nonEmpty).toSeq ==
          toks.slice(k.toInt * step, k.toInt * step + size)
      }
      val coverageOk = n == 0 ||
        (expectedN - 1) * step + size >= n // last chunk reaches the end
      countOk && slicesOk && coverageOk
    }

  // ---- bootstrap weights across the full id range ----

  property("NativeBoot.weight == the column poissonWeight for any id") =
    Prop.forAll(Gen.oneOf(Gen.choose(0L, 100000L),
      Gen.choose(Long.MaxValue / 2, Long.MaxValue),
      Gen.choose(3400000000L, 4294967296L))) { id =>
      val cols = (1 to 4).map(b =>
        graft.operators.Corpus.poissonWeight(col("id"), lit(b))
          .as(s"w$b"))
      val row = Seq(id).toDF("id").select(cols: _*).collect().head
      (1 to 4).forall(b =>
        row.getInt(b - 1) == graft.plans.NativeBoot.weight(id, b))
    }
}
