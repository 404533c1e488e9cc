package graft

import org.scalacheck.{Gen, Prop, Properties, Test}
import org.scalacheck.Prop.forAll

/** Round-11 second-wave properties — algebraic invariants of the new
  * kernels that unit examples cannot cover:
  *
  *  - Tukey outlier scores are translation-EQUIVARIANT (shifting the
  *    series shifts the fences with it, scores unchanged) and
  *    positively scale-equivariant within float tolerance.
  *  - FFT period detection is invariant to mean shift and positive
  *    amplitude scaling (the periodogram scales uniformly, the argmax
  *    cannot move).
  *  - BPE decode∘encode is the whitespace-normalizing identity on
  *    arbitrary corpora, for an arbitrary (generated) merge prefix.
  *  - nonNegativeDerivative telescopes: on a strictly increasing
  *    unit-spaced series the scores sum to last − first exactly.
  */
object Round11bProps extends Properties("round11b") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(8)

  private val spark = SparkSpec.spark

  private def tukey(xs: Seq[Double]): Seq[Double] = {
    import org.apache.spark.sql.functions._
    spark.range(1)
      .select(graft.functions.ch.seriesOutliersDetectTukey(
        typedLit(xs)).as("v"))
      .collect().head.getSeq[Double](0).toVector
  }

  private def fft(xs: Seq[Double]): Double = {
    import org.apache.spark.sql.functions._
    spark.range(1)
      .select(graft.functions.ch.seriesPeriodDetectFFT(
        typedLit(xs)).as("v"))
      .collect().head.getDouble(0)
  }

  private val seriesGen: Gen[List[Double]] = for {
    n <- Gen.choose(6, 40)
    xs <- Gen.listOfN(n, Gen.choose(-50, 50).map(_.toDouble))
  } yield xs

  property("tukey scores are translation-equivariant") =
    forAll(seriesGen, Gen.choose(-1000, 1000)) { (xs, c) =>
      val a = tukey(xs)
      val b = tukey(xs.map(_ + c.toDouble))
      a.zip(b).forall { case (x, y) => math.abs(x - y) < 1e-7 }
    }

  property("tukey scores scale with a positive scale factor") =
    forAll(seriesGen, Gen.choose(1, 8)) { (xs, k) =>
      val a = tukey(xs)
      val b = tukey(xs.map(_ * k))
      a.zip(b).forall { case (x, y) => math.abs(x * k - y) < 1e-6 }
    }

  property("fft period invariant to mean shift and amplitude scale") =
    forAll(Gen.choose(3, 8), Gen.choose(1, 50), Gen.choose(-100, 100)) {
      (p, amp, shift) =>
        val xs = (0 until p * 10).map(i => (i % p).toDouble)
        val base = fft(xs)
        base == p.toDouble &&
          fft(xs.map(_ * amp + shift)) == base
    }

  private val wordGen: Gen[String] =
    Gen.nonEmptyListOf(Gen.alphaLowerChar).map(_.mkString).suchThat(
      w => !w.contains("</w>"))
  private val textGen: Gen[String] = for {
    n <- Gen.choose(1, 12)
    ws <- Gen.listOfN(n, wordGen)
    seps <- Gen.listOfN(n, Gen.oneOf(" ", "  ", "\t", " \n "))
  } yield ws.zip(seps).map { case (w, s) => w + s }.mkString

  property("BPE decode . encode == whitespace-normalized identity " +
      "for any merge prefix") =
    forAll(Gen.listOfN(6, textGen), Gen.choose(0, 10)) { (texts, k) =>
      import org.apache.spark.sql.functions._
      import spark.implicits._
      import graft.operators.Bpe
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val words = Bpe.wordTable(docs, "text")
      val (_, trained) = Bpe.train(words, merges = k)
      val out = Bpe.encodeCorpus(docs, "doc_id", "text", trained)
        .withColumn("decoded", Bpe.decodeTokens(col("bpe_tokens")))
        .join(docs, "doc_id")
        .withColumn("norm", array_join(filter(
          graft.functions.text.tokenize(col("text")),
          w => length(w) > 0), " "))
        .select(col("decoded") === col("norm"))
        .collect()
      out.forall(_.getBoolean(0))
    }

  property("evalRanking: metrics bounded in [0,1], perfect runs " +
      "score 1.0 everywhere, and recall@k is monotone in k") =
    forAll(Gen.choose(1, 6), Gen.choose(1, 10), Gen.choose(0L, 100L)) {
      (nGold, nNoise, seed) =>
        import org.apache.spark.sql.functions._
        import spark.implicits._
        import graft.operators.Retrieval
        // a run that ranks all gold docs first, then noise
        val goldIds = (0 until nGold).map(i => seed * 100 + i)
        val noise = (0 until nNoise).map(i => 10000L + i)
        val runRows = (goldIds ++ noise).zipWithIndex
          .map { case (d, i) => (1L, d, (i + 1).toLong) }
        val runs = runRows.toDF("query_id", "doc_id", "rank")
        val gold = goldIds.map(d => (1L, d)).toDF("query_id", "doc_id")
        val perfect = Retrieval.evalRanking(runs, gold, k = 10)
          .collect().head
        val ms = Seq(3, 4, 5, 6).map(perfect.getDouble)
        // perfect when every gold fits in k
        (nGold > 10 || ms.forall(m => math.abs(m - 1.0) < 1e-12)) &&
          ms.forall(m => m >= 0.0 && m <= 1.0 + 1e-12) && {
            // recall monotone in k
            val rs = Seq(1, 3, 10).map(k =>
              Retrieval.evalRanking(runs, gold, k)
                .collect().head.getDouble(3))
            rs.sliding(2).forall(p => p.head <= p(1) + 1e-12)
          }
    }

  property("nonNegativeDerivative telescopes on an increasing " +
      "unit-spaced series") =
    forAll(Gen.choose(3, 30), Gen.choose(1, 9)) { (n, step) =>
      import org.apache.spark.sql.functions._
      import spark.implicits._
      // strictly increasing: every delta is kept, sum = last - first
      val df = (0 until n).map(i => (i.toDouble, (i * step).toDouble))
        .toDF("t", "v")
      df.createOrReplaceTempView("r11b_nnd")
      val s = spark.sql("""
        SELECT sum(d) AS s FROM (
          SELECT nonNegativeDerivative(v, t) OVER (ORDER BY t) AS d
          FROM r11b_nnd)""").collect().head.getDouble(0)
      s == ((n - 1) * step).toDouble
    }
}
