package graft

import org.scalacheck.{Gen, Prop, Properties, Test}
import org.scalacheck.Prop.propBoolean

/** ScalaCheck properties for the round-7 pipeline operators:
  *
  *  - [[graft.operators.Select.byTokenBudget]]'s three-phase
  *    decomposition (histogram → driver cutoff → chunked boundary
  *    fill) must equal the NAIVE spec — one global window ordered by
  *    (score desc, id asc) with a running-total filter — for ANY
  *    corpus and budget, including tie pileups, zero budgets, budgets
  *    past the total, and single-token boundaries.
  *  - [[graft.operators.Lm]] scoring must equal the explode + join
  *    replay of the same smoothing formula for ANY corpus/probe split.
  */
object PipelineProps extends Properties("pipeline") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(12)

  // small score range forces heavy ties → the boundary-fill path runs
  // in almost every sample; token counts include 0 (a zero-token doc
  // must enter whenever its running total fits, even at remaining=0)
  private val docGen: Gen[(Long, Long)] = for {
    score <- Gen.choose(-3L, 3L)
    toks <- Gen.choose(0L, 9L)
  } yield (score, toks)

  private val corpusGen: Gen[List[(Long, Long)]] =
    Gen.choose(0, 14).flatMap(n => Gen.listOfN(n, docGen))

  property("byTokenBudget equals the naive global-window spec") =
    Prop.forAll(corpusGen, Gen.choose(0L, 80L)) { (docs, budget) =>
      val spark = SparkSpec.spark
      import spark.implicits._
      import org.apache.spark.sql.expressions.Window
      import org.apache.spark.sql.functions._
      val df = docs.zipWithIndex
        .map { case ((s, t), i) => (i.toLong, s, t) }
        .toDF("id", "s", "t")
      val got = graft.operators.Select
        .byTokenBudget(df, "s", "t", "id", budget, boundaryChunks = 3)
        .select($"id").collect().map(_.getLong(0)).toSet
      val w = Window.orderBy($"s".desc, $"id".asc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val want = df.withColumn("cum", sum($"t").over(w))
        .filter($"cum" <= budget)
        .select($"id").collect().map(_.getLong(0)).toSet
      (got == want) :| s"got=$got want=$want budget=$budget docs=$docs"
    }

  property("epochPlan: targets track the budget, rates saturate at 1") =
    Prop.forAll(Gen.nonEmptyListOf(Gen.choose(1L, 500L)),
      Gen.choose(0L, 5000L)) { (masses, budget) =>
      val spark = SparkSpec.spark
      import spark.implicits._
      val df = masses.zipWithIndex
        .map { case (m, i) => (s"s$i", m) }.toDF("src", "n_tok")
      val rows = graft.operators.Mix
        .epochPlan(df, "src", "n_tok", alpha = 0.7, budget)
        .collect()
      val targetSum = rows.map(_.getAs[Long]("target_tokens")).sum
      val ratesOk = rows.forall { r =>
        val rate = r.getAs[Double]("sample_rate")
        val epochs = r.getAs[Double]("epochs")
        rate >= 0.0 && rate <= 1.0 &&
          math.abs(math.min(epochs, 1.0) - rate) < 1e-9
      }
      // per-stratum rounding of (weight * budget) drifts the total by
      // at most half a token per stratum (plus weight rounding at 1e-6)
      val tol = masses.size / 2.0 + 1 + budget * 1e-5
      val targetsOk: Boolean = math.abs(targetSum - budget) <= tol
      (targetsOk :|
        s"targets $targetSum vs budget $budget (tol $tol)") &&
        (ratesOk :| "sample_rate out of [0,1] or != min(epochs, 1)")
    }

  private val wordGen: Gen[String] = Gen.oneOf("a", "b", "c", "d", "e")
  private val textGen: Gen[String] =
    Gen.choose(1, 6).flatMap(n => Gen.listOfN(n, wordGen)).map(_.mkString(" "))

  property("Lm scoring equals the explode+join replay") =
    Prop.forAll(Gen.listOfN(5, textGen), Gen.choose(1, 4)) { (texts, topV) =>
      val spark = SparkSpec.spark
      import spark.implicits._
      import org.apache.spark.sql.functions._
      val corpus = texts.toDF("text")
      val m = graft.operators.Lm
        .trainUnigram(corpus, "text", "lm_props", topV)
      val got = corpus
        .select(graft.operators.Lm.avgLogProb(m, $"text").as("lp"))
        .collect().map(_.getDouble(0)).toSeq
      // replay: explode tokens, join the re-derived vocabulary, floor
      // on miss, average per doc — the formula in independent form
      val toks = corpus.withColumn("i", monotonically_increasing_id())
        .select($"i", explode(graft.functions.text.tokenize($"text")).as("t"))
      val vocab = toks.groupBy($"t").agg(count(lit(1)).as("c"))
        .orderBy($"c".desc, $"t".asc).limit(topV)
      val n = toks.count()
      val denom = (n + topV + 1).toDouble
      val want = toks.join(vocab, Seq("t"), "left")
        .withColumn("lp", coalesce(
          log(($"c" + 1).cast("double") / denom),
          lit(math.log(1.0 / denom))))
        .groupBy($"i").agg(avg($"lp").as("lp"))
        .orderBy($"i").collect().map(_.getDouble(1)).toSeq
      val ok = got.size == want.size &&
        got.zip(want).forall { case (g, e) => math.abs(g - e) < 1e-9 }
      ok :| s"got=$got want=$want topV=$topV"
    }
}
