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

  property("chunkOverlap equals the naive per-doc reference") =
    Prop.forAll(Gen.choose(0, 20), Gen.choose(1, 6), Gen.choose(1, 6)) {
      (nToks, window0, stride0) =>
      val (window, stride) =
        (math.max(window0, stride0), math.min(window0, stride0))
      val spark = SparkSpec.spark
      import spark.implicits._
      val toks = (0 until nToks).map(i => s"t$i")
      val got = graft.operators.Pack
        .chunkOverlap(Seq((1L, toks)).toDF("id", "toks"), "id", "toks",
          window, stride)
        .select($"chunk_start", $"chunk_text")
        .collect().map(r => (r.getLong(0), r.getString(1)))
        .sortBy(_._1).toSeq
      // reference: grid starts while a chunk still adds a new token
      val want = Iterator.from(0, stride)
        .takeWhile(s => s == 0 && nToks > 0 ||
          (s < nToks - window + stride && s < nToks))
        .map(s => (s.toLong,
          toks.slice(s, math.min(s + window, nToks)).mkString(" ")))
        .toSeq
      (got == want) :| s"got=$got want=$want w=$window s=$stride n=$nToks"
    }

  property("BPE mergeSymbols equals the greedy Scala fold") =
    Prop.forAll(Gen.listOf(Gen.oneOf("a", "b", "c")),
      Gen.oneOf("a", "b"), Gen.oneOf("a", "c")) { (syms, a, b) =>
      val spark = SparkSpec.spark
      import spark.implicits._
      val got = Seq(Tuple1(syms)).toDF("symbols")
        .select(graft.operators.Bpe.mergeSymbols($"symbols", a, b))
        .as[Seq[String]].head()
      val want = syms.foldLeft(Vector.empty[String]) { (acc, s) =>
        if (acc.nonEmpty && acc.last == a && s == b)
          acc.init :+ (a + b)
        else acc :+ s
      }
      (got == want) :| s"got=$got want=$want syms=$syms pair=($a,$b)"
    }

  // winnowing guarantee (Schleimer et al.): two documents sharing a
  // run of window+guarantee-1 tokens share at least one fingerprint —
  // for ANY corpus text around the shared run and any (w, g) in range.
  // Tokens draw from a 4-symbol alphabet so accidental sharing is
  // common too (the property only asserts the guaranteed direction).
  property("winnowing guarantee: a shared w+g-1 run shares a print") =
    Prop.forAll(
      Gen.chooseNum(2, 4), Gen.chooseNum(1, 3),
      Gen.listOf(Gen.oneOf("aa", "bb", "cc", "dd")).map(_.take(12)),
      Gen.listOf(Gen.oneOf("ee", "ff", "gg", "hh")).map(_.take(12))
    ) { (w, g, pre, post) =>
      val spark = SparkSpec.spark
      import spark.implicits._
      // the shared run: w+g-1 tokens from a disjoint alphabet, so it
      // cannot partially overlap the surrounding text
      val run = (0 until (w + g - 1)).map(i => s"r$i")
      val docA = (pre ++ run).mkString(" ")
      val docB = (run ++ post).mkString(" ")
      val fps = graft.operators.Dedup.winnowFingerprints(
        Seq((1L, docA), (2L, docB)).toDF("doc_id", "text"),
        "doc_id", "text", window = w, guarantee = g)
        .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSet)
        .toMap
      val shared = fps.getOrElse(1L, Set.empty[Long])
        .intersect(fps.getOrElse(2L, Set.empty[Long]))
      shared.nonEmpty :| s"w=$w g=$g pre=$pre post=$post fps=$fps"
    }

  // X75 conservation on ANY corpus (a 3-symbol alphabet makes natural
  // repeats everywhere): |original| = |clean| + removed. Idempotence
  // is NOT general — removal can create a new adjacency that repeats
  // an earlier span (e.g. "r x q q q q r x" at w=2 needs two passes)
  // — so it is asserted only for the loop-at-the-end construction
  // with a repeat-free body, where one pass provably settles.
  property("stripWithinDocRepeats: token conservation; loop idempotence") =
    Prop.forAll(
      Gen.chooseNum(2, 4),
      Gen.listOf(Gen.oneOf("ka", "kb", "kc")).map(_.take(16)),
      Gen.chooseNum(0, 8)
    ) { (w, noisy, nBody) =>
      val spark = SparkSpec.spark
      import spark.implicits._
      import org.apache.spark.sql.functions._
      def strip(s2: String) = graft.operators.Dedup
        .stripWithinDocRepeats(Seq((1L, s2)).toDF("doc_id", "text"),
          "doc_id", "text", window = w)
        .select($"text", $"removed_tokens").as[(String, Long)].head()
      // leg 1: conservation on the repeat-heavy random corpus
      val anyText = (noisy ++ (0 until w).map(i => s"u$i")
        ++ (0 until w).map(i => s"u$i")).mkString(" ")
      val a = strip(anyText)
      val conserved =
        anyText.split("\\s+").count(_.nonEmpty) ==
          a._1.split("\\s+").count(_.nonEmpty) + a._2
      // leg 2: distinct body + trailing double loop → one pass settles
      val cleanBody = (0 until nBody).map(i => s"b$i")
      val loopText = (cleanBody ++ (0 until w).map(i => s"u$i")
        ++ (0 until w).map(i => s"u$i")).mkString(" ")
      val once = strip(loopText)
      val twice = strip(once._1)
      val idem = twice == ((once._1, 0L))
      (conserved && idem) :|
        s"w=$w any='$anyText' a=$a once=$once twice=$twice"
    }

  property("ngramDistance/Search equal the multiset reference") =
    Prop.forAll(Gen.alphaLowerStr.map(_.take(12)),
      Gen.alphaLowerStr.map(_.take(12))) { (x, y) =>
      val spark = SparkSpec.spark
      import spark.implicits._
      import graft.functions.ch
      val r = Seq((x, y)).toDF("a", "b")
        .select(ch.ngramDistance($"a", $"b"), ch.ngramSearch($"a", $"b"))
        .collect().head
      def grams(s: String) =
        if (s.length < 4) Nil
        else (0 to s.length - 4).map(i => s.substring(i, i + 4))
      def counts(s: String) = grams(s).groupBy(identity).view
        .mapValues(_.size.toLong).toMap
      val (ca, cb) = (counts(x), counts(y))
      val (na, nb) = (grams(x).size, grams(y).size)
      val overlap = ca.map { case (g, c) =>
        math.min(c, cb.getOrElse(g, 0L)) }.sum
      val wantDist =
        if (na + nb == 0) 0.0
        else if (na == 0 || nb == 0) 1.0
        else 1.0 - 2.0 * overlap / (na + nb)
      val wantSearch = if (nb == 0) 0.0 else overlap.toDouble / nb
      val ok = math.abs(r.getDouble(0) - wantDist) < 1e-9 &&
        math.abs(r.getDouble(1) - wantSearch) < 1e-9
      ok :| s"got=(${r.getDouble(0)},${r.getDouble(1)}) " +
        s"want=($wantDist,$wantSearch) x=$x y=$y"
    }
}
