package graft

import org.apache.spark.sql.functions._

import graft.functions.text._

/** Unit coverage for the text-analysis library. */
class TextSpec extends SparkSpec {
  import spark.implicits._

  test("normalizeText lowercases, trims, collapses whitespace") {
    val got = Seq("  A  B\tc ").toDF("t").select(normalizeText($"t"))
      .as[String].head()
    assert(got == "a b c")
  }

  test("ngrams: distinct 3-grams; short docs yield empty, not error") {
    val df = Seq("a b c d a b c d", "a b").toDF("t")
    val got = df.select(ngrams(tokenize($"t"), 3)).as[Seq[String]]
      .collect().toSeq
    assert(got.head.toSet == Set("a b c", "b c d", "c d a", "d a b"))
    assert(got(1).isEmpty)
  }

  test("prefixKey joins the first k tokens") {
    val got = Seq("one two three four").toDF("t")
      .select(prefixKey(tokenize($"t"), 3)).as[String].head()
    assert(got == "one two three")
  }

  test("langId: stopword argmax with deterministic tie-break, und fallback") {
    val df = Seq(
      "the cat and the dog", // en
      "der hund und die katze", // de
      "zzz qqq www") // no profile hits
      .toDF("t")
    assert(df.select(langId(tokenize($"t"))).as[String].collect().toSeq ==
      Seq("en", "de", "und"))
  }

  test("qualityScore stays in [0,1] and rewards clean prose") {
    val df = Seq(
      "the cat sat on the mat and the dog slept in the sun",
      "!!! ??? *** ###").toDF("t")
    val Seq(clean, noisy) = df.select(qualityScore($"t")).as[Double]
      .collect().toSeq
    assert(clean > noisy)
    assert(clean >= 0.0 && clean <= 1.0 && noisy >= 0.0 && noisy <= 1.0)
  }

  test("token counts: whitespace vs BPE-ish regex") {
    val df = Seq("hello world42 foo-bar!").toDF("t")
    val (ws, bpe) = df.select(tokenCountWs($"t"), tokenCountBpe($"t"))
      .as[(Long, Long)].head()
    assert(ws == 3L)
    // hello | world | 42 | foo | - | bar | !  → 7
    assert(bpe == 7L)
  }

  test("fingerprint: known rolling-hash value, normalization-invariant") {
    val df = Seq("hi", "  HI ", "hj").toDF("t")
    val got = df.select(fingerprint($"t")).as[Long].collect().toSeq
    assert(got.head == 3329L) // (0*31+104)*31+105
    assert(got(0) == got(1)) // normalize first
    assert(got(0) != got(2))
  }

  test("native fingerprint equals the combinator spec (incl. empty/punct/accents)") {
    val df = Seq("hi", "", "  Mixed CASE  text! 42 ", "déjà vu — naïve",
      "a" * 500).toDF("t")
    val got = df.select(fingerprint($"t"), fingerprintColumn($"t"))
      .as[(Long, Long)].collect()
    got.foreach { case (nat, comb) => assert(nat == comb) }
  }

  test("native stopwordCount equals the combinator spec on every profile") {
    val df = Seq("the cat and the hat is in the house",
      "der hund und die katze", "", "no profile words here xyz")
      .toDF("t")
    langProfiles.foreach { case (_, words) =>
      val got = df.select(
        stopwordCount(tokenize($"t"), words),
        stopwordCountColumn(tokenize($"t"), words))
        .as[(Long, Long)].collect()
      got.foreach { case (nat, comb) => assert(nat == comb) }
    }
  }

  test("punctRatio counts only non [a-z0-9 space] chars") {
    val got = Seq("ab!?").toDF("t").select(punctRatio($"t")).as[Double].head()
    assert(math.abs(got - 0.5) < 1e-12)
  }

  test("hashBagEmbed: slot counts match the hand-computed rolling hash") {
    def rh(s: String): Long =
      s.foldLeft(0L)((h, c) => (h * 31 + c.toLong) % 1000000007L)
    val toks = Seq("hello", "world", "abc", "hello")
    val got = Seq(toks).toDF("toks")
      .select(hashBagEmbed($"toks", 16)).as[Seq[Double]].head()
    val want = (0 until 16).map(i =>
      toks.count(t => rh(t) % 16 == i).toDouble)
    assert(got == want)
    assert(got.sum == 4.0) // every token lands in exactly one slot
    // empty token list → a well-defined all-zero vector
    val empty = Seq(Seq.empty[String]).toDF("toks")
      .select(hashBagEmbed($"toks", 8)).as[Seq[Double]].head()
    assert(empty == Seq.fill(8)(0.0))
  }
}
