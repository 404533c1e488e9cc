package graft

import org.apache.spark.sql.functions._

import graft.functions.text
import graft.operators.Pack

/** PII scrubbing, repetition quality gates, and sequence packing —
  * known-answer cases for the X-family additions of round 7.
  */
class TextPipelineSpec extends SparkSpec {
  import spark.implicits._

  test("redactPii: emails, IPv4s, phones — in the order that composes") {
    val cases = Seq(
      ("write to bob.smith+x@corp.example.org today",
        "write to <EMAIL> today"),
      ("server 192.168.0.1 answered", "server <IP> answered"),
      ("call +1 (555) 010-1234 now", "call <PHONE> now"),
      // all three, adjacent: email first (digits inside), ip before
      // phone (the dotted quad must not half-match as a phone)
      ("a1@b.co 10.0.0.7 +44 20 7946 0958 done",
        "<EMAIL> <IP> <PHONE> done"),
      ("no pii here at all", "no pii here at all"),
      // a bare short number is NOT a phone (>= 9 chars total)
      ("only 12345 here", "only 12345 here"))
    val got = cases.map(_._1).toDF("t")
      .select(text.redactPii(col("t"))).collect().map(_.getString(0))
    assert(got.toSeq == cases.map(_._2))
  }

  test("piiCounts agrees with redaction") {
    val r = Seq("x@y.io and z@w.dev via 10.1.1.1 call +1 555 010 9999")
      .toDF("t").select(text.piiCounts(col("t")).as("p"))
      .select(col("p.email"), col("p.ip"), col("p.phone"))
      .collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == ((2L, 1L, 1L)))
  }

  test("dupNgramFraction / topNgramShare: hand-computed documents") {
    val df = Seq(
      "a b a b a b",  // 2-grams: ab ba ab ba ab -> 5 total, 2 distinct
      "w x y z",      // 3 total, 3 distinct -> dup 0, top 1/3
      "solo",         // shorter than n -> 0, 0
      "t t t t t")    // 4 total, 1 distinct ("t t" x4)
      .toDF("text")
    val r = df.select(
      text.dupNgramFraction(text.tokenize(col("text")), 2).as("d"),
      text.topNgramShare(text.tokenize(col("text")), 2).as("s"))
      .collect().map(x => (x.getDouble(0), x.getDouble(1)))
    assert(r(0) == ((1.0 - 2.0 / 5, 3.0 / 5)))  // "a b" occurs 3x
    assert(r(1) == ((0.0, math.floor(1.0 / 3 * 1e6) / 1e6)))
    assert(r(2) == ((0.0, 0.0)))
    assert(r(3) == ((0.75, 1.0)))
  }

  test("packBudgeted: bins chunk at the budget, oversize flagged") {
    // one shard (shards=1) for a hand-checkable sequence
    val docs = Seq((0L, 300L), (1L, 300L), (2L, 2000L), (3L, 100L))
      .toDF("doc_id", "n_tok")
    val packed = Pack.packBudgeted(docs, "doc_id", "n_tok",
      budget = 512L, shards = 1)
      .orderBy("doc_id")
      .select("doc_id", "bin", "oversize").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    // prefixes: 0, 300, 600, 2600 -> bins 0, 0, 1, 5
    assert(packed.toSeq == Seq((0L, 0L, false), (1L, 0L, false),
      (2L, 1L, true), (3L, 5L, false)))
    // shard-local: two shards pack independently
    val sharded = Pack.packBudgeted(docs, "doc_id", "n_tok",
      budget = 512L, shards = 2)
      .select("doc_id", "shard", "bin").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    // shard 0: ids 0,2 (prefix 0,300); shard 1: ids 1,3 (prefix 0,300)
    assert(sharded.toSeq == Seq((0L, 0L, 0L), (1L, 1L, 0L),
      (2L, 0L, 0L), (3L, 1L, 0L)))
    val summary = Pack.packSummary(
      Pack.packBudgeted(docs, "doc_id", "n_tok", 512L, 1), "n_tok", 512L)
      .orderBy("bin").collect()
    assert(summary.length == 3) // bins 0, 1, 5
    assert(summary.head.getAs[Long]("docs") == 2L)
  }

  test("chunkOverlap: grid starts, overlap, new-token tail rule by hand") {
    def toks(n: Int) = (0 until n).map(i => s"t$i")
    val docs = Seq(
      (0L, toks(10)), // window 4 stride 3: starts 0,3,6 (9 adds t9? 9<10-4+3=9? no) — see asserts
      (1L, toks(4)),  // exactly one window
      (2L, toks(2)),  // shorter than window: one short chunk
      (3L, Seq.empty[String])) // empty: no chunks
      .toDF("doc_id", "toks")
    val got = Pack.chunkOverlap(docs, "doc_id", "toks",
        window = 4, stride = 3)
      .select("doc_id", "chunk_idx", "chunk_start", "n_chunk_tokens",
        "chunk_text")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4)))
      .sortBy(t => (t._1, t._2)).toSeq
    // doc 0 (n=10): lastStart = min(10-4+3-1, 9) = 8 → starts 0,3,6
    //   (9 > 8 — the chunk at 9 would only repeat t9, already covered)
    assert(got.filter(_._1 == 0L) == Seq(
      (0L, 0L, 0L, 4L, "t0 t1 t2 t3"),
      (0L, 1L, 3L, 4L, "t3 t4 t5 t6"),
      (0L, 2L, 6L, 4L, "t6 t7 t8 t9")))
    // doc 1 (n=4): lastStart = min(4-2, 3) = 2 → starts 0; 3>2 stops
    //   the contained-tail chunk at 3
    assert(got.filter(_._1 == 1L) == Seq((1L, 0L, 0L, 4L, "t0 t1 t2 t3")))
    // doc 2 (n=2): single short chunk
    assert(got.filter(_._1 == 2L) == Seq((2L, 0L, 0L, 2L, "t0 t1")))
    // doc 3: nothing
    assert(!got.exists(_._1 == 3L))
    // stride > window is a token-gap bug, refused loudly
    intercept[IllegalArgumentException] {
      Pack.chunkOverlap(docs, "doc_id", "toks", window = 2, stride = 5)
    }
  }

  test("chunkOverlap: projection-only plan, no shuffle") {
    val docs = Seq((0L, Seq("a", "b", "c"))).toDF("doc_id", "toks")
    val plan = Pack.chunkOverlap(docs, "doc_id", "toks", 2, 2)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"))
  }

  test("BPE: word table, greedy merge fold, and a hand-walked training run") {
    import graft.operators.Bpe
    // the Sennrich toy corpus shape: low/lower share the 'lo' stem
    val docs = Seq("low low low lower lower newest").toDF("text")
    val words = Bpe.wordTable(docs, "text")
    val w = words.collect()
      .map(r => (r.getAs[Seq[String]]("symbols").mkString("|"),
        r.getAs[Long]("freq"))).toMap
    assert(w("l|o|w|</w>") == 3L)
    assert(w("l|o|w|e|r|</w>") == 2L)
    assert(w("n|e|w|e|s|t|</w>") == 1L)
    // pair counts weight by word freq: (l,o) = 3 + 2
    val pc = Bpe.pairCounts(words).collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
    assert(pc(("l", "o")) == 5L)
    assert(pc(("w", "</w>")) == 3L)
    assert(pc(("e", "r")) == 2L)
    // greedy fold: "aaa" under (a,a) merges left-to-right, no overlap
    val tricky = Seq(Seq("a", "a", "a")).toDF("symbols")
      .select(Bpe.mergeSymbols($"symbols", "a", "a")).as[Seq[String]]
      .head()
    assert(tricky == Seq("aa", "a"))
    // two rounds by hand: round 1 winner is (l,o) 5 — ties under it
    // resolve (count desc, pair asc); round 2 merges (lo,w) 5
    val (merges, trained) = Bpe.train(words, 2)
    assert(merges.map(m => (m._1, m._2, m._3, m._4)) ==
      Seq((1, "l", "o", 5L), (2, "lo", "w", 5L)))
    val t = trained.collect()
      .map(r => (r.getAs[Seq[String]]("symbols").mkString("|"),
        r.getAs[Long]("freq"))).toMap
    assert(t("low|</w>") == 3L)
    assert(t("low|e|r|</w>") == 2L)
    // a train longer than the pair supply stops early, no failure
    val (all, _) = Bpe.train(words, 1000)
    assert(all.nonEmpty && all.size < 1000)
    // encode with the 2-merge table: trained words join their merged
    // symbols in word order; an OOV word falls back to characters
    val enc = Bpe.encodeCorpus(
      Seq((7L, "low lower xyz")).toDF("doc_id", "text"),
      "doc_id", "text", trained).collect().head
    assert(enc.getSeq[String](enc.fieldIndex("bpe_tokens")) ==
      Seq("low", "</w>", "low", "e", "r", "</w>",
        "x", "y", "z", "</w>"))
    assert(enc.getAs[Long]("n_bpe_tokens") == 10L)
  }

  test("plans stay map-side: repetition metrics add no shuffle") {
    val df = Seq("a b c a b").toDF("text")
      .select(text.dupNgramFraction(text.tokenize(col("text")), 2))
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"))
  }

  test("LM scoring: smoothing math by hand, OOV floor, shuffle-free plan") {
    import graft.operators.Lm
    import spark.implicits._
    // corpus: 6 tokens total — "a" x3, "b" x2, "c" x1; top-2 vocab is
    // {a, b} (count desc), "c" falls to the OOV floor
    val corpus = Seq("a a b", "a b c").toDF("text")
    val m = Lm.trainUnigram(corpus, "text", "lm_spec", topV = 2)
    assert(m.totalTokens == 6L)
    val denom = 6.0 + 2 + 1
    val expA = math.log(4.0 / denom) // (3+1)/9
    val expB = math.log(3.0 / denom) // (2+1)/9
    val floor = math.log(1.0 / denom)
    assert(math.abs(m.floorLogp - floor) < 1e-12)
    val scored = Seq("a b", "c c").toDF("text")
      .select(Lm.avgLogProb(m, col("text")).as("lp"))
    val got = scored.collect().map(_.getDouble(0))
    assert(math.abs(got(0) - (expA + expB) / 2) < 1e-12)
    assert(math.abs(got(1) - floor) < 1e-12) // all-OOV doc = the floor
    // the scale contract: scoring is a pure projection — dictionary
    // probes ride the task binary, no explode, no join, no exchange.
    // (asserted over a FILE scan: a local relation constant-folds the
    // whole expression away and proves nothing)
    val plan = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select(Lm.avgLogProb(m, col("text")).as("lp"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("dict_get"), plan)
    assert(!plan.contains("Exchange") && !plan.contains("Join"), plan)
  }

  test("bigram stupid backoff: hand-computed conditionals, backoff " +
      "legs, tie-break, one-token and all-OOV docs; shuffle-free plan") {
    import graft.operators.Lm
    import spark.implicits._
    // tokens: [a b a b], [a c] — uni a:3 b:2 c:1, N=6; pairs
    // (a,b):2 (b,a):1 (a,c):1; topB=2 keeps (a,b) then the count-1
    // tie broken by left asc → (a,c), so (b,a) must back off
    val corpus = Seq("a b a b", "a c").toDF("text")
    val m = Lm.trainBigram(corpus, "text", "lm_bi_spec",
      topV = 3, topB = 2)
    assert(m.totalTokens == 6L)
    def fp(x: Double): Long = math.round(x * 1e6)
    val uniA = fp(math.log(4.0 / 10)) // (3+1)/(6+3+1)
    val floor = fp(math.log(1.0 / 10))
    assert(m.floorFp == floor)
    val alphaFp = fp(math.log(0.4))
    assert(m.alphaFp == alphaFp)
    val biAB = fp(math.log(2.0 / 3)) // cnt(a b)/cnt(a)
    val biAC = fp(math.log(1.0 / 3))
    val got = Seq("a b a b", "a c", "z", "a z")
      .toDF("text")
      .select(Lm.bigramScoreFp(m, col("text")).as("s"))
      .collect().map(_.getLong(0)).toSeq
    assert(got == Seq(
      uniA + biAB + (alphaFp + uniA) + biAB, // (b,a) backs off
      uniA + biAC,
      floor,                                 // one-token OOV doc
      uniA + (alphaFp + floor)))             // OOV tail backs off
    // scale contract: scoring is a pure projection (file scan — a
    // local relation would constant-fold the whole thing away)
    val plan = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select(Lm.bigramScoreFp(m, col("text")).as("s"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("dict_get"), plan)
    assert(!plan.contains("Exchange") && !plan.contains("Join"), plan)
  }

  test("naive-Bayes langId: separable corpus classifies, OOV falls to " +
      "floors, ties resolve to the first sorted language") {
    import graft.operators.Lm
    import spark.implicits._
    val corpus = Seq(
      ("aa", "x x y"), ("aa", "x y y"),
      ("bb", "p p q"), ("bb", "p q q")).toDF("lang", "text")
    val m = Lm.trainNbLang(corpus, "lang", "text", "nb_spec", topV = 4)
    assert(m.langs == Seq("aa", "bb"))
    // class aa: N=6, tokens x:3 y:3; class bb: N=6, p:3 q:3;
    // floors: ln(1/(6+4+1))
    def fp(x: Double): Long = math.round(x * 1e6)
    assert(m.floorsFp("aa") == fp(math.log(1.0 / 11)))
    val got = Seq("x x p", "p q x", "zz zz")
      .toDF("text")
      .select(Lm.nbLangPredict(m, col("text")).as(("g")))
      .as[String].collect().toSeq
    // "x x p": aa = 2·ln(4/11)+floor, bb = 2·floor+ln(4/11) → aa wins
    // "p q x": bb two in-vocab vs aa one → bb
    // "zz zz": all-OOV — floors are EQUAL (same N, V) → tie → "aa"
    assert(got == Seq("aa", "bb", "aa"))
  }

  test("importanceResample: hand-computed log-ratios, Gumbel keys, " +
      "and the TakeOrdered draw") {
    import graft.operators.Select
    val docs = Seq(
      (1L, "en", "a a b"), (2L, "en", "a b"),
      (3L, "xx", "c c"), (4L, "xx", "a c"))
      .toDF("doc_id", "lang", "text")
    val got = Select.importanceResample(docs, "doc_id", "text",
        isTarget = col("lang") === "en", k = 3, topV = 2, seed = 7L,
        dictPrefix = "irspec")
      .select(col("doc_id"), col("logw_fp"), col("key_fp"))
      .as[(Long, Long, Long)].collect().toSeq

    // target (en): NT=5, vocab {a:3, b:2}, denom 8
    // raw (all):  NR=9, vocab {a:4, c:3} — b is OOV in raw, denom 12
    def fp(x: Double): Long = math.round(x * 1e6)
    val dA = fp(math.log(4.0 / 8) - math.log(5.0 / 12))
    val dB = fp(math.log(3.0 / 8) - math.log(1.0 / 12))
    val dC = fp(math.log(1.0 / 8) - math.log(4.0 / 12))
    val logw = Map(1L -> (2 * dA + dB), 2L -> (dA + dB),
      3L -> 2 * dC, 4L -> (dA + dC))
    // gumbel key from the portable rolling hash of "id#7"
    val p = 1000000007L
    def rh(s: String): Long =
      s.codePoints().toArray.foldLeft(0L)((h, c) => (h * 31 + c) % p)
    def g(id: Long): Long =
      fp(-math.log(-math.log((rh(s"$id#7") + 0.5) / p.toDouble)))
    val keys = logw.map { case (id, w) => id -> (w + g(id)) }
    val expect = keys.toSeq.sortBy { case (id, k) => (-k, id) }.take(3)
      .map { case (id, k) => (id, logw(id), k) }
    assert(got.sortBy(r => (-r._3, r._1)) == expect)
    assert(got.map(_._1).toSet == expect.map(_._1).toSet)

    // scale contract: the draw is TakeOrdered, never a global window
    val plan = Select.importanceResample(docs, "doc_id", "text",
        isTarget = col("lang") === "en", k = 3, topV = 2, seed = 7L,
        dictPrefix = "irspec2")
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
    assert(!plan.contains("Window"), plan)
  }

  test("byTokenBudget: greedy prefix by hand — cutoff, fill, edges") {
    import graft.operators.Select
    import spark.implicits._
    // scores: {0,1,2: s=3} {3,4,5: s=2} {6: s=1}; id 0 is a
    // ZERO-token doc (empty after tokenizing, tokenCountBpe-style)
    val df = Seq((0L, 3L, 0L), (1L, 3L, 10L), (2L, 3L, 10L),
      (3L, 2L, 10L), (4L, 2L, 10L), (5L, 2L, 10L), (6L, 1L, 10L))
      .toDF("id", "s", "t")
    def sel(b: Long) =
      Select.byTokenBudget(df, "s", "t", "id", b, boundaryChunks = 2)
        .select($"id").collect().map(_.getLong(0)).toSet
    // budget 0: the zero-token row still enters (running total 0 <= 0)
    // — the spec's greedy prefix, NOT an empty shortcut
    assert(sel(0) == Set(0L))
    assert(sel(20) == Set(0L, 1L, 2L)) // best bucket fits exactly
    assert(sel(35) == Set(0L, 1L, 2L, 3L)) // fill 15: id 3 only
    assert(sel(45) == Set(0L, 1L, 2L, 3L, 4L)) // fill 25: ids 3, 4
    assert(sel(59) == Set(0L, 1L, 2L, 3L, 4L, 5L)) // 9 left: s=1 out
    assert(sel(60) == (0L to 6L).toSet) // everything fits
    // a continuous score must fail loudly (the histogram would bucket
    // 2.5 as 2 while the keep filter passes it unbudgeted)
    val err = intercept[IllegalArgumentException](
      Select.byTokenBudget(
        df.withColumn("s", $"s" + 0.5), "s", "t", "id", 10))
    assert(err.getMessage.contains("integral"))
    // the corpus-sized scan stays window-free: the one ordered window
    // runs per-chunk over the boundary score only
    val plan = Select
      .byTokenBudget(df, "s", "t", "id", 35, boundaryChunks = 2)
      .queryExecution.executedPlan.toString
    assert(plan.contains("__chunk"), plan)
    assert(!plan.contains("Exchange SinglePartition"), plan)
  }
}
