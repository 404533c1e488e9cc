package graft.operators

import org.apache.spark.sql.{Column, DataFrame, GraftSqlBridge}
import org.apache.spark.sql.functions._

import graft.functions.text

/** Corpus-trained language-model quality scoring — the CCNet-style
  * perplexity filter of an LLM-data pipeline: score every document by
  * how natural its tokens are under a model trained on a reference
  * corpus, then gate on the score. (The reference corpus is typically
  * a clean subset — Wikipedia in CCNet; here the caller passes
  * whatever frame plays that role.)
  *
  * Two phases, each with an explicit scale contract:
  *
  *  - '''train''' — token unigram counts (one token-keyed shuffle with
  *    map-side partials), top-V vocabulary via `orderBy(...).limit(V)`
  *    (TakeOrdered — never a global single-partition window), add-one
  *    smoothing over the closed vocabulary, and the (token, logp)
  *    table registered as an engine dictionary
  *    ([[graft.plans.Dictionaries]]). V is bounded (a dictionary is a
  *    driver replica), which is also the modelling choice: everything
  *    outside the top V shares one OOV floor probability.
  *  - '''score''' — a pure projection: each token probes the
  *    dictionary O(1) inside whole-stage codegen
  *    (`transform` + `dict_get`), misses coalesce to the OOV floor,
  *    and the per-document average needs NO explode and NO shuffle —
  *    the property that lets the gate run map-side in a 100 TB scan,
  *    exactly like the other quality gates (X8–X11, X43).
  *
  * Smoothing: p(t) = (count(t) + 1) / (N + V + 1) for vocabulary
  * tokens, p(oov) = 1 / (N + V + 1), with N the total token count of
  * the training corpus. Deterministic vocabulary tie-break
  * (count desc, token asc) so any engine reproduces the same model.
  */
object Lm {

  /** A trained unigram model: the dictionary name its logp table is
    * registered under, plus the constants a scorer needs.
    */
  final case class UnigramModel(dict: String, vocabSize: Int,
      totalTokens: Long) {
    /** log p of an out-of-vocabulary token. */
    def floorLogp: Double =
      math.log(1.0 / (totalTokens + vocabSize + 1))
  }

  /** Train a unigram model over `corpus`'s `textCol` and register its
    * (token, logp) table as dictionary `dict`. One shuffle (token
    * counts), one TakeOrdered (top-V), one bounded driver collect (the
    * dictionary register, capped at V rows by construction).
    */
  def trainUnigram(corpus: DataFrame, textCol: String, dict: String,
      topV: Int): UnigramModel = {
    // cached across its two actions (the N total and the top-V
    // collect) — without it the explode+groupBy corpus scan runs
    // twice and the one-shuffle contract above is false
    val cnt = corpus
      .select(explode(text.tokenize(col(textCol))).as("t"))
      .groupBy(col("t")).agg(count(lit(1)).as("c"))
      .persist()
    try {
      val n = cnt.agg(coalesce(sum(col("c")), lit(0L))).head().getLong(0)
      val vocab = cnt.orderBy(col("c").desc, col("t").asc).limit(topV)
        .select(col("t"),
          log((col("c") + 1).cast("double") /
            lit((n + topV + 1).toDouble)).as("logp"))
      graft.plans.Dictionaries.register(dict, vocab, "t")
      UnigramModel(dict, topV, n)
    } finally cnt.unpersist()
  }

  private def probe(dict: String, t: Column): Column =
    probeField(dict, "logp", t)

  private def probeField(dict: String, field: String, t: Column): Column =
    GraftSqlBridge.column(graft.plans.Dictionaries.dictGetOrNull(Seq(
      GraftSqlBridge.expression(lit(dict)),
      GraftSqlBridge.expression(lit(field)),
      GraftSqlBridge.expression(t))))

  /** Mean log-probability of `textCol`'s tokens under the model — a
    * shuffle-free scoring column (dictionary probes inside the array
    * fold; no explode, no join).
    */
  def avgLogProb(m: UnigramModel, textCol: Column): Column = {
    val toks = text.tokenize(textCol)
    aggregate(
      transform(toks, t => coalesce(probe(m.dict, t), lit(m.floorLogp))),
      lit(0.0), (acc, x) => acc + x) /
      greatest(size(toks), lit(1)).cast("double")
  }

  /** [[avgLogProb]] as a deterministic integer score (units of 1e-4
    * log-prob): cross-engine comparable without double-sum ordering.
    */
  def logProbScore(m: UnigramModel, textCol: Column): Column =
    round(avgLogProb(m, textCol) * 10000).cast("long")

  /** A trained stupid-backoff bigram model (Brants et al. 2007, "Large
    * Language Models in Machine Translation" — the backoff designed FOR
    * MapReduce-scale training: no discount renormalization pass, so
    * both count tables build in one shuffle each):
    *
    *   S(w_i | w_{i-1}) = cnt(w_{i-1} w_i) / cnt(w_{i-1})   if seen
    *                    = α · S_uni(w_i)                    otherwise
    *
    * Every stored log value is a 1e-6 FIXED-POINT LONG (snapped right
    * after the single `ln`, the X60 discipline), so scoring is pure
    * integer arithmetic — no double-accumulation ordering anywhere.
    */
  final case class BigramModel(uniDict: String, biDict: String,
      vocabSize: Int, totalTokens: Long, alphaFp: Long) {
    /** fixed-point log p of an out-of-vocabulary token. */
    def floorFp: Long =
      math.round(math.log(1.0 / (totalTokens + vocabSize + 1)) * 1e6)
  }

  /** Train a stupid-backoff bigram model: two corpus scans, each
    * feeding ONE map-side-combined shuffle (token counts; adjacent-pair
    * counts — pairs come from zipping the token list with its own
    * tail, per-row local work). The deliberate non-choice: persisting
    * the tokenized corpus to save the second scan would materialize
    * corpus-sized state; two cheap scans is the 100 TB answer.
    *
    * Vocabulary legs are both deterministic TakeOrdered draws (never a
    * global window): top-V unigrams by (count desc, token asc) with
    * add-one smoothing — the [[trainUnigram]] model in fixed-point
    * form — and top-B bigrams by (count desc, left asc, right asc)
    * with conditional log `ln(cnt_ab / cnt_a)` against the FULL
    * unigram count (not the top-V cut; backoff mass stays honest for
    * frequent-pair/rare-head corners). The bigram table rides back
    * over the unigram counts as a broadcast (B rows), and both tables
    * register as engine dictionaries — scoring probes them O(1)
    * inside whole-stage codegen, the [[avgLogProb]] shuffle-free
    * contract.
    */
  def trainBigram(corpus: DataFrame, textCol: String, dictPrefix: String,
      topV: Int, topB: Int, alpha: Double = 0.4): BigramModel = {
    require(topV >= 1 && topB >= 1, "trainBigram: topV/topB must be >= 1")
    require(alpha > 0 && alpha < 1, "trainBigram: alpha must be in (0,1)")
    val toks = text.tokenize(col(textCol))

    val uniCnt = corpus
      .select(explode(toks).as("t"))
      .groupBy(col("t")).agg(count(lit(1)).as("c"))
      .persist()
    try {
      val n = uniCnt.agg(coalesce(sum(col("c")), lit(0L))).head().getLong(0)
      val uni = uniCnt.orderBy(col("c").desc, col("t").asc).limit(topV)
        .select(col("t"),
          round(log((col("c") + 1).cast("double") /
            lit((n + topV + 1).toDouble)) * 1e6d).cast("long").as("lpfp"))
      graft.plans.Dictionaries.register(s"${dictPrefix}_uni", uni, "t")

      val pairs = corpus.select(toks.as("__ts"))
        .select(explode(zip_with(
          slice(col("__ts"), lit(1), size(col("__ts")) - 1),
          slice(col("__ts"), lit(2), size(col("__ts")) - 1),
          (a, b) => struct(a.as("a"), b.as("b")))).as("p"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(count(lit(1)).as("cab"))
        .orderBy(col("cab").desc, col("a").asc, col("b").asc)
        .limit(topB)
      val bi = uniCnt.withColumnRenamed("t", "a")
        .join(broadcast(pairs), "a")
        .select(concat_ws(" ", col("a"), col("b")).as("ab"),
          round(log(col("cab").cast("double") / col("c")) * 1e6d)
            .cast("long").as("lcfp"))
      graft.plans.Dictionaries.register(s"${dictPrefix}_bi", bi, "ab")

      BigramModel(s"${dictPrefix}_uni", s"${dictPrefix}_bi", topV, n,
        math.round(math.log(alpha) * 1e6))
    } finally uniCnt.unpersist()
  }

  /** Total fixed-point log score of `textCol` under a stupid-backoff
    * bigram model: position 1 scores by the unigram leg, positions
    * i ≥ 2 by the bigram conditional when the pair is in the model
    * and `α · S_uni` otherwise. Shuffle-free — both probes are O(1)
    * dictionary lookups inside one codegen'd projection, and the sum
    * is exact integer arithmetic over per-position fixed-point longs.
    */
  def bigramScoreFp(m: BigramModel, textCol: Column): Column = {
    val toks = text.tokenize(textCol)
    def uniFp(t: Column): Column =
      coalesce(probeField(m.uniDict, "lpfp", t), lit(m.floorFp))
    val first = uniFp(element_at(toks, 1))
    // the pair stream zips the token list with its own tail (the
    // trainBigram shape) so the lambda sees (prev, cur) DIRECTLY.
    // The index formulation — element_at(tokens, i) inside the fold —
    // re-evaluates the tokenize expression per element (higher-order
    // lambdas re-evaluate captured argument expressions), turning
    // scoring O(n^2)-with-regex per document: measured 11x slower on
    // the sf0.1 corpus. Empty/one-token docs zip to an empty pair
    // list, so every branch is total (the q149 lesson).
    val pairFp = zip_with(
      slice(toks, lit(1), size(toks) - 1),
      slice(toks, lit(2), size(toks) - 1),
      (a, b) => coalesce(
        probeField(m.biDict, "lcfp", concat_ws(" ", a, b)),
        lit(m.alphaFp) + uniFp(b)))
    val rest = aggregate(pairFp, lit(0L), (acc, x) => acc + x)
    when(size(toks) < 1, lit(0L)).otherwise(first + rest)
  }

  /** A trained naive-Bayes language classifier — the learned upgrade
    * of the stopword-heuristic `text.langId` (X8): per-language
    * unigram models with add-one smoothing, uniform class prior,
    * argmax posterior. Classic NB text classification; at corpus
    * scale it is exactly the X50 machinery once per class.
    */
  final case class NbLangModel(dict: String, langs: Seq[String],
      floorsFp: Map[String, Long])

  /** Train: ONE (lang, token)-keyed count shuffle for all classes,
    * top-V tokens PER LANGUAGE (deterministic tie-break), fixed-point
    * per-token log-probs in one dictionary keyed `"lang tok"`. The
    * per-language OOV floors ride the returned model (5 constants,
    * not a table). V bounds the dictionary replica, which is also the
    * modeling choice — everything outside a language's top V shares
    * its floor.
    */
  def trainNbLang(corpus: DataFrame, langCol: String, textCol: String,
      dict: String, topV: Int): NbLangModel = {
    val cnt = corpus
      .select(col(langCol).as("__lang"),
        explode(text.tokenize(col(textCol))).as("t"))
      .groupBy(col("__lang"), col("t")).agg(count(lit(1)).as("c"))
      .persist()
    try {
      val totals = cnt.groupBy(col("__lang"))
        .agg(sum(col("c")).as("n")).collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      val langs = totals.keys.toSeq.sorted
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("__lang"))
        .orderBy(col("c").desc, col("t").asc)
      val denom = udfFreeDenom(totals, topV)
      val table = cnt
        .withColumn("__rk", row_number().over(w))
        .filter(col("__rk") <= topV)
        .select(concat_ws(" ", col("__lang"), col("t")).as("lt"),
          round(log((col("c") + 1).cast("double") /
            denom(col("__lang"))) * 1e6d).cast("long").as("lpfp"))
      graft.plans.Dictionaries.register(dict, table, "lt")
      val floors = langs.map(l => l -> math.round(
        math.log(1.0 / (totals(l) + topV + 1)) * 1e6)).toMap
      NbLangModel(dict, langs, floors)
    } finally cnt.unpersist()
  }

  /** (lang -> N) as a Column mapping for the smoothing denominator —
    * a literal CASE chain (languages are a handful), never a UDF.
    */
  private def udfFreeDenom(totals: Map[String, Long], topV: Int)
      : Column => Column = langCol =>
    totals.foldLeft(lit(Double.NaN)) { case (acc, (l, n)) =>
      when(langCol === l, lit((n + topV + 1).toDouble)).otherwise(acc)
    }

  /** Predicted language: per-class fixed-point score (dictionary
    * probes + class floor — shuffle-free, the [[bigramScoreFp]]
    * discipline), argmax as a strict-greater CASE chain over the
    * model's sorted language list, so ties resolve to the FIRST
    * language in sorted order on any engine.
    */
  def nbLangPredict(m: NbLangModel, textCol: Column): Column = {
    val toks = text.tokenize(textCol)
    def score(l: String): Column = aggregate(
      transform(toks, t => coalesce(
        probeField(m.dict, "lpfp", concat_ws(" ", lit(l), t)),
        lit(m.floorsFp(l)))),
      lit(0L), (acc, x) => acc + x)
    m.langs.tail.foldLeft(
      (lit(m.langs.head), score(m.langs.head))) {
      case ((bestL, bestS), l) =>
        val s = score(l)
        (when(s > bestS, lit(l)).otherwise(bestL),
          when(s > bestS, s).otherwise(bestS))
    }._1
  }

  /** Total log importance ratio `Σ_t [log p_target(t) − log p_raw(t)]`
    * between two trained models, as exact 1e-6 fixed-point units: each
    * per-token delta (the only transcendental exposure — two `ln`
    * lookups) snaps to an integer BEFORE the sum, and the sum runs in
    * exact integer arithmetic inside the array fold, so no
    * double-accumulation order can move a value across engines (the
    * BM25/X60 discipline). Shuffle-free like [[avgLogProb]]: both
    * probes are O(1) dictionary lookups inside one codegen'd
    * projection.
    */
  def logRatioScoreFp(target: UnigramModel, raw: UnigramModel,
      textCol: Column): Column = {
    val toks = text.tokenize(textCol)
    aggregate(
      transform(toks, t => round((
        coalesce(probe(target.dict, t), lit(target.floorLogp)) -
          coalesce(probe(raw.dict, t), lit(raw.floorLogp))) * 1e6d)
        .cast("long")),
      lit(0L), (acc, x) => acc + x)
  }
}
