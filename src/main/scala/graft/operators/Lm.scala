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
    GraftSqlBridge.column(graft.plans.Dictionaries.dictGetOrNull(Seq(
      GraftSqlBridge.expression(lit(dict)),
      GraftSqlBridge.expression(lit("logp")),
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
