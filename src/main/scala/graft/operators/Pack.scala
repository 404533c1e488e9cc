package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for training-data pipelines: assign documents to
  * fixed-token-budget bins (the pre-tokenization step that turns a
  * document pile into context-window-sized training sequences).
  *
  * Packing is SHARD-LOCAL by design: documents are first assigned to
  * `shards` deterministic hash shards, and the running token total
  * resets per shard. A single global ordered prefix-sum would funnel
  * 100 TB through ONE window partition — the canonical scale killer —
  * while training shards are independent files anyway, so bin
  * identity only ever needs to be unique, not globally ordered. Within
  * a shard documents pack in id order (deterministic, replayable by
  * any engine with window functions — the DuckDB oracle replays it
  * verbatim).
  *
  * The bin rule is budgeted chunking: a document starts a new bin when
  * the exclusive running total crosses a budget multiple —
  * `bin = floor(prefix / budget)`. An oversized document (longer than
  * the budget) occupies its bins alone and the next document starts
  * cleanly after it; nothing is dropped or truncated silently — the
  * `oversize` flag marks such documents for the caller to split
  * upstream.
  */
object Pack {

  /** Add (shard, bin, oversize) to `df`. `tokenCol` must be a non-null
    * long (compute it with `text.tokenCountWs`/`tokenCountBpe`).
    *
    * Shard assignment is `id mod shards` — portable across engines
    * (the oracle replays it; a hash-based shard would pin the corpus
    * to one engine's hash) and uniform for the sequential ids
    * training corpora carry. Swap in a hash of the id upstream if
    * ids are adversarially skewed.
    */
  def packBudgeted(df: DataFrame, idCol: String, tokenCol: String,
      budget: Long, shards: Int): DataFrame = {
    require(budget > 0 && shards > 0, "packBudgeted: budget/shards > 0")
    val id = col(s"`$idCol`")
    val toks = col(s"`$tokenCol`")
    val shard = pmod(id, lit(shards.toLong)).as("shard")
    val w = Window.partitionBy(col("shard")).orderBy(id)
      .rowsBetween(Window.unboundedPreceding, -1)
    df.withColumn("shard", shard)
      .withColumn("__prefix", coalesce(sum(toks).over(w), lit(0L)))
      .withColumn("bin", (col("__prefix") / budget).cast("long"))
      .withColumn("oversize", toks > budget)
      .drop("__prefix")
  }

  /** Sliding-window chunking with overlap — the long-document
    * preprocessing step for context-window training and retrieval
    * indexing: token window `window`, step `stride` (overlap =
    * window − stride). Chunk starts sit on the stride grid; a chunk
    * is emitted iff it contributes at least one token its predecessor
    * did not cover (start = 0 or start < n − window + stride), so the
    * tail never yields a chunk strictly contained in the previous one
    * and every token lands in ≥ 1 chunk. Empty token arrays emit
    * nothing.
    *
    * A projection + Generate — no shuffle, no window state; chunking
    * parallelizes by row at any corpus size, and the per-row fan-out
    * is ⌈n/stride⌉ rows of ≤ `window` tokens, bounded and local.
    * Output: id, `chunk_idx` (0-based grid index), `chunk_start`
    * (token offset), `n_chunk_tokens`, `chunk_toks`, `chunk_text`.
    */
  def chunkOverlap(df: DataFrame, idCol: String, toksCol: String,
      window: Int, stride: Int): DataFrame = {
    require(window >= 1 && stride >= 1 && stride <= window,
      "chunkOverlap: need window >= stride >= 1 (stride > window would " +
        "leave token gaps between chunks)")
    val toks = col(s"`$toksCol`")
    val n = size(toks).cast("long")
    // last grid start that still adds new tokens; clamped into [0, n)
    val lastStart =
      greatest(least(n - window + stride - 1, n - 1), lit(0L))
    df.filter(size(toks) > 0)
      .select(col(s"`$idCol`"), toks.as("__toks"),
        explode(sequence(lit(0L), lastStart, lit(stride.toLong)))
          .as("chunk_start"))
      .select(col(s"`$idCol`"),
        (col("chunk_start") / stride).cast("long").as("chunk_idx"),
        col("chunk_start"),
        slice(col("__toks"), col("chunk_start").cast("int") + 1,
          lit(window)).as("chunk_toks"))
      .withColumn("n_chunk_tokens", size(col("chunk_toks")).cast("long"))
      .withColumn("chunk_text", concat_ws(" ", col("chunk_toks")))
  }

  /** Bin-level packing summary: documents, tokens, and fill ratio per
    * (shard, bin) — the measure that tells whether the budget wastes
    * context (fill << 1) or the corpus needs upstream splitting
    * (oversize bins).
    */
  def packSummary(packed: DataFrame, tokenCol: String,
      budget: Long): DataFrame =
    packed.groupBy(col("shard"), col("bin"))
      .agg(
        count(lit(1)).as("docs"),
        sum(col(s"`$tokenCol`")).cast("long").as("tokens"),
        max(col("oversize")).as("has_oversize"))
      .withColumn("fill",
        round(col("tokens").cast("double") / budget, 6))

  /** Sequence-length histogram with padding-waste accounting — the
    * report that decides between padding and packing (and sizes the
    * context window): documents bucket by the power-of-two CEILING of
    * their token count (bucket 128 holds lengths 65..128; length 0
    * sits in bucket 1 with length 1), and each bucket reports how
    * many pad tokens naive pad-to-bucket batching would burn
    * (`bucket·docs − tokens`) next to the real token mass. The
    * padded-waste share across buckets is the headline number a
    * packing pass (e.g. [[packBudgeted]]) eliminates.
    *
    * Bucket arithmetic is integer-exact and engine-portable:
    * the smallest power of two ≥ len is `1 << bitLength(len-1)`,
    * and the bit length is the string length of the binary rendering
    * `bin(len-1)` — both Spark and DuckDB ship `bin` with identical
    * semantics, so the compared surface carries no float `log2` (a
    * float log at a power-of-two boundary is exactly the q137 ULP
    * trap). Scale shape: one map-side projection plus one groupBy
    * whose cardinality is ≤ 64 buckets — partial aggregation does all
    * the work; nothing corpus-sized shuffles.
    */
  def lengthHistogram(df: DataFrame, tokenCol: String): DataFrame = {
    val len = col(s"`$tokenCol`").cast("long")
    val clamped = greatest(len, lit(1L))
    // Spark's builtin bin as the Catalyst node, NOT functions.bin: the
    // dialect registers a full-width 64-char "bin" (CH semantics) and
    // name-based resolution would pick it up here, turning the bit
    // length into a constant 64 (the round-8 name-shadow trap)
    val binRaw = org.apache.spark.sql.GraftSqlBridge.column(
      org.apache.spark.sql.catalyst.expressions.Bin(
        org.apache.spark.sql.GraftSqlBridge.expression(clamped - 1)))
    val bucket = when(clamped === 1L, lit(1L))
      .otherwise(call_function("shiftleft", lit(1L), length(binRaw)))
    df.withColumn("len_bucket", bucket)
      .groupBy(col("len_bucket"))
      .agg(
        count(lit(1)).as("docs"),
        sum(len).as("tokens"))
      .withColumn("pad_waste",
        col("len_bucket") * col("docs") - col("tokens"))
  }

  /** T5-style span-corruption (input, target) pair builder — the
    * denoising-objective data prep: every `maskEvery`-th token
    * position (phase-shifted per document) starts a masked span of
    * `spanLen` tokens; the INPUT replaces each span with a numbered
    * sentinel `<extra_id_k>`, the TARGET lists each sentinel followed
    * by the tokens it hides. Masking is PURE ARITHMETIC on
    * (doc_id, position) — deterministic, overlap-free by construction
    * (spanLen ≤ maskEvery), and replayable by any engine, which an
    * RNG sampler is not; swap the phase for epoch-varied corruption.
    *
    * Scale shape: one projection — per-row HOFs over the token array,
    * no shuffle, no state. Returns (id, n_tokens, n_masked,
    * input_text, target_text).
    */
  def spanCorruptionPairs(docs: DataFrame, idCol: String,
      textCol: String, maskEvery: Int = 10,
      spanLen: Int = 3): DataFrame = {
    require(spanLen >= 1 && spanLen <= maskEvery,
      "spanCorruptionPairs: need 1 <= spanLen <= maskEvery")
    val m = maskEvery
    // exact-integer contract: ids must stay below 2^58 so d31 = id*31
    // cannot overflow long; the span indices below are computed with
    // IntegralDivide (long arithmetic), NOT Column `/` (IEEE double),
    // because above ~2^53/31 double division rounds the operands and
    // sentinel numbering silently diverges from integer `//` replay
    def intDiv(a: Column, b: Long): Column =
      org.apache.spark.sql.GraftSqlBridge.column(
        org.apache.spark.sql.catalyst.expressions.IntegralDivide(
          org.apache.spark.sql.GraftSqlBridge.expression(a),
          org.apache.spark.sql.catalyst.expressions.Literal(b)))
    val d31 = col(s"`$idCol`").cast("long") * 31L
    val toks = filter(graft.functions.text.tokenize(col(s"`$textCol`")),
      t => t =!= "")
    // span phase: first span starts at i0 = (m − d31 % m) % m; token i
    // is masked iff (i + d31) % m < spanLen; its span index is
    // (i + d31) div m − ceil(d31 / m)
    def pm(i: Column) = pmod(i + d31, lit(m.toLong))
    def kIdx(i: Column) =
      intDiv(i + d31, m.toLong) - intDiv(d31 + (m - 1).toLong, m.toLong)
    def sentinel(i: Column) =
      concat(lit("<extra_id_"), kIdx(i).cast("string"), lit(">"))
    // a continuation slot is only masked when its span START exists
    // in-document (i − pm ≥ 0) — without this, the phase shift leaks
    // a headless half-span at the document start
    def masked(i: Column) = pm(i) < spanLen && i >= pm(i)
    val input = flatten(zip_with(toks,
      sequence(lit(0L), greatest(size(toks).cast("long") - 1L, lit(0L))),
      (t, i) => when(pm(i) === 0L, array(sentinel(i)))
        .when(masked(i), array().cast("array<string>"))
        .otherwise(array(t))))
    val target = flatten(zip_with(toks,
      sequence(lit(0L), greatest(size(toks).cast("long") - 1L, lit(0L))),
      (t, i) => when(pm(i) === 0L, array(sentinel(i), t))
        .when(masked(i), array(t))
        .otherwise(array().cast("array<string>"))))
    val nMasked = size(filter(zip_with(toks,
      sequence(lit(0L), greatest(size(toks).cast("long") - 1L, lit(0L))),
      (t, i) => masked(i)), x => x))
    docs.select(col(s"`$idCol`").as("id"),
      size(toks).cast("long").as("n_tokens"),
      when(size(toks) > 0, nMasked.cast("long")).otherwise(0L)
        .as("n_masked"),
      when(size(toks) > 0, concat_ws(" ", input)).otherwise(lit(""))
        .as("input_text"),
      when(size(toks) > 0, concat_ws(" ", target)).otherwise(lit(""))
        .as("target_text"))
  }

}
