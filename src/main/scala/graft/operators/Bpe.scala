package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.text

/** Byte-pair-encoding tokenizer training (Sennrich et al. 2016 — the
  * subword algorithm behind GPT/Llama-family vocabularies), built to
  * the scale discipline that makes it feasible at 100 TB: BPE trains
  * on the WORD-FREQUENCY table, never the corpus. The corpus is
  * scanned exactly once for word counts (one token-keyed shuffle with
  * map-side partials — the q109 vocabulary shape); every merge
  * iteration after that runs over the vocab-bounded word table
  * (≤ |vocab| rows however large the corpus), so k merges cost
  * corpus-scan + k small-table passes, not k corpus scans.
  *
  * Determinism: the winning pair each round is (count desc, left asc,
  * right asc) — engine-portable, so a vocabulary trained here replays
  * anywhere; the merge application is the standard greedy
  * left-to-right fold (a token just formed by this round's merge can
  * merge again only if it literally equals the pair's left symbol).
  */
object Bpe {

  /** Characters of a word plus the `</w>` marker — the untrained
    * base segmentation.
    */
  private def charSymbols(word: Column): Column =
    concat(filter(split(word, ""), ch => length(ch) > 0),
      array(lit("</w>")))

  /** The word table: (symbols: array<string>, freq: long). Words are
    * whitespace tokens split to characters plus the `</w>`
    * end-of-word marker (the original formulation — the marker keeps
    * word-final merges distinct from word-internal ones).
    */
  def wordTable(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(text.tokenize(col(s"`$textCol`"))).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy(col("word")).agg(count(lit(1)).as("freq"))
      .select(col("word"), charSymbols(col("word")).as("symbols"),
        col("freq").cast("long").as("freq"))

  /** Adjacent-pair counts weighted by word frequency: the argmax
    * candidate table of one BPE round. Pairs come from zipping the
    * symbol list with its own tail — per-row local work — and the
    * only shuffle is the (a, b)-keyed count, map-side combined.
    */
  def pairCounts(words: DataFrame): DataFrame = {
    val sym = col("symbols")
    val pairs = zip_with(
      slice(sym, lit(1), size(sym) - 1),
      slice(sym, lit(2), size(sym) - 1),
      (a, b) => struct(a.as("a"), b.as("b")))
    words.filter(size(sym) >= 2)
      .select(explode(pairs).as("p"), col("freq"))
      .groupBy(col("p.a").as("a"), col("p.b").as("b"))
      .agg(sum(col("freq")).as("cnt"))
  }

  /** Apply ONE merge (a, b) → "ab" to a symbols column: the greedy
    * left-to-right fold. `(acc, s)`: when the accumulator ends with
    * `a` and `s = b`, the tail replaces with the merged token;
    * otherwise `s` appends. "aaa" under (a,a) gives [aa, a], the
    * standard greedy behavior.
    */
  def mergeSymbols(sym: Column, a: String, b: String): Column =
    aggregate(sym, array().cast("array<string>"), (acc, s) =>
      when(size(acc) > 0 && element_at(acc, -1) === lit(a) &&
          s === lit(b),
        concat(slice(acc, lit(1), size(acc) - 1), array(lit(a + b))))
        .otherwise(concat(acc, array(s))))

  /** Train `merges` rounds: each round collects the single winning
    * pair (count desc, pair asc — a one-row TakeOrdered, never a
    * global sort materialization), applies it to the word table, and
    * checkpoints the small table so round k+1 plans over data, not
    * k rounds of nested lambdas. Stops early when no pair remains.
    * Returns the merge list (rank, left, right, count) — the
    * trained vocabulary artifact — and the final word table.
    */
  def train(words0: DataFrame, merges: Int)
      : (Seq[(Int, String, String, Long)], DataFrame) = {
    require(merges >= 0, "train: merges must be >= 0")
    var words = words0.localCheckpoint()
    val out = Seq.newBuilder[(Int, String, String, Long)]
    var done = false
    var i = 0
    while (i < merges && !done) {
      val top = pairCounts(words)
        .orderBy(col("cnt").desc, col("a").asc, col("b").asc)
        .limit(1).collect()
      if (top.isEmpty) done = true
      else {
        val (a, b, c) = (top.head.getString(0), top.head.getString(1),
          top.head.getLong(2))
        out += ((i + 1, a, b, c))
        words = words.withColumn("symbols",
          mergeSymbols(col("symbols"), a, b)).localCheckpoint()
      }
      i += 1
    }
    (out.result(), words)
  }

  /** Tokenize a corpus with a TRAINED word table: explode words, join
    * the word → merged-symbols map (vocab-sized — broadcastable, the
    * planner decides), reassemble per document in word order. Cost:
    * one corpus tokenize + one word-keyed join + one doc-keyed
    * shuffle to reassemble — encoding 100 TB never re-runs the merge
    * folds per document, they ran once on the word table. Words the
    * training corpus never saw (OOV) fall back to the character
    * segmentation, the untrained base case.
    * Output: (id, bpe_tokens: array<string>, n_bpe_tokens).
    */
  def encodeCorpus(docs: DataFrame, idCol: String, textCol: String,
      trained: DataFrame): DataFrame = {
    val words = docs
      .select(col(s"`$idCol`"),
        posexplode(text.tokenize(col(s"`$textCol`"))))
      .toDF(idCol, "__bpe_pos", "word")
      .filter(length(col("word")) > 0)
    val mapSide = trained.select(col("word"),
      col("symbols").as("__bpe_toks"))
    words.join(mapSide, Seq("word"), "left")
      .withColumn("__bpe_toks",
        coalesce(col("__bpe_toks"), charSymbols(col("word"))))
      .groupBy(col(s"`$idCol`"))
      .agg(flatten(transform(
        array_sort(collect_list(struct(col("__bpe_pos"),
          col("__bpe_toks")))),
        e => e.getField("__bpe_toks"))).as("bpe_tokens"))
      .withColumn("n_bpe_tokens", size(col("bpe_tokens")).cast("long"))
  }

  /** Decode a BPE token stream back to text (X186, round 11 — the
    * inverse closing the X56/X69 loop): subword pieces concatenate,
    * the `</w>` end-of-word markers become word boundaries, words
    * join with single spaces. By CONSTRUCTION
    * `decodeTokens(encode(text)) == the whitespace-normalized
    * lowercase text` for ANY merge table — every word's pieces
    * concatenate to the word and every word ends in exactly one
    * marker — so the round-trip is a structural identity a pipeline
    * can assert cheaply after re-tokenizing (q276 pins it corpus-wide
    * at both SFs). Caveat shared with the original formulation: a
    * word containing the literal marker string would collide; the
    * tokenizer's inputs (whitespace-split lowercase words) make that
    * a data-quality signal, not a decode bug.
    */
  def decodeTokens(tokens: Column): Column =
    array_join(
      filter(split(concat_ws("", tokens), "</w>"), w => w =!= ""),
      " ")
}
