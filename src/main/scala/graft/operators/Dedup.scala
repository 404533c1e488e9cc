package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines: exact
  * (hash-groupBy), MinHash+LSH and SimHash near-dedup, and exact n-gram
  * Jaccard verification.
  *
  * Scale discipline: candidate generation is ALWAYS bucketed — documents
  * meet only inside an LSH band bucket (a shuffle on the band key),
  * never via an all-pairs product. At 100 TB an all-pairs comparison is
  * not slow, it is impossible; the band-bucket join is linear in corpus
  * size + quadratic only within a bucket (bucket width is controlled by
  * the band/row parameters; pathological buckets can additionally be
  * capped or salted).
  */
object Dedup {

  /** Exact dedup: group rows by a key expression, keep ONE deterministic
    * representative per group (the row with the minimal `idCol`), carry
    * the group size as `dup_count`. Plain hash aggregation — partial
    * aggregation reduces map-side, the shuffle carries one candidate row
    * per (mapper, key).
    */
  def exactDedup(df: DataFrame, key: Column, idCol: String): DataFrame = {
    val payload = df.columns
    df.withColumn("__key", key)
      .groupBy(col("__key"))
      .agg(
        min_by(struct(payload.map(col): _*), col(idCol)).as("__rep"),
        count(lit(1)).as("dup_count"))
      .select(col("__rep.*"), col("dup_count"))
  }

  // -------------------------------------------------------------------
  // MinHash + LSH

  /** MinHash signature of a shingle set: element i is the minimum of the
    * i-seeded 64-bit hash over all shingles. Identical sets yield
    * identical signatures (guaranteed recall for exact duplicates);
    * element-wise collision probability equals Jaccard similarity.
    * NULL for rows with an empty shingle set (documents shorter than
    * the shingle width) — filter those upstream.
    */
  def minHashSignature(shingles: Column, numHashes: Int): Column =
    when(size(shingles) > 0,
      transform(sequence(lit(0), lit(numHashes - 1)),
        i => array_min(transform(shingles, s => xxhash64(i, s)))))

  /** LSH band keys: the signature is cut into `bands` runs of
    * `numHashes/bands` elements and each run is hashed to one bucket
    * key. Two documents are candidates iff they agree on at least one
    * full band — for Jaccard j the detection probability is
    * 1-(1-j^r)^b, a sharp threshold around (1/b)^(1/r).
    */
  def lshBandKeys(sig: Column, bands: Int, rowsPerBand: Int): Column =
    transform(sequence(lit(0), lit(bands - 1)),
      j => xxhash64(j, slice(sig, j * rowsPerBand + 1, lit(rowsPerBand))))

  /** Candidate pairs via the band-bucket self-join: explode (band,
    * bucket) keys, shuffle on them, pair up within buckets only, dedup
    * pairs that collide in several bands. `id_a < id_b` keeps each pair
    * once.
    */
  def lshCandidatePairs(df: DataFrame, idCol: String, shinglesCol: String,
      numHashes: Int = 64, bands: Int = 16): DataFrame = {
    val r = numHashes / bands
    require(bands * r == numHashes, "bands must divide numHashes")
    val sig = minHashSignature(col(shinglesCol), numHashes)
    val buckets = df
      .filter(size(col(shinglesCol)) > 0)
      .select(col(idCol), posexplode(lshBandKeys(sig, bands, r)))
      .toDF(idCol, "band", "bkey")
    val l = buckets.as("l")
    val rt = buckets.as("r")
    l.join(rt,
        col("l.band") === col("r.band") && col("l.bkey") === col("r.bkey") &&
          col(s"l.$idCol") < col(s"r.$idCol"))
      .select(col(s"l.$idCol").as("id_a"), col(s"r.$idCol").as("id_b"))
      .distinct()
  }

  /** Exact Jaccard verification of candidate pairs: join the shingle
    * sets back (two hash joins on the id), compute |A∩B| / |A∪B|.
    * Candidates are a tiny fraction of the corpus, so the exact pass is
    * cheap; correctness of the final answer never depends on the
    * probabilistic candidate step.
    */
  def jaccardVerify(docs: DataFrame, pairs: DataFrame, idCol: String,
      shinglesCol: String): DataFrame = {
    val a = docs.select(col(idCol).as("id_a"), col(shinglesCol).as("__sh_a"))
    val b = docs.select(col(idCol).as("id_b"), col(shinglesCol).as("__sh_b"))
    pairs.join(a, "id_a").join(b, "id_b")
      .withColumn("n_inter",
        size(array_intersect(col("__sh_a"), col("__sh_b"))).cast("long"))
      .withColumn("n_union",
        size(array_union(col("__sh_a"), col("__sh_b"))).cast("long"))
      .withColumn("jaccard",
        when(col("n_union") > 0,
          col("n_inter").cast("double") / col("n_union")).otherwise(lit(0.0)))
      .drop("__sh_a", "__sh_b")
  }

  /** End-to-end MinHash-LSH near-dedup: shingle → signature → band
    * buckets → candidate pairs → exact Jaccard ≥ threshold. Output is
    * exact (verified), the LSH only bounds the candidate set.
    */
  def nearDupPairs(df: DataFrame, idCol: String, textCol: String,
      shingleN: Int = 3, numHashes: Int = 64, bands: Int = 16,
      threshold: Double = 0.5): DataFrame = {
    import graft.functions.text
    val docs = df.select(col(idCol),
      text.ngrams(text.tokenize(col(textCol)), shingleN).as("__sh"))
    val cands = lshCandidatePairs(docs, idCol, "__sh", numHashes, bands)
    jaccardVerify(docs, cands, idCol, "__sh")
      .filter(col("jaccard") >= threshold)
  }

  // -------------------------------------------------------------------
  // SimHash

  /** 64-bit SimHash over the distinct tokens of a document: bit b is set
    * iff the sum over tokens of ±1 (sign of bit b of the token's hash)
    * is positive. Near-identical token sets differ in few bits, so
    * Hamming-window banding finds them.
    */
  def simHash(toks: Column): Column = {
    val th = transform(array_distinct(toks), t => xxhash64(t))
    val bitScores = transform(sequence(lit(0), lit(63)), b =>
      aggregate(th, lit(0L), (acc, h) =>
        acc + when(call_function("shiftright", h, b)
          .bitwiseAND(lit(1L)) === 1L, lit(1L)).otherwise(lit(-1L))))
    // pack via shift+or: the sign bit makes `acc * 2` overflow under
    // ANSI mode on the 64th doubling; bitwise ops wrap by definition
    aggregate(bitScores, lit(0L),
      (acc, s) => shiftleft(acc, 1)
        .bitwiseOR(when(s > 0, lit(1L)).otherwise(lit(0L))))
  }

  /** Cut a 64-bit SimHash into `bands` equal bit-slices (band keys).
    * Two documents whose SimHashes differ in fewer than `bands` bits
    * share at least one identical band (pigeonhole), so banding with b
    * bands GUARANTEES detection up to Hamming distance b-1.
    */
  def simHashBands(sh: Column, bands: Int): Column = {
    val width = 64 / bands
    require(bands * width == 64, "bands must divide 64")
    transform(sequence(lit(0), lit(bands - 1)), j =>
      call_function("shiftright", sh, j * width)
        .bitwiseAND(lit((1L << width) - 1)))
  }

  /** Hamming distance between two 64-bit fingerprints. */
  def hamming(a: Column, b: Column): Column =
    call_function("bit_count", a.bitwiseXOR(b)).cast("long")

  /** Candidate pairs from SimHash band buckets — same bucketed-join
    * shape as the MinHash path (never all-pairs).
    */
  def simHashCandidatePairs(df: DataFrame, idCol: String, toksCol: String,
      bands: Int = 8): DataFrame = {
    val buckets = df
      .select(col(idCol), simHash(col(toksCol)).as("__simhash"))
      .select(col(idCol), posexplode(simHashBands(col("__simhash"), bands)))
      .toDF(idCol, "band", "bkey")
    val l = buckets.as("l")
    val rt = buckets.as("r")
    l.join(rt,
        col("l.band") === col("r.band") && col("l.bkey") === col("r.bkey") &&
          col(s"l.$idCol") < col(s"r.$idCol"))
      .select(col(s"l.$idCol").as("id_a"), col(s"r.$idCol").as("id_b"))
      .distinct()
  }
}
