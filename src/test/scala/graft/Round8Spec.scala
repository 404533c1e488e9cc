package graft

import org.apache.spark.sql.functions._

import graft.functions.text
import graft.operators.{Dedup, Retrieval}

/** Round-8 operators: paragraph dedup (X84), quality-aware survivors
  * (X85), TF-IDF keywords (X86), contamination fraction (X87), charset
  * noise (X88).
  */
class Round8Spec extends SparkSpec {
  import spark.implicits._

  test("dedupParagraphs: first writer keeps, later docs drop, " +
      "unique paragraphs untouched") {
    val docs = Seq(
      (1L, "own intro\n\nshared quote here\n\ntail one"),
      (2L, "different intro\n\nshared quote here\n\ntail two"),
      (3L, "third intro\n\nall unique\n\ntail three"))
      .toDF("doc_id", "text")
    val byId = Dedup.dedupParagraphs(docs, "doc_id", "text")
      .select($"doc_id", $"text", $"paras_removed")
      .as[(Long, String, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(byId(1L) == (("own intro\n\nshared quote here\n\ntail one", 0L)))
    assert(byId(2L) == (("different intro\n\ntail two", 1L)))
    assert(byId(3L) == (("third intro\n\nall unique\n\ntail three", 0L)))
  }

  test("dedupParagraphs: a doc repeating a shared paragraph internally " +
      "drops every occurrence when it is not the owner") {
    val docs = Seq(
      (1L, "quote\n\nbody a"),
      (2L, "quote\n\nmiddle\n\nquote"))
      .toDF("doc_id", "text")
    val got = Dedup.dedupParagraphs(docs, "doc_id", "text")
      .select($"doc_id", $"text", $"paras_removed")
      .as[(Long, String, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got(1L) == (("quote\n\nbody a", 0L)))
    assert(got(2L) == (("middle", 2L)))
  }

  test("qualitySurvivors picks the highest-quality member, " +
      "ties to the smaller id") {
    // quality is driven by length saturation: 40 tokens beats 20.
    val long = ("tok " * 40).trim
    val short = ("tok " * 20).trim
    val docs = Seq(
      (10L, short), (11L, long),              // cluster A: 11 wins
      (20L, long), (21L, long),               // cluster B: tie -> 20
      (30L, "unrelated text entirely alone")) // singleton: no row
      .toDF("doc_id", "text")
    val pairs = Seq((10L, 11L), (20L, 21L)).toDF("id_a", "id_b")
    val got = Dedup.qualitySurvivors(docs, pairs, "id_a", "id_b",
        "doc_id", text.qualityScore($"text"))
      .select($"cluster_id", $"survivor_id", $"n_members")
      .as[(Long, Long, Long)].collect().toSet
    assert(got == Set((10L, 11L, 2L), (20L, 20L, 2L)))
  }

  test("tfidfTopTerms ranks distinctive terms above ubiquitous ones") {
    val docs = Seq(
      (1L, "common zebra zebra zebra"),
      (2L, "common common yak"),
      (3L, "common llama llama"))
      .toDF("doc_id", "text")
    val got = Retrieval.tfidfTopTerms(docs, "doc_id", "text", k = 1)
      .select($"doc_id", $"term").as[(Long, String)].collect().toMap
    assert(got == Map(1L -> "zebra", 2L -> "yak", 3L -> "llama"))
    // 'common' appears in every doc: idf = ln(1) = 0, so it can never
    // outrank a distinctive term with positive idf
    val all = Retrieval.tfidfTopTerms(docs, "doc_id", "text", k = 10)
      .filter($"term" === "common").select($"tfidf")
      .as[Double].collect()
    assert(all.forall(_ == 0.0))
  }

  test("contaminationFraction: fraction = shared / bench distinct " +
      "n-grams") {
    val corpus = Seq(
      (1L, "a b c d e f"), // shares all 4 of bench's 3-grams
      (2L, "a b c x y z")) // shares exactly 1
      .toDF("doc_id", "text")
    val bench = Seq((100L, "a b c d e f")).toDF("doc_id", "text")
    val got = Dedup.contaminationFraction(corpus, bench, "doc_id",
        "text", shingleN = 3)
      .select($"contaminated_id", $"n_shared", $"n_bench",
        $"overlap_frac")
      .as[(Long, Long, Long, Double)].collect().toSet
    assert(got == Set((1L, 4L, 4L, 1.0), (2L, 1L, 4L, 0.25)))
  }

  test("nearDupGateBatch drops verified near-dups of indexed docs, " +
      "keeps novel and sub-threshold docs") {
    val existing = Seq(
      (2L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"))
      .toDF("doc_id", "text")
    val index = Dedup.buildNearDupIndex(existing, "doc_id", "text")
    val batch = Seq(
      // near-identical to doc 2 (one token changed): dropped
      (3L, "alpha beta gamma delta epsilon zeta eta theta iota lambda"),
      // identical to doc 2: dropped
      (5L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      // unrelated: survives
      (7L, "one two three four five six seven eight nine ten"),
      // too short for any shingle: survives by construction
      (9L, "hi"))
      .toDF("doc_id", "text")
    val kept = Dedup.nearDupGateBatch(batch, index, "doc_id", "text")
      .select($"doc_id").as[Long].collect().toSet
    assert(kept == Set(7L, 9L))
  }

  test("nearDupGateBatch: LSH collision without exact-Jaccard match " +
      "cannot drop a doc") {
    // same first 3 tokens (shared shingle -> possible band collision
    // at 1-row bands), but J = 1/13 far below 0.5
    val existing = Seq(
      (2L, "a b c p q r s t u v w")).toDF("doc_id", "text")
    val index = Dedup.buildNearDupIndex(existing, "doc_id", "text",
      numHashes = 16, bands = 16)
    val batch = Seq(
      (3L, "a b c x y z k l m n o")).toDF("doc_id", "text")
    val kept = Dedup.nearDupGateBatch(batch, index, "doc_id", "text",
        numHashes = 16, bands = 16)
      .select($"doc_id").as[Long].collect().toSet
    assert(kept == Set(3L))
  }

  test("hostReputationFilter drops blocklisted and low-quality hosts, " +
      "keeps the rest with a host column") {
    import graft.operators.Select
    val good = ("the of and to in is a " * 20).trim // high quality
    val bad = "x@#$%" // low quality
    val docs = (1L to 12L).map(i =>
        (i, s"https://www.good.example.com/p/$i", good)) ++
      (21L to 32L).map(i =>
        (i, s"https://spam.example.com/p/$i", bad)) ++
      Seq((41L, "https://blocked.example.com/p/41", good)) ++
      // below minDocs: low quality but too few docs to judge
      Seq((51L, "https://tiny.example.com/p/51", bad))
    val df = docs.toDF("doc_id", "url", "text")
    val kept = Select.hostReputationFilter(df, $"url",
        text.qualityScore($"text"),
        blocklist = Seq("blocked.example.com"),
        minDocs = 10, minMeanQFp = 530000L)
      .select($"host", $"doc_id").as[(String, Long)].collect()
    val hosts = kept.map(_._1).toSet
    assert(hosts == Set("good.example.com", "tiny.example.com"))
    assert(kept.count(_._1 == "good.example.com") == 12)
  }

  test("sourceOverlap pools distinct shingles per source and reports " +
      "exact intersection/union/Jaccard") {
    val docs = Seq(
      (1L, "x", "a b c d"),  // shingles {a b c, b c d}
      (2L, "x", "a b c"),    // duplicate shingle pools away
      (3L, "y", "b c d e"),  // {b c d, c d e}
      (4L, "z", "p q r s"))  // {p q r, q r s} — disjoint from x/y
      .toDF("doc_id", "source", "text")
    val got = Dedup.sourceOverlap(docs, "source", "text")
      .select($"src_a", $"src_b", $"n_inter", $"n_union", $"jaccard")
      .as[(String, String, Long, Long, Double)].collect().toSet
    assert(got == Set(("x", "y", 1L, 3L, 0.333333)))
  }

  test("labelCentroidCosines: orthogonal and diagonal centroids give " +
      "cos 0 and 1/sqrt(2)") {
    import graft.operators.Similarity
    val vecs = Seq(
      (0, Seq(1f, 0f)), (0, Seq(1f, 0f)),
      (1, Seq(0f, 1f)),
      (2, Seq(1f, 1f)))
      .toDF("label", "embedding")
    val got = Similarity.labelCentroidCosines(vecs, "label", "embedding")
      .select($"label_a", $"label_b", $"cos")
      .as[(Int, Int, Double)].collect()
      .map { case (a, b, c) => (a, b) -> c }.toMap
    assert(got((0, 1)) == 0.0)
    assert(got((0, 2)) == 0.707107)
    assert(got((1, 2)) == 0.707107)
  }

  test("charset noise: replacement chars, control chars and accents " +
      "score as designed") {
    val rows = Seq(
      (1L, "clean plain ascii text"),
      (2L, "lossy �� transcode �"),
      (3L, "ctl" + "\u0001" + "inside"),
      (4L, "café résumé")) // legit accents: tiny score
      .toDF("id", "t")
    val got = rows.select($"id",
        text.replacementCharCount($"t").as("r"),
        text.controlCharRatio($"t").as("c"),
        text.nonAsciiRatio($"t").as("n"),
        text.charsetNoiseScore($"t").as("s"))
      .as[(Long, Long, Double, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    assert(got(1L)._2 == 0L && got(1L)._5 == 0.0)
    assert(got(2L)._2 == 3L && got(2L)._5 > 0.3)
    assert(got(3L)._3 > 0.0 && got(3L)._5 > 0.2)
    // accents alone: only the 0.1-weighted non-ascii term fires
    assert(got(4L)._2 == 0L && got(4L)._3 == 0.0 && got(4L)._5 <= 0.1)
  }
}
