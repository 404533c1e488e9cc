package graft

import org.apache.spark.sql.functions._

import graft.functions.{text, url}
import graft.operators.{Mix, Pack, Select}

/** Round-8 second wave: bad-words filter (X95), URL canonicalization
  * (X96), curriculum shards (X97), dialect extreme-maps/delta/
  * runningAccumulate (X98), sequence-length histogram (X99).
  */
class Round8bSpec extends SparkSpec {
  import spark.implicits._

  test("badWordsFilter matches word boundaries, not substrings, " +
      "and honors the hit tolerance") {
    val docs = Seq(
      (1L, "the assassin passed the classic test"), // no whole-word hit
      (2L, "ass and more ass and yet more ass"),    // 3 hits
      (3L, "one ass only"),                         // 1 hit
      (4L, "Ass at the start, case-folded"))        // 1 hit (lowercased)
      .toDF("doc_id", "text")
    val kept = Select.badWordsFilter(docs, $"text",
        blocklist = Seq("ass"), maxHits = 1L)
      .select($"doc_id", $"bad_hits").as[(Long, Long)].collect().toMap
    assert(kept == Map(1L -> 0L, 3L -> 1L, 4L -> 1L))
  }

  test("badWordsFilter with maxHits=0 is the C4 kill switch") {
    val docs = Seq((1L, "clean text"), (2L, "has spam inside"))
      .toDF("doc_id", "text")
    val kept = Select.badWordsFilter(docs, $"text", Seq("spam"))
      .select($"doc_id").as[Long].collect().toSeq
    assert(kept == Seq(1L))
  }

  test("canonicalizeURL collapses every cosmetic variant to one key") {
    val variants = Seq(
      "https://www.Ex1.COM/p/3/?b=2&a=1&utm_source=feed#frag",
      "http://ex1.com:8080/p/3?a=1&b=2&fbclid=xyz",
      "EX1.com/p/3/?utm_campaign=x&b=2&a=1",
      "https://u:pw@ex1.com/p/3?b=2&a=1")
    val got = variants.toDF("u")
      .select(url.canonicalizeURL($"u")).as[String].collect().toSet
    assert(got == Set("ex1.com/p/3?a=1&b=2"))
  }

  test("canonicalizeURL edge shapes: no query, root path, empty input") {
    val got = Seq(
      "https://www.site.org/",           // root path, trailing slash
      "site.org",                        // bare host
      "site.org/a/b/?utm_x=1",           // all params tracking
      "")                                // empty in, empty out
      .toDF("u").select(url.canonicalizeURL($"u")).as[String]
      .collect().toSeq
    assert(got == Seq("site.org", "site.org", "site.org/a/b", ""))
  }

  test("curriculumShards: bands are score-ordered, same score lands " +
      "in one shard, sizes near-equal on distinct scores") {
    val df = (0L until 100L).map(i => (i, i % 50)).toDF("id", "s")
    // 100 docs over 50 distinct scores, 2 docs each -> 4 bands of
    // 26/24/26/24 (strictly-below ranks at whole-score granularity)
    val got = Mix.curriculumShards(df, "s", "id", numShards = 4)
    val stats = got.groupBy($"shard")
      .agg(count(lit(1)).as("n"), min($"s").as("lo"), max($"s").as("hi"))
      .orderBy($"shard")
      .as[(Long, Long, Long, Long)].collect()
    assert(stats.map(_._1).toSeq == Seq(0L, 1L, 2L, 3L))
    assert(stats.map(_._2).sum == 100L)
    assert(stats.forall(s => s._2 >= 24L && s._2 <= 26L))
    // ordered bands: shard k's max score below shard k+1's min
    stats.sliding(2).foreach { case Array(a, b) => assert(a._4 < b._3) }
    // same score -> same shard (score 10 appears twice)
    val shardOf10 = got.filter($"s" === 10).select($"shard")
      .as[Long].collect().toSet
    assert(shardOf10.size == 1)
  }

  test("curriculumShards: a massively popular score stays whole in " +
      "one shard (whole-score granularity)") {
    val df = ((0L until 90L).map(i => (i, 5L)) ++
      Seq((90L, 1L), (91L, 9L))).toDF("id", "s")
    val shards = Mix.curriculumShards(df, "s", "id", numShards = 3)
      .filter($"s" === 5).select($"shard").as[Long].collect().toSet
    assert(shards.size == 1)
  }

  test("lengthHistogram: exact power-of-two ceilings and pad-waste " +
      "arithmetic") {
    val df = Seq(0L, 1L, 2L, 3L, 4L, 5L, 127L, 128L, 129L)
      .toDF("toks")
    val got = Pack.lengthHistogram(df, "toks")
      .select($"len_bucket", $"docs", $"tokens", $"pad_waste")
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    // 0 clamps into bucket 1 but keeps its true token count 0
    assert(got(1L) == ((2L, 1L, 1L)))          // lens 0,1
    assert(got(2L) == ((1L, 2L, 0L)))          // len 2
    assert(got(4L) == ((2L, 7L, 1L)))          // lens 3,4
    assert(got(8L) == ((1L, 5L, 3L)))          // len 5
    assert(got(128L) == ((2L, 255L, 1L)))      // lens 127,128
    assert(got(256L) == ((1L, 129L, 127L)))    // len 129
  }

  test("deltaSumTimestamp sums positive ts-ordered deltas, ignoring " +
      "counter resets, via the dialect") {
    // ts order: 10,20,30,40 -> values 5, 3(reset), 8(+5), 9(+1) = 6
    val r = spark.sql("""
      SELECT deltaSumTimestamp(v, t) AS ds FROM VALUES
        (TIMESTAMP '2024-01-01 00:00:30', 8L),
        (TIMESTAMP '2024-01-01 00:00:10', 5L),
        (TIMESTAMP '2024-01-01 00:00:20', 3L),
        (TIMESTAMP '2024-01-01 00:00:40', 9L) AS t(t, v)
    """).as[Long].collect().head
    assert(r == 6L)
    // and the block-ordered CH spelling is a hard error, not silence
    val e = intercept[Exception](spark.sql("SELECT deltaSum(1)"))
    assert(e.getMessage.contains("deltaSumTimestamp"))
  }

  test("maxMap/minMap merge per key, including in-row collisions") {
    val r = spark.sql("""
      SELECT maxMap(k, v) AS mx, minMap(k, v) AS mn FROM VALUES
        (array('a', 'b', 'a'), array(1L, 5L, 9L)),
        (array('b', 'c'), array(2L, 7L)) AS t(k, v)
    """).collect().head
    val mx = r.getStruct(0)
    assert(mx.getSeq[String](0) == Seq("a", "b", "c"))
    assert(mx.getSeq[Long](1) == Seq(9L, 5L, 7L))
    val mn = r.getStruct(1)
    assert(mn.getSeq[String](0) == Seq("a", "b", "c"))
    assert(mn.getSeq[Long](1) == Seq(1L, 2L, 7L))
  }

  test("runningAccumulate(sumState(x)) OVER is the cumulative sum; " +
      "a bare column wraps in sum()") {
    val got = spark.sql("""
      SELECT d, runningAccumulate(sumState(c)) OVER (ORDER BY d
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS r1,
             runningAccumulate(c) OVER (ORDER BY d
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS r2
      FROM VALUES (1, 10L), (2, 20L), (3, 5L) AS t(d, c) ORDER BY d
    """).as[(Int, Long, Long)].collect().toSeq
    assert(got == Seq((1, 10L, 10L), (2, 30L, 30L), (3, 35L, 35L)))
  }
}
