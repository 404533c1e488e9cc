package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.Relational._

/** Unit coverage for the relational combinators (SURVEY.md §2.4/§2.6 ⚠
  * rows): WITH TOTALS incl. HAVING over the totals row, LIMIT offset,
  * Murmur3 hash sampling, collapsing compaction both ways.
  */
class RelationalSpec extends SparkSpec {
  import spark.implicits._

  private lazy val sales = Seq(
    ("a", 10L), ("a", 20L), ("b", 5L), ("b", -40L), ("c", 1L))
    .toDF("k", "v")

  test("withTotals: groups plus ONE grand-total row with null key") {
    val got = withTotals(sales, Seq("k"), Seq(sum($"v").as("s")))
      .as[(Option[String], Long)].collect().toMap
    assert(got == Map(Some("a") -> 30L, Some("b") -> -35L, Some("c") -> 1L,
      None -> -4L))
  }

  test("withTotals: HAVING applies to the totals row too (CH default)") {
    val got = withTotals(sales, Seq("k"), Seq(sum($"v").as("s")))
      .filter($"s" >= 0)
      .as[(Option[String], Long)].collect().toMap
    // b (-35) and the grand total (-4) both fail the HAVING
    assert(got == Map(Some("a") -> 30L, Some("c") -> 1L))
  }

  test("limitOffset: offset skips in sorted order; offset 0 is plain limit") {
    val df = (1 to 20).toDF("x").orderBy($"x")
    assert(limitOffset(df, 5, 3).as[Int].collect().toSeq == Seq(6, 7, 8))
    assert(limitOffset(df, 0, 2).as[Int].collect().toSeq == Seq(1, 2))
  }

  test("sampleByHash (Murmur3 default): deterministic, correct membership") {
    val df = (1L to 1000L).toDF("id")
    val s1 = sampleByHash(df, $"id", 10).as[Long].collect().toSet
    val s2 = sampleByHash(df, $"id", 10).as[Long].collect().toSet
    assert(s1 == s2) // pure function of the key → repeatable
    assert(s1.nonEmpty && s1.size < 1000) // nontrivial subset
    // membership is exactly the hash predicate
    val expect = df.filter(pmod(hash($"id"), lit(10)) === 0)
      .as[Long].collect().toSet
    assert(s1 == expect)
  }

  private lazy val versioned = Seq(
    // id 1: v1 replaced by v2 (cancel pair), v2 live
    (1L, 1L, 1, "v1-state"), (1L, 1L, -1, "v1-cancel"), (1L, 2L, 1, "v2-state"),
    // id 2: single live version
    (2L, 1L, 1, "only"),
    // id 3: fully canceled → no live row
    (3L, 1L, 1, "gone"), (3L, 1L, -1, "gone-cancel"))
    .toDF("id", "ver", "sign", "tag")

  test("saltedJoin: identical rows to the plain join; salt spreads a hot key") {
    import org.apache.spark.sql.functions._
    val fact = spark.range(0, 1000)
      .select((col("id") % 3).as("k"), col("id").as("line"))
    val dim = Seq((0L, "a"), (1L, "b"), (2L, "c"), (9L, "unmatched"))
      .toDF("dk", "name")
    val plain = fact.join(dim, col("k") === col("dk"))
      .select(col("k"), col("line"), col("name"))
      .as[(Long, Long, String)].collect().sorted.toSeq
    val salted = saltedJoin(fact, dim, "k", "dk",
        spreadBy = col("line"), saltN = 8)
      .select(col("k"), col("line"), col("name"))
      .as[(Long, Long, String)].collect().sorted.toSeq
    assert(salted == plain)
    // the hot key's rows really do carry several distinct salts
    val salts = fact.filter(col("k") === 0)
      .select(pmod(hash(col("line")), lit(8))).distinct().count()
    assert(salts > 4)
  }

  test("latestVersions: cancel pairs drop, highest live version wins") {
    val got = latestVersions(versioned, Seq("id"), "ver", "sign")
      .select($"id", $"ver", $"tag").as[(Long, Long, String)]
      .collect().toSet
    assert(got == Set((1L, 2L, "v2-state"), (2L, 1L, "only")))
  }

  test("latestByKey (max_by aggregation) ≡ row_number window compaction") {
    val df = Seq(
      (1L, 10L, "a"), (1L, 30L, "b"), (1L, 20L, "c"),
      (2L, 5L, "d"), (3L, 1L, "e"), (3L, 1L, "f"))
      .toDF("k", "ts", "payload").withColumn("uid", monotonically_increasing_id())
    val agg = latestByKey(df, Seq("k"), Seq("ts", "uid"))
      .select($"k", $"ts", $"payload").as[(Long, Long, String)].collect().toSet
    val w = Window.partitionBy($"k").orderBy($"ts".desc, $"uid".desc)
    val win = df.withColumn("rn", row_number().over(w)).filter($"rn" === 1)
      .select($"k", $"ts", $"payload").as[(Long, Long, String)].collect().toSet
    assert(agg == win)
    assert(agg.map(_._1) == Set(1L, 2L, 3L))
  }

  test("asofJoin picks the prevailing right row per key; ties match") {
    val trades = Seq((1L, 100L, "t1"), (1L, 205L, "t2"), (2L, 50L, "t3"),
      (3L, 10L, "t4")).toDF("k", "t", "tag")
    val quotes = Seq((1L, 100L, 1.0), (1L, 200L, 2.0), (1L, 300L, 3.0),
      (2L, 49L, 9.0)).toDF("k", "qt", "px")
    // chunkWidth 64 puts t=100 and t=205 in DIFFERENT chunks from their
    // prevailing quotes' neighbours, exercising the carry path alongside
    // the within-chunk path
    val got = asofJoin(trades, quotes, Seq("k"), "t", "qt", Seq("px"),
        chunkWidth = 64)
      .select($"k", $"t", $"tag", $"px")
      .as[(Long, Long, String, Option[Double])].collect().toSet
    assert(got == Set(
      (1L, 100L, "t1", Some(1.0)), // tie: right at the same instant
      (1L, 205L, "t2", Some(2.0)), // not yet 300; 200 carried from chunk 3
      (2L, 50L, "t3", Some(9.0)),
      (3L, 10L, "t4", None))) // key with no right rows
    // a NULL right time must never become the prevailing match
    val badQuotes = Seq((3L, Option.empty[Long], 7.0),
      (3L, Some(20L), 8.0)).toDF("k", "qt", "px")
    val g2 = asofJoin(trades.filter($"k" === 3), badQuotes, Seq("k"),
      "t", "qt", Seq("px"), chunkWidth = 64)
      .select($"tag", $"px").as[(String, Option[Double])].collect().toSet
    assert(g2 == Set(("t4", None))) // t=10 < 20; null-time row ignored
  }

  test("asofJoin: chunked two-pass equals the single-chunk form") {
    // dense per-key histories where most chunks contain NO right row
    // (carry must skip over empty chunks) and some contain several; a
    // NULL key batch proves the carry fix-up join is null-safe like
    // the window partitioning
    val left = ((0 until 400).map(i =>
        (Some((i % 3).toLong), (i * 7L) % 997, s"e$i")) ++
      (0 until 20).map(i => (Option.empty[Long], i * 31L, s"n$i")))
      .toDF("k", "t", "tag")
    val right = ((0 until 40).map(i =>
        (Some((i % 3).toLong), (i * 53L) % 991, i)) ++
      Seq((Option.empty[Long], 100L, 777)))
      .toDF("k", "rt", "rv")
    for (width <- Seq(1L, 10L, 128L, 100000L)) {
      val chunked = asofJoin(left, right, Seq("k"), "t", "rt", Seq("rv"),
          chunkWidth = width)
        .select($"k", $"t", $"tag", $"rv")
        .as[(Option[Long], Long, String, Option[Int])].collect().toSet
      val single = asofJoin(left, right, Seq("k"), "t", "rt", Seq("rv"))
        .select($"k", $"t", $"tag", $"rv")
        .as[(Option[Long], Long, String, Option[Int])].collect().toSet
      assert(chunked == single, s"chunkWidth=$width")
    }
    // and the NULL key really matches its own right row (t >= 100)
    val nulls = asofJoin(left.filter($"k".isNull), right, Seq("k"),
        "t", "rt", Seq("rv"), chunkWidth = 64)
      .filter($"t" >= 100 && $"rv" === 777)
    assert(nulls.count() == left.filter($"k".isNull && $"t" >= 100).count())
  }

  test("topKFreq: k most frequent per group, two-stage (never one task per key)") {
    val df = (0 until 300).map(i => (i % 2, i % (3 + i % 2)))
      .toDF("g", "v")
    val got = topKFreq(df, Seq("g"), "v", 2)
      .orderBy($"g").as[(Int, Seq[Int])].collect().toSeq
    // g=0: values 0,1,2 of v uniform-ish — compute expected exactly
    val expect = (0 to 1).map { g =>
      val counts = (0 until 300).filter(_ % 2 == g).groupBy(i => i % (3 + g))
        .view.mapValues(_.size).toSeq
      (g, counts.sortBy { case (v, c) => (-c, v) }.take(2).map(_._1))
    }
    assert(got == expect)
    // scale shape: the rank limit must run map-side (Partial) before
    // the shuffle, so the exchange carries ≤ k rows per (key, mapper)
    val plan = topKFreq(df, Seq("g"), "v", 2)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit") && plan.contains("Partial"),
      plan)
  }

  test("anyLeftJoin: one deterministic right match per left row") {
    val left = Seq((1, "a"), (2, "b"), (3, "c")).toDF("k", "tag")
    val right = Seq((1, 5, "r15"), (1, 2, "r12"), (2, 9, "r29"))
      .toDF("rk", "ord", "payload")
    val got = anyLeftJoin(left, right, "k", "rk", Seq("ord"))
      .select($"k", $"tag", $"payload")
      .as[(Int, String, Option[String])].collect().toSet
    assert(got == Set((1, "a", Some("r12")), (2, "b", Some("r29")),
      (3, "c", None)))
    // both sides sharing the key NAME must not be ambiguous
    val sameName = anyLeftJoin(left, right.withColumnRenamed("rk", "k"),
        "k", "k", Seq("ord"))
      .select($"tag", $"payload")
      .as[(String, Option[String])].collect().toSet
    assert(sameName == Set(("a", Some("r12")), ("b", Some("r29")),
      ("c", None)))
  }

  test("rangeJoinBinned equals the naive inequality join") {
    val pts = Seq((1L, "p1"), (15L, "p2"), (25L, "p3"), (99L, "p4"))
      .toDF("p", "tag")
    val ivs = Seq((0L, 10L, "a"), (5L, 30L, "b"), (90L, 95L, "c"))
      .toDF("lo", "hi", "label")
    val got = rangeJoinBinned(pts, "p", ivs, "lo", "hi", binWidth = 8)
      .select($"tag", $"label").as[(String, String)].collect().toSet
    val naive = pts.join(ivs, $"lo" <= $"p" && $"p" <= $"hi")
      .select($"tag", $"label").as[(String, String)].collect().toSet
    assert(got == naive)
    assert(got == Set(("p1", "a"), ("p2", "b"), ("p3", "b")))
    // no pair is emitted twice even when an interval spans many bins
    val wide = rangeJoinBinned(pts, "p", ivs, "lo", "hi", binWidth = 2)
      .select($"tag", $"label").as[(String, String)].collect()
    assert(wide.length == wide.distinct.length)
    // epoch-NANO magnitudes (> 2^53, where double division mis-bins):
    // a boundary point one ns inside the interval must still match
    val base = 1700000000000000000L // ~2^60.6
    val npts = Seq((base + 999999999L, "n1"), (base + 1000000000L, "n2"))
      .toDF("p", "tag")
    val nivs = Seq((base, base + 999999999L, "w1")).toDF("lo", "hi", "label")
    val ngot = rangeJoinBinned(npts, "p", nivs, "lo", "hi",
        binWidth = 1000000000L)
      .select($"tag", $"label").as[(String, String)].collect().toSet
    assert(ngot == Set(("n1", "w1"))) // n2 is 1 ns past hi
  }

  test("limitBy keeps the first n per key under the stated order") {
    val df = spark.range(0, 20)
      .select(($"id" % 3).as("k"), $"id".as("v"))
    val got = limitBy(df, Seq("k"), 2, Seq($"v".desc))
      .as[(Long, Long)].collect().toSet
    assert(got == Set((0L, 18L), (0L, 15L), (1L, 19L), (1L, 16L),
      (2L, 17L), (2L, 14L)))
  }

  test("scd2Join picks the validity window containing the fact date") {
    val dim = Seq(
      ("x", "era1", "2024-01-01", "2024-01-15"),
      ("x", "era2", "2024-01-16", "2024-12-31"))
      .toDF("k", "descr", "f", "t")
      .select($"k", $"descr", $"f".cast("date").as("f"), $"t".cast("date").as("t"))
    val fact = Seq(("x", "2024-01-10"), ("x", "2024-02-01"))
      .toDF("k", "d").select($"k", $"d".cast("date").as("d"))
    val got = scd2Join(fact, dim, fact("k") === dim("k"), fact("d"),
      dim("f"), dim("t")).select($"d".cast("string"), $"descr")
      .as[(String, String)].collect().toSet
    assert(got == Set(("2024-01-10", "era1"), ("2024-02-01", "era2")))
  }
}
