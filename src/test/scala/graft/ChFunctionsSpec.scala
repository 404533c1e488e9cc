package graft

import org.apache.spark.sql.functions._

import graft.functions.ch._

/** Unit coverage for the ClickHouse-compat function library
  * (SURVEY.md §2.7 ⚠ semantics: 1-based access with default-on-miss,
  * indexOf null handling, notEmpty on NULL, toMonday).
  */
class ChFunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("chElementAt: hit, index 0, out of range, null-safe default") {
    val df = Seq((Seq("a", "b", "c"), 2), (Seq("a"), 0), (Seq("a"), 9))
      .toDF("arr", "i")
    val got = df.select(chElementAt($"arr", $"i", lit("MISS"))).as[String]
      .collect().toSeq
    assert(got == Seq("b", "MISS", "MISS"))
  }

  test("indexOf: 1-based, 0 when absent, 0 for NULL search value") {
    val df = Seq(
      (Seq("x", "y"), Some("y")),
      (Seq("x", "y"), Some("z")),
      (Seq("x", "y"), None))
      .toDF("arr", "v")
    val got = df.select(indexOf($"arr", $"v")).as[Long].collect().toSeq
    assert(got == Seq(2L, 0L, 0L))
  }

  test("notEmpty: 1 for non-empty, 0 for empty AND for NULL") {
    val df = Seq(Some("hi"), Some(""), None).toDF("s")
    assert(df.select(notEmpty($"s")).as[Long].collect().toSeq == Seq(1L, 0L, 0L))
  }

  test("toMonday matches ClickHouse week starts") {
    val df = Seq("2023-11-01", "2023-11-06", "2023-11-12", "2024-01-01")
      .toDF("d").select(toMonday($"d".cast("date")).cast("string"))
    assert(df.as[String].collect().toSeq ==
      Seq("2023-10-30", "2023-11-06", "2023-11-06", "2024-01-01"))
  }

  test("sumArray over long and double arrays; empty array sums to zero") {
    val df = Seq((Seq(1L, 2L, 3L), Seq(0.5, 0.25)), (Seq.empty[Long], Seq.empty[Double]))
      .toDF("l", "d")
    val got = df.select(sumArrayLong($"l"), sumArrayDouble($"d"))
      .as[(Long, Double)].collect().toSeq
    assert(got == Seq((6L, 0.75), (0L, 0.0)))
  }

  test("isFinite flags NaN and infinities, true for ordinary values") {
    val df = Seq(1.5, Double.NaN, Double.PositiveInfinity, Double.NegativeInfinity)
      .toDF("x")
    assert(df.select(isFiniteCol($"x")).as[Boolean].collect().toSeq ==
      Seq(true, false, false, false))
  }

  test("chIf and toInt64 compose like CH if/toInt64") {
    val df = Seq(3, 7).toDF("x")
    assert(df.select(chIf($"x" > 5, lit("big"), lit("small"))).as[String]
      .collect().toSeq == Seq("small", "big"))
    assert(df.select(toInt64($"x")).schema.head.dataType.typeName == "long")
  }

  test("uniqExact is exact distinct; uniq approximates") {
    val df = (1 to 100).map(i => i % 7).toDF("k")
    assert(df.select(uniqExact($"k")).as[Long].head() == 7L)
    val approx = df.select(uniq($"k")).as[Long].head()
    assert(approx >= 6L && approx <= 8L)
  }

  test("uniq stays inside its documented band on the events corpus") {
    // the q53 contract, corpus-wide: HLL++ at the default 5% target rsd
    // must land within ±10% of uniqExact on real key distributions —
    // overall and per event_type group
    val ev = Graft.table(spark, "/root/testdata/sf0.001", "events")
    val rows = ev.groupBy($"event_type")
      .agg(uniqExact($"user_id").as("exact"), uniq($"user_id").as("approx"))
      .unionByName(ev.groupBy(lit("__all").as("event_type"))
        .agg(uniqExact($"user_id").as("exact"), uniq($"user_id").as("approx")))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val exact = r.getAs[Long]("exact")
      val approx = r.getAs[Long]("approx")
      assert(math.abs(approx - exact) <= 0.1 * exact,
        s"uniq out of band for ${r.get(0)}: exact=$exact approx=$approx")
    }
  }

  test("arrayZip / arrayDifference / splitByString") {
    val r = spark.sql("""
      SELECT arrayDifference(array(1L, 4L, 9L, 2L)) AS d,
             arrayZip(array(1, 2), array('a', 'b')) AS z,
             splitByString('::', 'a::b::c') AS sp,
             arrayDifference(CAST(array() AS ARRAY<BIGINT>)) AS empty""")
      .collect().head
    assert(r.getSeq[Long](0) == Seq(0L, 3L, 5L, -7L))
    assert(r.getSeq[org.apache.spark.sql.Row](1).map(x =>
      (x.getInt(0), x.getString(1))) == Seq((1, "a"), (2, "b")))
    assert(r.getSeq[String](2) == Seq("a", "b", "c"))
    assert(r.getSeq[Long](3).isEmpty)
  }

  test("multiIf: n-way conditional with CH argument order") {
    val rows = spark.sql("""
      SELECT multiIf(id < 2, 'low', id < 4, 'mid', 'high') AS b
      FROM range(6) ORDER BY id""").collect().map(_.getString(0)).toSeq
    assert(rows == Seq("low", "low", "mid", "mid", "high", "high"))
    val err = intercept[Exception](
      spark.sql("SELECT multiIf(true, 1)").collect())
    assert(err.getMessage.contains("pairs"))
  }
}
