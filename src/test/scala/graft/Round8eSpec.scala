package graft

import scala.collection.mutable.ArrayBuffer

import graft.plans.RankTestAgg

/** Round-8 sixth wave: the rank-test family (X116 —
  * mannWhitneyUTest / kolmogorovSmirnovTest / rankCorr over exact
  * integer rank arithmetic) and the regression family (X117 —
  * simpleLinearRegression / corrStable over exact decimal moment
  * sums).
  */
class Round8eSpec extends SparkSpec {
  import spark.implicits._

  private def pairs(rows: (Long, Long)*): ArrayBuffer[(Long, Long)] =
    ArrayBuffer(rows: _*)

  test("mannWhitneyU matches the hand-computed mid-rank U statistic") {
    // sample0 = {1,2,3}, sample1 = {2,3,4}; combined mid-ranks:
    // 1, 2.5, 2.5, 4.5, 4.5, 6 → R1 = 8 → U1 = 8 − 3·4/2 = 2
    val u = RankTestAgg.mannWhitneyU(pairs(
      (1, 0), (2, 0), (3, 0), (2, 1), (3, 1), (4, 1)))
    assert(u == 2.0)
  }

  test("mannWhitneyU without ties: all-smaller sample has U = 0, " +
      "all-larger has U = n1·n2") {
    val lo = RankTestAgg.mannWhitneyU(pairs(
      (1, 0), (2, 0), (10, 1), (11, 1), (12, 1)))
    assert(lo == 0.0)
    val hi = RankTestAgg.mannWhitneyU(pairs(
      (10, 0), (11, 0), (1, 1), (2, 1), (3, 1)))
    assert(hi == 6.0)
  }

  test("ksD: stepped CDFs evaluated after full tied runs") {
    // s0 = {1,2,3}, s1 = {3,4}: dnum over support {1,2,3,4} is
    // max(|2·1−0|, |2·2−0|, |2·3−3·1|, |2·3−3·2|) = 4 → D = 4/6
    val d = RankTestAgg.ksD(pairs((1, 0), (2, 0), (3, 0), (3, 1), (4, 1)))
    assert(d == 4.0 / 6.0)
  }

  test("ksD: identical samples give D = 0; disjoint give D = 1") {
    val same = RankTestAgg.ksD(pairs((1, 0), (2, 0), (1, 1), (2, 1)))
    assert(same == 0.0)
    val disj = RankTestAgg.ksD(pairs((1, 0), (2, 0), (10, 1), (11, 1)))
    assert(disj == 1.0)
  }

  test("rankCorr: monotone pairs give +1, antitone give −1, and a " +
      "constant side gives NULL") {
    assert(RankTestAgg.rankCorr(pairs((1, 10), (2, 20), (3, 40))) == 1.0)
    assert(RankTestAgg.rankCorr(pairs((1, 40), (2, 20), (3, 10))) == -1.0)
    assert(RankTestAgg.rankCorr(pairs((1, 5), (2, 5), (3, 5))) == null)
  }

  test("rankCorr handles ties via mid-ranks (Pearson on 2×mid-ranks)") {
    // x = (1,1,2), y = (1,2,2): 2rx = (3,3,6), 2ry = (2,5,5)
    // cov2 = 3·51 − 12·12 = 9; vx2 = 3·54 − 144 = 18; vy2 = 3·54 − 144 = 18
    // ρ = 9/18 = 0.5
    val r = RankTestAgg.rankCorr(pairs((1, 1), (1, 2), (2, 2)))
    assert(r == 0.5)
  }

  test("rank tests run as SQL aggregates through the dialect registry") {
    Seq((1L, 0L, 10L), (2L, 0L, 20L), (3L, 0L, 30L),
      (2L, 1L, 25L), (3L, 1L, 35L), (4L, 1L, 45L))
      .toDF("x", "idx", "y").createOrReplaceTempView("rank_t")
    val row = spark.sql("""
      SELECT mannWhitneyUTest(x, idx) AS u,
             kolmogorovSmirnovTest(x, idx) AS d,
             rankCorr(x, y) AS rho
      FROM rank_t""").head()
    assert(row.getDouble(0) == 2.0)
    // support {1,2,3,4}: max|n2·c1 − n1·c2| = |3·1 − 3·0| = 3 → 3/9
    assert(row.getDouble(1) == 3.0 / 9.0)
    // x has tied runs (2,2) and (3,3) against distinct y: 2rx =
    // (2,5,5,9,9,12), 2ry = (2,4,6,8,10,12) → cov2 = 396, vx2 = 396,
    // vy2 = 420
    assert(row.getDouble(2) == 396.0 / math.sqrt(396.0 * 420.0))
  }

  test("simpleLinearRegression recovers an exact line and corrStable " +
      "gives ±1 on it") {
    Seq((0L, 1L), (1L, 3L), (2L, 5L), (3L, 7L)).toDF("x", "y")
      .createOrReplaceTempView("reg_t")
    val row = spark.sql("""
      SELECT r.k AS k, r.b AS b, c
      FROM (SELECT simpleLinearRegression(x, y) AS r,
                   corrStable(x, y) AS c FROM reg_t)""").head()
    assert(row.getDouble(0) == 2.0)
    assert(row.getDouble(1) == 1.0)
    assert(row.getDouble(2) == 1.0)
  }

  test("simpleLinearRegression: vertical/degenerate x gives NULL slope; " +
      "corrStable NULL on a constant side") {
    Seq((5L, 1L), (5L, 9L)).toDF("x", "y")
      .createOrReplaceTempView("reg_v")
    val row = spark.sql("""
      SELECT r.k AS k, c
      FROM (SELECT simpleLinearRegression(x, y) AS r,
                   corrStable(x, y) AS c FROM reg_v)""").head()
    assert(row.isNullAt(0))
    assert(row.isNullAt(1))
  }

  test("corrStable matches Spark's builtin corr to float tolerance " +
      "on integer data (exact vs running accumulation)") {
    val df = Seq((1L, 7L), (4L, 2L), (9L, 11L), (16L, 3L), (25L, 19L))
      .toDF("x", "y")
    df.createOrReplaceTempView("corr_t")
    val Array(stable, builtin) = spark.sql(
      "SELECT corrStable(x, y), corr(x, y) FROM corr_t")
      .head().toSeq.map(_.asInstanceOf[Double]).toArray
    assert(math.abs(stable - builtin) < 1e-12)
  }

  test("LTTB keeps first/last, picks one point per bucket, and each " +
      "middle pick maximizes the triangle vs prev point and next " +
      "centroid (the greedy definition, verified independently)") {
    import graft.plans.LttbAgg
    val pts = Array.tabulate(97)(i =>
      (i.toLong, ((i * 37) % 23 - 11).toLong)).sorted
    val n = 10
    val sel = LttbAgg.select(pts, n)
    assert(sel.length == n)
    assert(sel.head == pts.head && sel.last == pts.last)
    val N = pts.length
    val nb = n - 2
    for (i <- 0 until nb) {
      val lo = (1 + i.toLong * (N - 2) / nb).toInt
      val hi = (1 + (i + 1).toLong * (N - 2) / nb).toInt
      assert(lo <= pts.indexOf(sel(i + 1)) && pts.indexOf(sel(i + 1)) < hi,
        s"pick ${i + 1} outside its bucket")
      // independent exact-area argmax re-check
      val (nlo, nhi) = if (i == nb - 1) (N - 1, N)
        else (hi, (1 + (i + 2).toLong * (N - 2) / nb).toInt)
      val c = BigInt(nhi - nlo)
      val sx = (nlo until nhi).map(j => BigInt(pts(j)._1)).sum
      val sy = (nlo until nhi).map(j => BigInt(pts(j)._2)).sum
      val (px, py) = sel(i)
      def area(p: (Long, Long)): BigInt =
        ((BigInt(px) * c - sx) * (BigInt(p._2) - py) -
          (BigInt(px) - p._1) * (sy - BigInt(py) * c)).abs
      val maxArea = (lo until hi).map(j => area(pts(j))).max
      assert(area(sel(i + 1)) == maxArea,
        s"pick ${i + 1} is not the bucket's max-area point")
    }
  }

  test("LTTB returns all points when the series is already short, and " +
      "runs as SQL through the parameterized form") {
    import graft.plans.LttbAgg
    val pts = Array.tabulate(5)(i => (i.toLong, (i * i).toLong))
    assert(LttbAgg.select(pts, 8).toSeq == pts.toSeq)
    Seq((0L, 0L), (1L, 9L), (2L, 1L), (3L, 7L), (4L, 3L), (5L, 8L),
      (6L, 2L), (7L, 5L))
      .toDF("x", "y").createOrReplaceTempView("lttb_t")
    val got = spark.sql("""
      SELECT concat_ws('|', transform(
        largestTriangleThreeBuckets(4)(x, y),
        p -> concat(p.x, ':', p.y))) AS s
      FROM lttb_t""").as[String].head()
    // buckets of indices [1..6] in 2: {1,2,3}, {4,5,6}. Step 1 vs
    // prev (0,0) and next-bucket sums (c=3, Σx=15, Σy=13): areas
    // |13x − 15y| = 122/11/66 → (1,9). Step 2 vs prev (1,9) and last
    // point (7,5): |58 − 4x − 6y| = 24/10/22 → (4,3).
    assert(got == "0:0|1:9|4:3|7:5")
  }

  test("rank tests and LTTB survive the SHUFFLE path: a repartitioned " +
      "frame (forced partial aggregation + serde) equals the " +
      "single-partition result") {
    val df = spark.range(0, 500).selectExpr(
      "id % 4 AS g", "(id * 13) % 97 AS x", "id % 2 AS idx",
      "((id * 13) % 97) * 3 + id % 23 AS y")
    def run(d: org.apache.spark.sql.DataFrame) = d
      .createOrReplaceTempView("serde_t")
    run(df.coalesce(1))
    val one = spark.sql("""
      SELECT g, mannWhitneyUTest(x, idx) AS u,
             kolmogorovSmirnovTest(x, idx) AS d,
             rankCorr(x, y) AS r,
             concat_ws('|', transform(
               largestTriangleThreeBuckets(6)(x, y),
               p -> concat(p.x, ':', p.y))) AS l
      FROM serde_t GROUP BY g ORDER BY g""").collect().toSeq
    run(df.repartition(16))
    val many = spark.sql("""
      SELECT g, mannWhitneyUTest(x, idx) AS u,
             kolmogorovSmirnovTest(x, idx) AS d,
             rankCorr(x, y) AS r,
             concat_ws('|', transform(
               largestTriangleThreeBuckets(6)(x, y),
               p -> concat(p.x, ':', p.y))) AS l
      FROM serde_t GROUP BY g ORDER BY g""").collect().toSeq
    assert(one == many)
  }

  test("mannWhitneyU partials merge associatively (map-side combine)") {
    val all = pairs((1, 0), (2, 0), (3, 0), (2, 1), (3, 1), (4, 1))
    val agg = RankTestAgg(null, null, "mannWhitneyUTest")
    val b1 = pairs((1, 0), (2, 1))
    val b2 = pairs((2, 0), (3, 0), (3, 1), (4, 1))
    val merged = agg.merge(b1, b2)
    assert(RankTestAgg.mannWhitneyU(merged) ==
      RankTestAgg.mannWhitneyU(all))
  }
}
