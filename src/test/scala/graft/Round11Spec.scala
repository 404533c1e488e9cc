package graft

import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** Round-11 pins:
  *
  *  - mutualKnnGraph's candidate-pairs parameter (verdict ask #2):
  *    the candidate route must reproduce the exact graph when the
  *    candidates cover all pairs, find every planted-cluster edge
  *    through IVF candidates, and plan WITHOUT any all-pairs product.
  *  - The bucketed Metrica hot path (ask #7): q91's and q113's FINAL
  *    collapse must read HashPartitioning from the bucketed warehouse
  *    scan — no Exchange hash-partitions on the collapse key.
  *  - QUALIFY's out-of-contract shape (ask #6) raises the dialect's
  *    own message, not Spark's grammar error.
  */
class Round11Spec extends SparkSpec {
  import spark.implicits._

  // ---- mutualKnnGraph: candidate-pairs parameter ----

  /** 3 planted clusters x 4 members on well-separated axes: member
    * vectors are the cluster axis plus a tiny distinct per-member
    * bump, so every mutual-kNN edge is intra-cluster by construction.
    */
  private def plantedVecs = {
    val rows = for {
      c <- 0 until 3
      m <- 0 until 4
    } yield {
      val id = (c * 4 + m).toLong
      val v = Array.fill(6)(0.0f)
      v(c * 2) = 1.0f
      v(c * 2 + 1) = 0.01f * (m + 1)
      (id, v.toSeq)
    }
    rows.toDF("vec_id", "embedding")
  }

  test("mutualKnnGraph: all-pairs candidates reproduce the exact " +
      "graph cell-for-cell") {
    val vecs = plantedVecs
    val exact = Similarity.mutualKnnGraph(vecs, "vec_id", "embedding",
      k = 2).orderBy("i", "j").collect()
    val ids = vecs.select(col("vec_id"))
    val all = ids.select(col("vec_id").as("i"))
      .crossJoin(ids.select(col("vec_id").as("j")))
      .where(col("i") =!= col("j"))
    val routed = Similarity.mutualKnnGraph(vecs, "vec_id", "embedding",
        k = 2, candidates = Some(all))
      .orderBy("i", "j").collect()
    assert(exact.toSeq == routed.toSeq)
    assert(exact.nonEmpty)
  }

  test("mutualKnnGraph: IVF candidates recover every planted-cluster " +
      "edge (recall 1.0 on separated clusters) and plan with no " +
      "all-pairs product") {
    val vecs = plantedVecs
    // one centroid per cluster axis — the planted ideal (the
    // data-adaptive quantizer is recall-asserted in SimilaritySpec)
    val cents: Array[(Long, Seq[Double])] = Array(
      (0L, Seq(1.0, 0.0, 0.0, 0.0, 0.0, 0.0)),
      (1L, Seq(0.0, 0.0, 1.0, 0.0, 0.0, 0.0)),
      (2L, Seq(0.0, 0.0, 0.0, 0.0, 1.0, 0.0)))
    val cand = Similarity.knnCandidatesIvf(vecs, "vec_id", "embedding",
      cents, nprobe = 1)
    val ivf = Similarity.mutualKnnGraph(vecs, "vec_id", "embedding",
      k = 2, candidates = Some(cand))
    val exact = Similarity.mutualKnnGraph(vecs, "vec_id", "embedding",
      k = 2)
    val ivfEdges = ivf.select("i", "j").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exactEdges = exact.select("i", "j").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // separated clusters: the exact graph is intra-cluster, and
    // nprobe=1 IVF probes exactly the home cluster -> full recall
    assert(exactEdges.nonEmpty)
    assert(ivfEdges == exactEdges,
      s"ivf=$ivfEdges exact=$exactEdges")
    val plan = ivf.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan.take(800))
    assert(!plan.contains("BroadcastNestedLoop"), plan.take(800))
  }

  // ---- bucketed Metrica hot path: Exchange-free FINAL collapse ----

  test("q91: the FINAL collapse window reads the bucketed warehouse " +
      "with no Exchange on the collapse key") {
    val df = graft.queries.DialectQueries.q91ChFinalSql
      .fn(spark, "/root/testdata/sf0.001")
    assert(df.collect().nonEmpty)
    val plan = df.queryExecution.executedPlan.toString
    // the window partitions on eid; with the bucketed scan providing
    // HashPartitioning(eid, 32) no Exchange may re-partition on it
    // (the aggregate/order exchanges partition on event_type)
    assert(plan.contains("Window"), plan.take(1200))
    assert(!plan.contains("hashpartitioning(eid"), plan.take(2000))
  }

  test("q113: the scaled goals FINAL collapse reads the bucketed " +
      "visits warehouse with no Exchange on VisitID") {
    val df = graft.queries.MetricaQueries.q113GoalsFinalScaled
      .fn(spark, "/root/testdata/sf0.001")
    assert(df.collect().nonEmpty)
    val plan = df.queryExecution.executedPlan.toString
    // distinct-agg exchanges partition on (gprice, VisitID) — only a
    // LEADING VisitID hash (the collapse window's shape) is banned
    assert(!plan.contains("hashpartitioning(VisitID"), plan.take(2000))
  }

  // ---- QUALIFY contract error ----

  test("QUALIFY in a subquery raises the dialect contract error " +
      "naming the supported shape") {
    spark.range(10).selectExpr("id", "id % 3 AS g")
      .createOrReplaceTempView("r11_qualify")
    val e = intercept[IllegalArgumentException] {
      spark.sql("""SELECT * FROM (
        SELECT id, row_number() OVER (PARTITION BY g ORDER BY id) AS rn
        FROM r11_qualify QUALIFY rn = 1) t""")
    }
    assert(e.getMessage.contains("QUALIFY is supported at the top level"),
      e.getMessage)
  }

  // ---- X174: round-11 dialect fill #3 ----

  test("dialect fill #3: bin / morton / angle / base64 / quote / json " +
      "hand-checked") {
    val r = spark.sql("""
      SELECT bin(5) AS b5, bin(-1) AS bm1,
             mortonEncode(3, 1) AS me,
             mortonDecode(2, mortonEncode(1023, 77)).a AS mda,
             mortonDecode(2, mortonEncode(1023, 77)).b AS mdb,
             round(greatCircleAngle(0.0D, 0.0D, 90.0D, 0.0D), 6) AS gca,
             tryBase64Decode('aGk=') AS tb_ok,
             tryBase64Decode('!!!') AS tb_bad,
             tryBase64Decode('aGk') AS tb_nopad,
             regexpQuoteMeta('a.b*c') AS rqm,
             simpleJSONExtractRaw('{"k": 42, "s": "x"}', 'k') AS sj_num,
             simpleJSONExtractRaw('{"k": 42, "s": "x\\"y"}', 's') AS sj_str,
             simpleJSONExtractRaw('{"k": 1}', 'zz') AS sj_miss,
             multiSearchAnyCaseInsensitive('Hello World',
               array('WORL', 'zz')) AS msa1,
             multiSearchAnyCaseInsensitive('Hello', array('zz')) AS msa0
      """).head()
    // bin: full-width two's complement
    assert(r.getAs[String]("b5") ===
      "0" * 61 + "101")
    assert(r.getAs[String]("bm1") === "1" * 64)
    // mortonEncode(3, 1): a bits 0,1 -> positions 0,2; b bit 0 -> 1
    assert(r.getAs[Long]("me") === 7L)
    // roundtrip at the 10-bit corners
    assert(r.getAs[Long]("mda") === 1023L)
    assert(r.getAs[Long]("mdb") === 77L)
    // quarter great circle = 90 degrees exactly
    assert(math.abs(r.getAs[Double]("gca") - 90.0) < 1e-6)
    assert(r.getAs[String]("tb_ok") === "hi")
    assert(r.getAs[String]("tb_bad") === "")
    // unpadded input is malformed under the strict RFC contract
    assert(r.getAs[String]("tb_nopad") === "")
    assert(r.getAs[String]("rqm") === "a\\.b\\*c")
    assert(r.getAs[String]("sj_num") === "42")
    // RAW keeps the quotes and the escape
    assert(r.getAs[String]("sj_str") === "\"x\\\"y\"")
    assert(r.getAs[String]("sj_miss") === "")
    assert(r.getAs[Long]("msa1") === 1L)
    assert(r.getAs[Long]("msa0") === 0L)
  }

  test("mortonEncode z-values preserve 2-D locality order within a " +
      "quadrant (the file-skipping premise)") {
    // within one power-of-two quadrant the z-value range of the
    // quadrant is contiguous: all cells of quadrant (a<4, b<4) sort
    // before any cell of (a>=4, b>=4)
    val df = spark.sql("""
      SELECT a, b, mortonEncode(a, b) AS z FROM
      (SELECT explode(sequence(CAST(0 AS BIGINT), 7)) AS a) CROSS JOIN
      (SELECT explode(sequence(CAST(0 AS BIGINT), 7)) AS b)""")
    val rows = df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val lowQuad = rows.filter { case (a, b, _) => a < 4 && b < 4 }.map(_._3)
    val highQuad = rows.filter { case (a, b, _) => a >= 4 && b >= 4 }.map(_._3)
    assert(lowQuad.max < highQuad.min)
    // and z is a bijection on the 8x8 grid
    assert(rows.map(_._3).distinct.length === 64)
  }

  test("QUALIFY at depth 0 still rewrites (the contract check must " +
      "not catch the supported shape)") {
    spark.range(10).selectExpr("id", "id % 3 AS g")
      .createOrReplaceTempView("r11_qualify0")
    val r = spark.sql("""
      SELECT id, row_number() OVER (PARTITION BY g ORDER BY id) AS rn
      FROM r11_qualify0 QUALIFY rn = 1 ORDER BY id""").collect()
    assert(r.map(_.getLong(0)).toSeq == Seq(0L, 1L, 2L))
  }
}
