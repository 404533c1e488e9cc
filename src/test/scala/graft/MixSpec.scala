package graft

import org.apache.spark.sql.functions._

import graft.operators.Mix

/** Data-mixing operators: stratified quota sampling (two-pass,
  * threshold + exact trim) and temperature-scaled mixture weights.
  */
class MixSpec extends SparkSpec {
  import spark.implicits._

  private def corpus = (0L until 3000L).map { i =>
    val lang = i % 3 match {
      case 0 => "en"; case 1 => "de"; case _ => "fr"
    }
    (i, lang)
  }.toDF("doc_id", "lang")

  test("stratifiedSample: exact quota per stratum, deterministic") {
    val s1 = Mix.stratifiedSample(corpus, "lang", "doc_id", quota = 50)
    val counts = s1.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts == Map("en" -> 50L, "de" -> 50L, "fr" -> 50L))
    // deterministic: a second draw picks the identical ids
    val ids1 = s1.select("doc_id").collect().map(_.getLong(0)).toSet
    val ids2 = Mix.stratifiedSample(corpus, "lang", "doc_id", quota = 50)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids1 == ids2)
    // nested like SAMPLE: the 20-quota draw is a subset of the 50
    val small = Mix.stratifiedSample(corpus, "lang", "doc_id", quota = 20)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(small.subsetOf(ids1))
  }

  test("a stratum smaller than the quota keeps all its rows") {
    val tiny = Seq((1L, "en"), (2L, "en"), (3L, "rare"))
      .toDF("doc_id", "lang")
    val out = Mix.stratifiedSample(tiny, "lang", "doc_id", quota = 10)
    assert(out.count() == 3)
  }

  test("the threshold filter really prunes before the window") {
    // 1000 en docs, quota 10: survivors of the map-side filter must be
    // ~13, far below the stratum size — the scale property
    val en = (0L until 1000L).map((_, "en")).toDF("doc_id", "lang")
    val quota = 10
    val thr = (4294967296L * 1.3 * quota / 1000).toLong + 1
    val survivors = en
      .withColumn("h", Mix.portableHash(col("doc_id")))
      .filter(col("h") < thr).count()
    assert(survivors >= quota && survivors < 60,
      s"survivors $survivors out of expected ~13")
    assert(Mix.stratifiedSample(en, "lang", "doc_id", quota).count()
      == quota)
  }

  test("quota holds even when ids collapse to one hash value") {
    // ids k*65536 + 7: the portable hash sees only the low 16 bits,
    // so EVERY row hashes identically — the threshold filter keeps
    // all-or-nothing and the verified fallback must still deliver the
    // exact quota
    val collapsed = (0L until 500L).map(k => (k * 65536L + 7L, "en"))
      .toDF("doc_id", "lang")
    val out = Mix.stratifiedSample(collapsed, "lang", "doc_id", quota = 25)
    assert(out.count() == 25)
    // deterministic tie-break by id: the 25 smallest ids
    val ids = out.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids == (0L until 25L).map(_ * 65536L + 7L).toSet)
  }

  test("null strata survive the fallback path (null-safe membership)") {
    // the 'en' stratum collapses to one hash value and under-fills the
    // threshold -> fallback fires; the null stratum must keep its rows
    // (3VL isin would silently drop them from the kept side)
    val rows = (0L until 500L).map(k => (k * 65536L + 7L, Some("en"))) ++
      (5000L until 5030L).map(i => (i, None: Option[String]))
    val df = rows.toDF("doc_id", "lang")
    val out = Mix.stratifiedSample(df, "lang", "doc_id", quota = 25)
    val byLang = out.groupBy("lang").count().collect()
      .map(r => Option(r.getString(0)) -> r.getLong(1)).toMap
    assert(byLang == Map(Some("en") -> 25L, None -> 25L))
  }

  test("too many strata fail loudly") {
    val wide = (0L until 500L).map(i => (i, s"s$i")).toDF("doc_id", "lang")
    val err = intercept[IllegalArgumentException](
      Mix.stratifiedSample(wide, "lang", "doc_id", 1, maxStrata = 100))
    assert(err.getMessage.contains("strata"))
  }

  test("mixtureWeights: alpha dial between proportional and uniform") {
    val m = Seq(("en", 900L), ("de", 90L), ("fr", 10L))
      .toDF("lang", "n_tok")
    def weights(alpha: Double): Map[String, Double] =
      Mix.mixtureWeights(m, "lang", "n_tok", alpha).collect()
        .map(r => r.getString(0) -> r.getDouble(2)).toMap
    val w1 = weights(1.0)
    assert(math.abs(w1("en") - 0.9) < 1e-6)
    val w0 = weights(0.0) // uniform
    assert(w0.values.forall(v => math.abs(v - 1.0 / 3) < 1e-5))
    val wh = weights(0.5) // in between: en dampened, fr boosted
    assert(wh("en") < w1("en") && wh("fr") > w1("fr"))
    // weights sum to 1 at any alpha
    assert(math.abs(weights(0.7).values.sum - 1.0) < 1e-5)
  }

  test("epochPlan: upsampling and downsampling regimes by hand") {
    val m = Seq(("a", 100L), ("b", 400L)).toDF("src", "n_tok")
    def plan(alpha: Double, budget: Long): Map[String, (Long, Double, Double)] =
      Mix.epochPlan(m, "src", "n_tok", alpha, budget).collect()
        .map(r => r.getString(0) ->
          ((r.getLong(3), r.getDouble(4), r.getDouble(5)))).toMap
    // proportional weights (0.2 / 0.8), budget below the corpus:
    // every source downsamples at its share
    val down = plan(1.0, 250)
    assert(down("a") == ((50L, 0.5, 0.5)))
    assert(down("b") == ((200L, 0.5, 0.5)))
    // uniform weights, budget above the corpus: the small source
    // upsamples 5x, the big one 1.25x — sample_rate saturates at 1
    val up = plan(0.0, 1000)
    assert(up("a") == ((500L, 5.0, 1.0)))
    assert(up("b") == ((500L, 1.25, 1.0)))
  }

  test("materializeEpoch: full epochs, fractional draw, then nothing") {
    // stratum a: epochs 2.5 — epochs 0,1 full, epoch 2 a half-rate
    // hash draw, epoch 3 empty. Plan rows are hand-built so the
    // fixture controls E exactly.
    val rows = (0L until 16L).map(i => (i, "a")) :+ ((100L, "b"))
    val df = rows.toDF("id", "src")
    val plan = Seq(("a", 2.5), ("b", 0.0)).toDF("src", "epochs")
    def ids(epoch: Int): Set[Long] =
      Mix.materializeEpoch(df, "src", "id", plan, epoch)
        .select($"id").as[Long].collect().toSet
    val all = (0L until 16L).toSet
    assert(ids(0) == all && ids(1) == all)
    val drawn = ids(2)
    // the draw is the deterministic hash rule, replayable by hand
    val expect = all.filter(i =>
      ((i % 65536L) * 2654435761L) % 4294967296L < (0.5 * 4294967296L).toLong)
    assert(drawn == expect)
    assert(drawn.nonEmpty && drawn.size < 16) // genuinely fractional
    assert(ids(3).isEmpty)
    // stratum b (epochs 0): never selected, any epoch
    assert(!(0 to 3).exists(e => ids(e).contains(100L)))
  }

  test("assignSplits: total, disjoint, deterministic, hash-replayable") {
    val df = (0L until 2000L).toDF("doc_id")
    val sp = Mix.assignSplits(df, "doc_id",
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1), seed = 42L)
    val byId = sp.select($"doc_id", $"split").as[(Long, String)]
      .collect().toMap
    // every row assigned exactly one split (projection: row count kept)
    assert(byId.size == 2000)
    // the assignment IS the arithmetic rule, replayable by hand
    val b1 = math.round(0.8 * 4294967296.0)
    val b2 = math.round((0.8 + 0.1) * 4294967296.0)
    byId.foreach { case (id, split) =>
      val h = (((id + 42) % 65536) * 2654435761L) % 4294967296L
      val want = if (h < b1) "train" else if (h < b2) "val" else "test"
      assert(split == want, s"id $id: $split != $want")
    }
    // fractions roughly respected (hash uniformity, loose band)
    val n = sp.groupBy($"split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(n("train") > 1400 && n("val") > 100 && n("test") > 100)
    // re-running re-derives the identical held-out set
    val again = Mix.assignSplits(df, "doc_id",
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1), seed = 42L)
      .select($"doc_id", $"split").as[(Long, String)].collect().toMap
    assert(again == byId)
    // a different seed is a different permutation
    val other = Mix.assignSplits(df, "doc_id",
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1), seed = 43L)
      .select($"doc_id", $"split").as[(Long, String)].collect().toMap
    assert(other != byId)
    // invalid fraction sets fail loudly
    intercept[IllegalArgumentException] {
      Mix.assignSplits(df, "doc_id", Seq("a" -> 0.5, "b" -> 0.4))
    }
    intercept[IllegalArgumentException] {
      Mix.assignSplits(df, "doc_id", Seq("a" -> 0.5, "a" -> 0.5))
    }
  }

  test("shardShuffle: bounded shards, seeded deterministic order") {
    val df = (0L until 500L).toDF("doc_id")
    val sh = Mix.shardShuffle(df, "doc_id", numShards = 4, seed = 7L)
      .select($"doc_id", $"shard", $"pos").as[(Long, Long, Long)]
      .collect()
    assert(sh.length == 500)
    assert(sh.forall { case (_, s, p) => s >= 0 && s < 4 &&
      s == p % 4 })
    // pos is the seeded portable hash — injective below 2^16 ids, so
    // the within-shard order is total and replayable
    sh.foreach { case (id, _, p) =>
      assert(p == (((id + 7) % 65536) * 2654435761L) % 4294967296L)
    }
    assert(sh.map(_._3).distinct.length == 500)
    // the order is NOT id order (it is a genuine permutation)
    val shard0 = sh.filter(_._2 == 0).sortBy(t => (t._3, t._1)).map(_._1)
    assert(shard0.length > 50 && !(shard0 sameElements shard0.sorted))
  }

  test("epochPlan: a zero-mass stratum pins to zero, never NaN") {
    // alpha = 0 gives the empty stratum uniform weight (pow(0,0)=1)
    // and a nonzero target — the raw division would be Infinity, and
    // least(1.0, NaN/Inf) would claim full-rate sampling of nothing
    val m = Seq(("a", 0L), ("b", 100L)).toDF("src", "n_tok")
    val rows = Mix.epochPlan(m, "src", "n_tok", alpha = 0.0, budget = 100)
      .collect().map(r => r.getString(0) ->
        ((r.getAs[Long]("target_tokens"), r.getAs[Double]("epochs"),
          r.getAs[Double]("sample_rate")))).toMap
    assert(rows("a")._2 == 0.0 && rows("a")._3 == 0.0)
    assert(rows("b") == ((50L, 0.5, 0.5)))
  }
}
