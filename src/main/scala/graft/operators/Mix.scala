package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Data-mixing operators for training-corpus curation: per-stratum
  * quota sampling and mixture-weight computation.
  *
  * The naive quota sample — `row_number() OVER (PARTITION BY stratum
  * ORDER BY hash)` then `rank <= quota` — shuffles the WHOLE corpus
  * into |strata| window partitions; with 5 languages at 100 TB that is
  * five 20 TB partitions through five tasks. [[stratifiedSample]] is
  * the two-pass form that scales: a tiny count aggregate sizes a
  * per-stratum hash THRESHOLD (quota/count of the 32-bit hash space,
  * with 30% headroom), the threshold filters map-side at the scan, and
  * only the ~1.3x-quota survivors enter the exact window trim. The
  * window sees O(|strata| x quota) rows, not the corpus.
  *
  * The hash is the engine-portable multiplicative hash the SAMPLE
  * clause already uses (Knuth 2654435761 on the id's low 16 bits) —
  * deterministic and replayable in any SQL engine, so a mixture drawn
  * here is reproducible anywhere.
  */
object Mix {

  /** The portable 32-bit-space hash (same family as `ChSample`'s
    * portable mode).
    */
  def portableHash(id: Column): Column =
    pmod(pmod(id, lit(65536L)) * lit(2654435761L), lit(4294967296L))

  /** Seeded variant: the seed folds into the id BEFORE the low-16
    * reduction, so each seed induces an independent deterministic
    * ordering of the same ids while staying replayable in any SQL
    * engine as `((id + seed) % 65536 * 2654435761) % 2^32`. Like
    * [[portableHash]], the map is injective for ids whose low 16 bits
    * are distinct (the multiplier is odd, so multiplication mod 2^32
    * is a bijection); ids congruent mod 65536 collide, which is why
    * every consumer breaks ties on the id itself.
    */
  def portableHashSeeded(id: Column, seed: Long): Column =
    pmod(pmod(id + lit(seed), lit(65536L)) * lit(2654435761L),
      lit(4294967296L))

  /** Deterministic quota sample per stratum: exactly
    * `min(quota, |stratum|)` rows each, chosen by portable-hash order
    * (ties broken by id). The per-stratum counts are collected to the
    * driver — strata are categorical (languages, sources), bounded by
    * the same contract as dictionaries, and guarded by `maxStrata`.
    */
  /** `checkpoint = false` skips the pass-1 localCheckpoint (which
    * keeps the corpus single-scan in production but truncates the
    * inspectable plan) — for plan audits and tests only.
    */
  def stratifiedSample(df: DataFrame, stratumCol: String, idCol: String,
      quota: Int, maxStrata: Int = 100000,
      checkpoint: Boolean = true): DataFrame = {
    require(quota > 0, "stratifiedSample: quota > 0")
    val stratum = col(s"`$stratumCol`")
    val id = col(s"`$idCol`")
    val counts = df.groupBy(stratum).count()
      .limit(maxStrata + 1).collect()
    require(counts.length <= maxStrata,
      s"stratifiedSample: more than $maxStrata strata — a continuous " +
        "stratum column? Bucket it first.")
    // threshold = share of the 32-bit hash space expected to yield
    // quota + 4·√quota + 8 rows — a ≥4-sigma binomial headroom, so the
    // verified-fallback redo (a full extra scan of the shortfall
    // strata) is a near-impossibility instead of a ~13%-per-stratum
    // event at small quotas (round 11: with quota 15 over ~140-row
    // clusters the old flat 1.3x headroom undershot ~1 stratum in 8,
    // and the redo pass dominated the cluster-balance entry). The
    // threshold only shapes the CANDIDATE superset — the window trims
    // to the same lowest-hash rows under any sufficient threshold, so
    // output is invariant. Full space when the stratum is small.
    val expected = counts.map(r => (r.get(0), math.min(quota.toLong,
      r.getLong(1)))).toMap
    val thresholds = counts.map { r =>
      val n = r.getLong(1)
      val want = quota + 4.0 * math.sqrt(quota.toDouble) + 8.0
      val t =
        if (n <= quota) 4294967296L
        else math.min(4294967296L,
          (4294967296L * math.min(1.0, want / n)).toLong + 1)
      (r.get(0), t)
    }
    // thresholds ride a BROADCAST join, never a when-chain: a
    // |strata|-deep CaseWhen is O(|strata|) per scanned row and
    // overflows the analyzer's stack thousands of strata before the
    // maxStrata guard
    val spark = df.sparkSession
    val thrDf = spark.createDataFrame(
      spark.sparkContext.parallelize(thresholds.toSeq.map {
        case (k, t) => org.apache.spark.sql.Row(k, t)
      }, 1),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("__mix_stratum",
          df.schema(stratumCol).dataType),
        org.apache.spark.sql.types.StructField("__mix_thr",
          org.apache.spark.sql.types.LongType))))
    val w = Window.partitionBy(stratum)
      .orderBy(col("__mix_h"), id)
    def draw(frame: DataFrame, thr: Column): DataFrame =
      frame.filter(col("__mix_h") < thr)
        .withColumn("__mix_rk", row_number().over(w))
        .filter(col("__mix_rk") <= quota)
    val hashed = df.withColumn("__mix_h", portableHash(id))
      .join(broadcast(thrDf), stratum <=> col("__mix_stratum"))
    // pass 1: map-side threshold filter, window over ~1.3x-quota
    // survivors. The headroom is probabilistic AND the portable hash
    // keys on the id's low 16 bits (correlated ids can collapse to
    // one hash value), so the quota contract is VERIFIED: strata the
    // threshold under-filled re-draw over their full hash space.
    val pass1 = draw(hashed, col("__mix_thr"))
    // cache the SMALL pass-1 result (≤ strata x 1.3-quota rows): the
    // verification count below must not trigger a second corpus scan
    val first = if (checkpoint) pass1.localCheckpoint() else pass1
    val got = first.groupBy(stratum).count().collect()
      .map(r => (r.get(0), r.getLong(1))).toMap
    val short = expected.filter { case (k, want) =>
      got.getOrElse(k, 0L) < want
    }.keys.toSeq
    val sampled =
      if (short.isEmpty) first
      else {
        // pathological strata only: the naive full-stratum window —
        // correctness over the fast path, and only where needed.
        // Membership is NULL-SAFE (<=>, like the threshold join): a
        // 3VL isin would silently drop null-stratum rows from the
        // kept side — or, with null itself short, empty it entirely
        val isShort = short.map(k => stratum <=> lit(k)).reduce(_ || _)
        val redo = draw(hashed.filter(isShort), lit(4294967296L))
        first.filter(!isShort).unionByName(redo)
      }
    sampled.drop("__mix_h", "__mix_rk", "__mix_stratum", "__mix_thr")
  }

  /** Temperature-scaled mixture weights per stratum:
    * `w_s = m_s^alpha / sum(m^alpha)` over a measure column (token
    * counts, usually). alpha=1 is proportional sampling, alpha->0
    * approaches uniform — the standard multilingual-mixing dial.
    * Output: (stratum, measure, weight).
    */
  def mixtureWeights(df: DataFrame, stratumCol: String,
      measureCol: String, alpha: Double): DataFrame = {
    val stratum = col(s"`$stratumCol`")
    val m = df.groupBy(stratum)
      .agg(sum(col(s"`$measureCol`")).cast("long").as("measure"))
    m.withColumn("__pow", pow(col("measure").cast("double"), lit(alpha)))
      .withColumn("weight",
        round(col("__pow") / sum(col("__pow")).over(Window.partitionBy()),
          6))
      .drop("__pow")
  }

  /** The epoch plan that turns [[mixtureWeights]] into an executable
    * mixture: given a total token `budget`, each stratum's target
    * token share is `weight * budget`, its `epochs` is how many times
    * its corpus repeats to deliver that share (> 1 means upsampling,
    * the multilingual-rebalancing reality), and `sample_rate` is the
    * per-epoch inclusion rate (1.0 while upsampling; the fractional
    * remainder rate on the last pass is `epochs - floor(epochs)`).
    * All arithmetic over the per-stratum aggregate — the result is
    * strata-sized, the corpus is scanned once by [[mixtureWeights]],
    * and the empty-window total sum is over STRATA (bounded), never
    * rows. Ratios round to 6 decimals for cross-engine exactness.
    */
  def epochPlan(df: DataFrame, stratumCol: String, measureCol: String,
      alpha: Double, budget: Long): DataFrame = {
    require(budget >= 0, "epochPlan: budget must be >= 0")
    // a zero-mass stratum has nothing to repeat or sample: epochs and
    // sample_rate pin to 0 explicitly — the raw division would give
    // NaN (alpha > 0) or Infinity (alpha = 0, where pow(0,0) = 1
    // assigns it uniform weight), and least(1.0, NaN) = 1.0 would
    // claim full-rate sampling of an empty corpus
    val ratio = when(col("measure") === 0, lit(0.0))
      .otherwise(col("target_tokens").cast("double") / col("measure"))
    mixtureWeights(df, stratumCol, measureCol, alpha)
      .withColumn("target_tokens",
        round(col("weight") * budget).cast("long"))
      .withColumn("epochs", round(ratio, 6))
      .withColumn("sample_rate", round(least(lit(1.0), ratio), 6))
  }

  /** Materialize ONE epoch of the [[epochPlan]]: the rows of `df` the
    * plan selects for 0-based `epoch`. A stratum repeating E times
    * contributes its FULL corpus to epochs 0 .. ⌊E⌋−1 and a
    * deterministic portable-hash draw at rate E − ⌊E⌋ to epoch ⌊E⌋;
    * later epochs contribute nothing (a downsampled stratum, E < 1,
    * only ever draws on epoch 0). The plan rides a broadcast join
    * (strata-sized) and selection is a map-side filter — an epoch
    * materializes without shuffling the corpus, so the training loop
    * can stream epoch after epoch off the same scan.
    *
    * Determinism contract: the draw thresholds on the plan's ROUNDED
    * `epochs` column (6 decimals) and [[portableHash]], so any engine
    * replaying the plan selects the identical id set.
    */
  /** Deterministic train/validation/test split assignment: each row's
    * seeded portable hash lands in one of the cumulative-fraction
    * intervals of the 32-bit hash space, and the matching split name
    * lands in `splitCol`. A pure projection — no shuffle, no state, no
    * sampling pass — so split assignment composes with any scan at any
    * scale, and re-running it (any engine, any partitioning, any time)
    * re-derives the identical assignment: the property that keeps
    * held-out sets held out across pipeline re-builds.
    *
    * Boundaries are `round(cumFraction * 2^32)` with the LAST split
    * taking everything below 2^32, so floating-point rounding can
    * never leave a bucket unassigned or double-assigned. An oracle
    * replaying the assignment must replay the same cumulative sums
    * (left-to-right) before rounding.
    */
  private def splitAssign(h: Column,
      splits: Seq[(String, Double)]): Column = {
    require(splits.nonEmpty, "assignSplits: at least one split")
    require(splits.forall(_._2 > 0), "assignSplits: fractions must be > 0")
    require(splits.map(_._1).distinct.length == splits.length,
      "assignSplits: split names must be distinct")
    require(math.abs(splits.map(_._2).sum - 1.0) < 1e-9,
      s"assignSplits: fractions must sum to 1, got ${splits.map(_._2).sum}")
    val bounds = splits.map(_._2).scanLeft(0.0)(_ + _).tail
      .map(c => math.min(4294967296L, math.round(c * 4294967296.0)))
    val named = splits.map(_._1).zip(bounds)
    named.init.foldRight(lit(named.last._1): Column) {
      case ((name, bound), tail) => when(h < lit(bound), lit(name))
        .otherwise(tail)
    }
  }

  def assignSplits(df: DataFrame, idCol: String,
      splits: Seq[(String, Double)], seed: Long = 0L,
      splitCol: String = "split"): DataFrame =
    df.withColumn("__mix_sh", portableHashSeeded(col(s"`$idCol`"), seed))
      .withColumn(splitCol, splitAssign(col("__mix_sh"), splits))
      .drop("__mix_sh")

  /** GROUP-aware split assignment (X204, round 13 —
    * GroupShuffleSplit): every row of a GROUP (dedup cluster, domain,
    * author) lands in the SAME split, so near-duplicate content can
    * never leak from train into a held-out set — the leakage a
    * doc-level split provably has (q293 measures both side by side).
    * The group key is string-safe: it hashes through the portable
    * rolling hash (code points, mod 1e9+7) and then the same seeded
    * low-16 multiplicative map and exact cumulative-fraction
    * boundaries as [[assignSplits]]. A pure projection — no shuffle,
    * no state; any engine re-derives the identical assignment, which
    * is what keeps held-out sets held out across pipeline re-builds.
    */
  def assignSplitsByGroup(df: DataFrame, groupCol: String,
      splits: Seq[(String, Double)], seed: Long = 0L,
      splitCol: String = "split"): DataFrame = {
    val gid = graft.plans.NativeHashes.rollingHash(
      col(s"`$groupCol`").cast("string"), 1000000007L)
    df.withColumn("__mix_sh", portableHashSeeded(gid, seed))
      .withColumn(splitCol, splitAssign(col("__mix_sh"), splits))
      .drop("__mix_sh")
  }

  /** Deterministic seeded corpus shuffle WITHOUT a global sort: every
    * row gets a `shard` (its seeded hash mod `numShards`) and a `pos`
    * (the hash itself) — the training order is "all shards in
    * parallel, each shard read in (pos, id) order". A global
    * `ORDER BY rand()` is the canonical scale killer (one total order
    * = one range exchange + full sort of the corpus); this shape needs
    * only `repartition($"shard")` + `sortWithinPartitions($"pos",
    * $"id")` at write time — each task sorts its own shard, which is
    * exactly the parallelism a 1000-executor write wants. Same-seed
    * re-runs reproduce the identical order on any engine; a different
    * seed is a fresh permutation (epoch reshuffling without touching
    * the data).
    */
  def shardShuffle(df: DataFrame, idCol: String, numShards: Int,
      seed: Long = 0L): DataFrame = {
    require(numShards > 0, "shardShuffle: numShards must be > 0")
    df.withColumn("pos", portableHashSeeded(col(s"`$idCol`"), seed))
      .withColumn("shard", pmod(col("pos"), lit(numShards.toLong)))
  }

  /** Curriculum shard assignment: partition the corpus into
    * `numShards` quality-ordered bands — shard 0 holds the
    * lowest-scoring band, shard `numShards-1` the highest — so a
    * trainer consuming shards in order sees an easy→hard (or
    * noisy→clean) curriculum without anyone ever globally sorting
    * 100 TB. Within a shard the order key `pos` is a seeded portable
    * hash permutation: band membership is curriculum signal,
    * within-band order must NOT be (a quality-sorted shard would feed
    * the trainer correlated batches).
    *
    * The band spec is pure arithmetic, replayable in any engine:
    * `shard = min(numShards-1, floor(below(score) * numShards / N))`
    * where `below(score)` counts documents scoring STRICTLY less.
    * Same score → same shard, always (no tie-break dependence), and
    * bands are near-equal when the score distribution is fine-grained;
    * a single massively-popular score lands whole in one shard —
    * whole-score granularity is the documented tradeoff for
    * determinism.
    *
    * Scale shape: one map-side-combined groupBy on the score
    * (cardinality bounded by the integral-score RANGE, the
    * [[Select.byTokenBudget]] contract — widen the score scale, not
    * this operator, if it ever balloons); the cumulative walk windows
    * over that SCORE table, not the corpus; the score→shard map rides
    * back on a broadcast join. The corpus itself is touched by two
    * map-side passes and zero corpus-sized shuffles.
    */
  def curriculumShards(df: DataFrame, scoreCol: String, idCol: String,
      numShards: Int, seed: Long = 0L): DataFrame = {
    require(numShards > 0, "curriculumShards: numShards must be > 0")
    val score = col(s"`$scoreCol`")
    val hist = df.groupBy(score.as("__cs_score"))
      .agg(count(lit(1)).as("__cs_n"))
    // bounded: |scores| rows in one ordered partition, by contract
    val w = Window.orderBy(col("__cs_score"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val total = hist.agg(sum(col("__cs_n")).as("__cs_total"))
    val mapping = hist
      .withColumn("__cs_below", coalesce(sum(col("__cs_n")).over(w), lit(0L)))
      .crossJoin(broadcast(total))
      .select(col("__cs_score"),
        least(lit(numShards - 1).cast("long"),
          // integer `div`, not float `/`+floor: at 100 TB the counts
          // sit near the double mantissa edge and a float quotient
          // could misplace a boundary score by one shard
          call_function("div",
            col("__cs_below") * numShards, col("__cs_total"))
            .cast("long")).as("shard"))
    df.join(broadcast(mapping), score === col("__cs_score"))
      .drop("__cs_score")
      .withColumn("pos", portableHashSeeded(col(s"`$idCol`"), seed))
  }

  def materializeEpoch(df: DataFrame, stratumCol: String, idCol: String,
      plan: DataFrame, epoch: Int): DataFrame = {
    require(epoch >= 0, "materializeEpoch: epoch must be >= 0")
    val stratum = col(s"`$stratumCol`")
    val id = col(s"`$idCol`")
    val p = plan.select(col(s"`$stratumCol`").as("__mx_stratum"),
      col("epochs").as("__mx_epochs"))
    val full = floor(col("__mx_epochs")).cast("long")
    val frac = col("__mx_epochs") - floor(col("__mx_epochs"))
    val keep = (lit(epoch.toLong) < full) ||
      ((lit(epoch.toLong) === full) &&
        (portableHash(id) < (frac * 4294967296L).cast("long")))
    df.join(broadcast(p), stratum <=> col("__mx_stratum"))
      .filter(keep)
      .drop("__mx_stratum", "__mx_epochs")
  }
}
