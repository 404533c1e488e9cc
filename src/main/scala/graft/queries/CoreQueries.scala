package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{Graft, QueryDef}
import graft.functions.ch._
import graft.operators.Relational._

/** Core relational operator coverage (SURVEY.md §2.2-§2.6) expressed over
  * the driver's TPC-H-ish corpus, each with a DuckDB oracle.
  *
  * The `events` table plays the role of the reference's collapsing
  * `visits` stream: a deterministic `sign` column (-1 for every 7th
  * event id, +1 otherwise) reproduces VersionedCollapsingMergeTree's
  * state/cancel encoding (ddl/visits.sql:9-10) so the Sign-weighted
  * aggregate semantics of README.md:75-119 are exercised end-to-end.
  */
object CoreQueries {

  /** Deterministic Sign column: same expression in Spark and the oracle. */
  private def withSign(df: DataFrame): DataFrame =
    df.withColumn("sign",
      when(pmod(col("event_id"), lit(7)) === 0, -1).otherwise(1))

  private val signSql = "CASE WHEN event_id % 7 = 0 THEN -1 ELSE 1 END"

  // ---------------------------------------------------------------------
  // Q1 analogue (README.md:75-86): daily signed visit counts.
  // A1/A2/A7/P6/O1: sign-weighted count + measure, group by day, sort.
  val q01DailySignedAgg = QueryDef(
    "q01_daily_signed_agg",
    (s, dir) => {
      // Graft.events pushes the range on the raw stored ts column (Parquet
      // row-group pruning) before the ns->µs conversion — a filter on the
      // converted ts would reach the scan as a residual, not a pushdown.
      val e = withSign(Graft.events(s, dir, "2024-01-01", "2024-02-01"))
      e.groupBy(to_date(col("ts")).as("d"))
        .agg(
          sum(col("sign")).cast("long").as("visits"),
          sum(when(col("event_type") === "purchase", col("sign"))
            .otherwise(0)).cast("long").as("purchases"),
          round(sum(col("value") * col("sign")), 2).as("value_sum"))
        .orderBy(col("d"))
    },
    Some(s"""
      SELECT CAST(ts AS DATE) AS d,
             CAST(sum($signSql) AS BIGINT) AS visits,
             CAST(sum(CASE WHEN event_type = 'purchase' THEN $signSql ELSE 0 END) AS BIGINT) AS purchases,
             round(sum(value * ($signSql)), 2) AS value_sum
      FROM events
      WHERE ts >= TIMESTAMP '2024-01-01' AND ts < TIMESTAMP '2024-02-01'
      GROUP BY 1 ORDER BY 1"""),
    bench = true)

  // ---------------------------------------------------------------------
  // A10/A11: GROUP BY ... WITH TOTALS emulation + HAVING over the agg.
  val q02WithTotals = QueryDef(
    "q02_with_totals",
    (s, dir) => {
      val e = withSign(Graft.table(s, dir, "events"))
      withTotals(e, Seq("event_type"),
        Seq(sum(col("sign")).cast("long").as("visits"),
          round(sum(col("value") * col("sign")), 2).as("value_sum")))
        .filter(col("visits") >= 0L)
        .orderBy(col("event_type").asc_nulls_last)
    },
    Some(s"""
      SELECT event_type,
             CAST(sum($signSql) AS BIGINT) AS visits,
             round(sum(value * ($signSql)), 2) AS value_sum
      FROM events
      GROUP BY ROLLUP(event_type)
      HAVING CAST(sum($signSql) AS BIGINT) >= 0
      ORDER BY event_type ASC NULLS LAST"""))

  // ---------------------------------------------------------------------
  // O2/O5: multi-key mixed-direction ORDER BY + LIMIT (top-k).
  val q03TopkMulti = QueryDef(
    "q03_topk_multi",
    (s, dir) =>
      Graft.table(s, dir, "events")
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("total"))
        .orderBy(col("n").desc, col("user_id").asc)
        .limit(20),
    Some("""
      SELECT user_id, CAST(count(1) AS BIGINT) AS n, round(sum(value), 2) AS total
      FROM events GROUP BY 1
      ORDER BY n DESC, user_id ASC LIMIT 20"""),
    bench = true)

  // ---------------------------------------------------------------------
  // O4: ClickHouse `LIMIT offset, n` form (README.md:86,119).
  val q04LimitOffset = QueryDef(
    "q04_limit_offset",
    (s, dir) =>
      limitOffset(
        Graft.table(s, dir, "lineitem")
          .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
          .orderBy(col("l_orderkey"), col("l_linenumber")),
        offset = 100, n = 50),
    Some("""
      SELECT l_orderkey, l_linenumber, l_quantity
      FROM lineitem ORDER BY l_orderkey, l_linenumber
      LIMIT 50 OFFSET 100"""))

  // ---------------------------------------------------------------------
  // O6/P5/A6: UNION ALL with literal tags + a per-branch LIMIT branch —
  // the reference's count-reconciliation shape (README.md:150-168).
  val q05UnionTagged = QueryDef(
    "q05_union_tagged",
    (s, dir) => {
      val e = Graft.table(s, dir, "events")
      val a = e.agg(count(lit(1)).as("n")).select(lit("events").as("src"), col("n"))
      val b = e.filter(col("event_type") === "purchase")
        .agg(count(lit(1)).as("n")).select(lit("purchases").as("src"), col("n"))
      val c = e.orderBy(col("event_id")).limit(1)
        .select(lit("first_event").as("src"), col("event_id").as("n"))
      a.unionAll(b).unionAll(c).orderBy(col("src"))
    },
    Some("""
      SELECT 'events' AS src, CAST(count(1) AS BIGINT) AS n FROM events
      UNION ALL
      SELECT 'purchases' AS src, CAST(count(1) AS BIGINT) AS n FROM events WHERE event_type = 'purchase'
      UNION ALL
      SELECT * FROM (SELECT 'first_event' AS src, event_id AS n FROM events ORDER BY event_id LIMIT 1)
      ORDER BY src"""))

  // ---------------------------------------------------------------------
  // J1/J2: SCD2 temporal join, broadcast dim (README.md:287-302).
  val q06Scd2Join = QueryDef(
    "q06_scd2_join",
    (s, dir) => {
      import s.implicits._
      val dim = Seq(
        ("click", "Click era 1", "2024-01-01", "2024-01-15"),
        ("click", "Click era 2", "2024-01-16", "2099-12-31"),
        ("view", "View all-time", "2024-01-01", "2099-12-31"),
        ("purchase", "Purchase all-time", "2024-01-01", "2099-12-31"))
        .toDF("etype", "descr", "from_s", "to_s")
        .select(col("etype"), col("descr"),
          to_date(col("from_s")).as("from_dt"), to_date(col("to_s")).as("to_dt"))
      val fact = Graft.table(s, dir, "events")
        .withColumn("d", to_date(col("ts")))
      scd2Join(fact, dim,
          keyCond = fact("event_type") === dim("etype"),
          factDate = fact("d"),
          dimFrom = dim("from_dt"), dimTo = dim("to_dt"))
        .groupBy(col("descr"))
        .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("value_sum"))
        .orderBy(col("descr"))
    },
    Some("""
      WITH dim(etype, descr, from_dt, to_dt) AS (VALUES
        ('click', 'Click era 1', DATE '2024-01-01', DATE '2024-01-15'),
        ('click', 'Click era 2', DATE '2024-01-16', DATE '2099-12-31'),
        ('view', 'View all-time', DATE '2024-01-01', DATE '2099-12-31'),
        ('purchase', 'Purchase all-time', DATE '2024-01-01', DATE '2099-12-31'))
      SELECT descr, CAST(count(1) AS BIGINT) AS n, round(sum(value), 2) AS value_sum
      FROM events e JOIN dim d
        ON e.event_type = d.etype
       AND CAST(e.ts AS DATE) >= d.from_dt AND CAST(e.ts AS DATE) <= d.to_dt
      GROUP BY 1 ORDER BY 1"""),
    bench = true)

  // ---------------------------------------------------------------------
  // J1/A9: 3-table star join with multi-key aggregation. Catalyst should
  // broadcast customer (small) and shuffle-join lineitem x orders.
  val q07StarJoinAgg = QueryDef(
    "q07_star_join_agg",
    (s, dir) => {
      val li = Graft.table(s, dir, "lineitem")
      val o = Graft.table(s, dir, "orders")
      val c = Graft.table(s, dir, "customer")
      li.join(o, li("l_orderkey") === o("o_orderkey"))
        .join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .groupBy(col("c_mktsegment"), col("l_returnflag"))
        .agg(
          count(lit(1)).as("n"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
            .as("revenue"))
        .orderBy(col("c_mktsegment"), col("l_returnflag"))
    },
    Some("""
      SELECT c_mktsegment, l_returnflag,
             CAST(count(1) AS BIGINT) AS n,
             round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      GROUP BY 1, 2 ORDER BY 1, 2"""),
    bench = true)

  // ---------------------------------------------------------------------
  // §2.5: latest-version-per-entity, aggregation form (Relational
  // .latestByKey): groupBy + max_by gets partial aggregation, so each map
  // task reduces to one candidate row per user before the shuffle — the
  // row_number-window form (kept in the library for full-history uses)
  // would full-sort every partition with no map-side reduction and is the
  // scale-killer on skewed keys. Same result, verified by the same oracle.
  val q08LatestVersion = QueryDef(
    "q08_latest_version",
    (s, dir) => {
      val e = Graft.table(s, dir, "events")
      latestByKey(e, Seq("user_id"), Seq("ts", "event_id"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_latest"))
        .orderBy(col("event_type"))
    },
    Some("""
      SELECT event_type, CAST(count(1) AS BIGINT) AS n_latest
      FROM (
        SELECT event_type,
               row_number() OVER (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP) DESC, event_id DESC) AS rn
        FROM events) t
      WHERE rn = 1 GROUP BY 1 ORDER BY 1"""),
    bench = true)

  // ---------------------------------------------------------------------
  // P1/P3/P4/P5: projection with computed expressions and Metrica-style
  // colon-bearing aliases (README.md:75-76), literal column.
  val q09ProjAlias = QueryDef(
    "q09_proj_alias",
    (s, dir) =>
      Graft.table(s, dir, "lineitem")
        .filter(col("l_quantity") > 45)
        .select(
          col("l_orderkey").as("ym:l:order"),
          col("l_linenumber").as("ym:l:line"),
          round(col("l_extendedprice") * (lit(1) - col("l_discount")), 2)
            .as("ym:l:net"),
          when(col("l_returnflag") === "R", lit("returned"))
            .otherwise(lit("kept")).as("ym:l:status"),
          lit("warehouse").as("storage"))
        .orderBy(col("ym:l:order"), col("ym:l:line"))
        .limit(100),
    Some("""
      SELECT l_orderkey AS "ym:l:order", l_linenumber AS "ym:l:line",
             round(l_extendedprice * (1 - l_discount), 2) AS "ym:l:net",
             CASE WHEN l_returnflag = 'R' THEN 'returned' ELSE 'kept' END AS "ym:l:status",
             'warehouse' AS storage
      FROM lineitem WHERE l_quantity > 45
      ORDER BY 1, 2 LIMIT 100"""))

  // ---------------------------------------------------------------------
  // P6-P11: compound predicates (AND/OR, BETWEEN, casts, equality).
  val q10Filters = QueryDef(
    "q10_filters",
    (s, dir) =>
      Graft.table(s, dir, "lineitem")
        .filter(
          (col("l_returnflag") === "R" || col("l_linestatus") === "F") &&
            col("l_shipdate").between(lit("1995-01-01").cast("timestamp"),
              lit("1996-12-31").cast("timestamp")) &&
            col("l_quantity") > 10)
        .agg(count(lit(1)).as("n"),
          round(sum(col("l_extendedprice")), 2).as("price_sum"),
          round(avg(col("l_discount")), 6).as("avg_disc"))
        .select(col("n"), col("price_sum"), col("avg_disc")),
    Some("""
      SELECT CAST(count(1) AS BIGINT) AS n,
             round(sum(l_extendedprice), 2) AS price_sum,
             round(avg(l_discount), 6) AS avg_disc
      FROM lineitem
      WHERE (l_returnflag = 'R' OR l_linestatus = 'F')
        AND l_shipdate BETWEEN TIMESTAMP '1995-01-01' AND TIMESTAMP '1996-12-31'
        AND l_quantity > 10"""))

  // ---------------------------------------------------------------------
  // A4: uniqExact/least pattern from the traffic-sources query
  // (README.md:105).
  val q11DistinctUsers = QueryDef(
    "q11_distinct_users",
    (s, dir) =>
      Graft.table(s, dir, "events")
        .groupBy(col("event_type"))
        .agg(
          uniqExact(col("user_id")).as("users"),
          least(uniqExact(col("user_id")), count(lit(1))).as("users_capped"),
          count(lit(1)).as("n"))
        .orderBy(col("event_type")),
    Some("""
      SELECT event_type,
             CAST(count(DISTINCT user_id) AS BIGINT) AS users,
             CAST(least(count(DISTINCT user_id), count(1)) AS BIGINT) AS users_capped,
             CAST(count(1) AS BIGINT) AS n
      FROM events GROUP BY 1 ORDER BY 1"""))

  // ---------------------------------------------------------------------
  // Sampling (ddl/hits.sql:119): deterministic key-hash sample. The hash
  // here is the identity (key mod k) so the DuckDB oracle selects the
  // exact same rows; Murmur3-based sampling is covered in ScalaTest.
  val q12SampleHash = QueryDef(
    "q12_sample_hash",
    (s, dir) =>
      sampleByHash(Graft.table(s, dir, "events"), col("user_id"), 10,
        hashFn = identity)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("value_sum"))
        .orderBy(col("event_type")),
    Some("""
      SELECT event_type, CAST(count(1) AS BIGINT) AS n,
             round(sum(value), 2) AS value_sum
      FROM events WHERE user_id % 10 = 0
      GROUP BY 1 ORDER BY 1"""))

  // ---------------------------------------------------------------------
  // A3/P9/A8: the bounce-rate pattern at the heart of the reference's Q2
  // (README.md:102-119): `100. * (sum(IsBounce*Sign) / `ym:s:visits`)` —
  // a ratio of two aggregates where the divisor is referenced by its
  // SELECT alias; plus WHERE on a SELECT alias and GROUP BY on a SELECT
  // alias. ClickHouse resolves aliases anywhere in the statement; Spark
  // does not, so the engine's staging discipline is: define the alias
  // with withColumn (pre-agg aliases) / a second select over the
  // aggregated frame (agg aliases), then reference it freely.
  val q20RatioAlias = QueryDef(
    "q20_ratio_alias",
    (s, dir) => {
      val e = withSign(Graft.table(s, dir, "events"))
        // A8/P9: `src_grp` is a SELECT-alias in CH terms; staged as a
        // real column so both WHERE and GROUP BY can reference it.
        .withColumn("src_grp",
          when(col("user_id") % 3 === 0, lit("cohort_a"))
            .otherwise(lit("cohort_b")))
        .filter(col("src_grp") =!= "")
      e.groupBy(col("src_grp"))
        .agg(
          sum(col("sign")).cast("long").as("visits"),
          sum(when(col("event_type") === "purchase", col("sign"))
            .otherwise(0)).cast("long").as("purchases"))
        // A3: ratio-of-aggregates referencing the agg aliases by name.
        .select(col("src_grp"), col("visits"), col("purchases"),
          round(lit(100.0) * col("purchases") / col("visits"), 4)
            .as("purchase_rate"))
        .filter(col("visits") > 0) // A11: HAVING on the agg alias
        .orderBy(col("src_grp"))
    },
    Some(s"""
      SELECT src_grp, visits, purchases,
             round(100.0 * purchases / visits, 4) AS purchase_rate
      FROM (
        SELECT CASE WHEN user_id % 3 = 0 THEN 'cohort_a' ELSE 'cohort_b' END AS src_grp,
               CAST(sum($signSql) AS BIGINT) AS visits,
               CAST(sum(CASE WHEN event_type = 'purchase' THEN $signSql ELSE 0 END) AS BIGINT) AS purchases
        FROM events
        GROUP BY 1) t
      WHERE visits > 0
      ORDER BY src_grp"""))

  // ---------------------------------------------------------------------
  // P9/A8 verbatim shape (README.md:113-114): a backticked `ym:s:...`
  // SELECT alias that the statement then FILTERS on (`... != ''`, and
  // here the predicate is selective, not vacuous), GROUPs on, HAVINGs
  // over, and sorts mixed-direction (O2). ClickHouse resolves the alias
  // everywhere; the Spark staging is select-first (the alias becomes a
  // real column), then filter/groupBy reference it by its backticked
  // name exactly as the reference SQL spells it.
  val q36AliasWhere = QueryDef(
    "q36_alias_where",
    (s, dir) => {
      val staged = withSign(Graft.table(s, dir, "events"))
        .select(
          when(col("value") >= 50, col("event_type")).otherwise(lit(""))
            .as("ym:s:lastSignSource"),
          col("user_id").as("ym:s:user"),
          col("sign"))
      staged
        .filter(col("`ym:s:lastSignSource`") =!= "") // P9: WHERE on alias
        .groupBy(col("`ym:s:lastSignSource`"))       // A8: GROUP BY alias
        .agg(
          sum(col("sign")).cast("long").as("ym:s:visits"),
          uniqExact(col("`ym:s:user`")).as("ym:s:users"))
        .filter(col("`ym:s:visits`") > 0)            // A11 on the agg alias
        .orderBy(col("`ym:s:visits`").desc, col("`ym:s:lastSignSource`").asc)
    },
    Some(s"""
      SELECT "ym:s:lastSignSource",
             CAST(sum(sign) AS BIGINT) AS "ym:s:visits",
             CAST(count(DISTINCT "ym:s:user") AS BIGINT) AS "ym:s:users"
      FROM (
        SELECT CASE WHEN value >= 50 THEN event_type ELSE '' END AS "ym:s:lastSignSource",
               user_id AS "ym:s:user",
               $signSql AS sign
        FROM events) t
      WHERE "ym:s:lastSignSource" <> ''
      GROUP BY 1 HAVING sum(sign) > 0
      ORDER BY "ym:s:visits" DESC, "ym:s:lastSignSource" ASC"""))

  // ---------------------------------------------------------------------
  // Skew-safe salted join (SURVEY.md §4 scale discipline): the fact side
  // salted on a within-key-varying column, the other side replicated,
  // join key (key, salt) — a hot order key spreads over 8 tasks instead
  // of one. The shuffle_hash hint forces the shuffled-join shape this
  // operator exists for (broadcast would bypass the skew problem, and
  // AQE skew splitting only applies to sort-merge); the oracle is the
  // PLAIN join — salting must not change a single row.
  val q39SaltedJoin = QueryDef(
    "q39_salted_join",
    (s, dir) => {
      val l = Graft.table(s, dir, "lineitem")
      val o = Graft.table(s, dir, "orders").hint("shuffle_hash")
      saltedJoin(l, o, "l_orderkey", "o_orderkey",
          spreadBy = col("l_linenumber"), saltN = 8)
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"),
          round(sum(col("l_extendedprice")), 2).as("price_sum"))
        .orderBy(col("o_orderpriority"))
    },
    Some("""
      SELECT o_orderpriority, CAST(count(1) AS BIGINT) AS n,
             round(sum(l_extendedprice), 2) AS price_sum
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      GROUP BY 1 ORDER BY 1"""))

  // ---------------------------------------------------------------------
  // As-of join (CH ASOF JOIN): every event matched to the PREVAILING
  // rate checkpoint — the latest checkpoint for its type at or before
  // its timestamp. Checkpoints derive deterministically from the data
  // (per (type, week): the week's first event instant, rate = the
  // week's event count), and skip the first week so the no-prior-row
  // null path is exercised. The oracle is DuckDB's native ASOF LEFT
  // JOIN — two engines, two completely different implementations
  // (union+window running-last here, sorted merge there), same rows.
  val q61AsofJoin = QueryDef(
    "q61_asof_join",
    (s, dir) => {
      val raw = Graft.eventsMicros(s, dir)
      val e = raw.select(col("event_type"),
        col("ts").as("t"),
        to_date(timestamp_micros(col("ts"))).as("d"))
        .withColumn("wk", toMonday(col("d")))
      val cp = e.filter(col("wk") > lit("2024-01-01").cast("date"))
        .groupBy(col("event_type"), col("wk"))
        .agg(min(col("t")).as("cp_ts"), count(lit(1)).as("rate"))
        .select(col("event_type"), col("cp_ts"), col("rate"))
      // chunkWidth = 1 day in micros: event_type has cardinality ~5, so
      // the unchunked form would sort each type's whole history in ONE
      // task; day chunks spread it over #types × #days tasks
      asofJoin(e.select(col("event_type"), col("t")), cp,
          Seq("event_type"), "t", "cp_ts", Seq("cp_ts", "rate"),
          chunkWidth = 86_400_000_000L)
        .groupBy(col("event_type"))
        .agg(
          count(lit(1)).as("n_events"),
          count(col("rate")).as("n_matched"),
          sum(col("rate")).cast("long").as("rate_sum"),
          count_distinct(col("cp_ts")).as("n_cp"))
        .orderBy(col("event_type"))
    },
    Some("""
      WITH e AS (
        SELECT event_type, epoch_us(ts) AS t,
               CAST(date_trunc('week', CAST(ts AS DATE)) AS DATE) AS wk
        FROM events
      ), cp AS (
        SELECT event_type, min(t) AS cp_ts, CAST(count(1) AS BIGINT) AS rate
        FROM e WHERE wk > DATE '2024-01-01'
        GROUP BY event_type, wk
      )
      SELECT e.event_type,
             CAST(count(1) AS BIGINT) AS n_events,
             CAST(count(cp.rate) AS BIGINT) AS n_matched,
             CAST(sum(cp.rate) AS BIGINT) AS rate_sum,
             CAST(count(DISTINCT cp.cp_ts) AS BIGINT) AS n_cp
      FROM e ASOF LEFT JOIN cp
        ON e.event_type = cp.event_type AND e.t >= cp.cp_ts
      GROUP BY 1 ORDER BY 1"""),
    bench = true)

  // ---------------------------------------------------------------------
  // CH `LIMIT n BY key` — first n rows per key under an explicit order:
  // the three earliest events per type. Spark 4 plans the rank window
  // with a map-side WindowGroupLimit, so the shuffle carries ≤ n rows
  // per (key, input partition).
  val q62LimitBy = QueryDef(
    "q62_limit_by",
    (s, dir) => {
      val e = Graft.table(s, dir, "events")
        .select(col("event_type"), col("event_id"),
          unix_micros(col("ts")).as("t"))
      limitBy(e, Seq("event_type"), 3, Seq(col("t").asc, col("event_id").asc))
        .orderBy(col("event_type"), col("t"), col("event_id"))
    },
    Some("""
      WITH r AS (
        SELECT event_type, event_id, epoch_us(ts) AS t,
               row_number() OVER (PARTITION BY event_type
                                  ORDER BY epoch_us(ts), event_id) AS rn
        FROM events
      )
      SELECT event_type, event_id, t
      FROM r WHERE rn <= 3 ORDER BY event_type, t, event_id"""))

  // ---------------------------------------------------------------------
  // Range (interval) join at scale: events matched to OVERLAPPING
  // per-(type, week) validity intervals (each week's [first−2d,
  // last+2d]) via interval bin explosion + bin equi-join — one shuffle
  // per side, never the nested-loop plan a bare inequality join gets.
  // The oracle runs the same match as a plain inequality join (fine at
  // oracle scale) — both engines must agree on every (event, interval)
  // pair.
  // ---------------------------------------------------------------------
  // Per-entity time-grid RESAMPLE with carry-forward: each user's
  // activity downsampled to a fixed 6h grid between their first and
  // last active bucket, gaps filled from the last observation — the
  // standard time-series densification (CH users build it with
  // WITH FILL per entity or an ASOF self-join; the grid-join form is
  // the distributed shape: per-entity sequence → explode → left join
  // → partitioned carry-forward window; everything shuffles on the
  // entity key, nothing global). Carried values are 1e-2 fixed-point
  // longs (sums of 2-decimal inputs are integers-in-disguise, so the
  // snap is exact on any engine).
  val q173ResampleCarry = QueryDef(
    "q173_resample_carry",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val step = 6L * 3600 * 1000000 // 6h in µs
      val e = Graft.events(s, dir, "2024-01-01", "2024-01-15")
        .filter(col("user_id") < 50)
      val v = e.groupBy(col("user_id"),
          (floor(unix_micros(col("ts")) / step) * step).cast("long")
            .as("bucket"))
        .agg(round(sum(col("value")) * 100).cast("long").as("v_fp"),
          count(lit(1)).as("n"))
      val bounds = v.groupBy(col("user_id"))
        .agg(min(col("bucket")).as("lo"), max(col("bucket")).as("hi"))
      val grid = bounds.select(col("user_id"),
        explode(sequence(col("lo"), col("hi"), lit(step))).as("bucket"))
      val w = Window.partitionBy(col("user_id")).orderBy(col("bucket"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      grid.join(v, Seq("user_id", "bucket"), "left")
        .withColumn("carried",
          last(col("v_fp"), ignoreNulls = true).over(w))
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_buckets"),
          sum(when(col("n").isNull, 1L).otherwise(0L)).cast("long")
            .as("n_filled"),
          sum(col("carried")).cast("long").as("carry_sum_fp"))
        .orderBy(col("user_id"))
    },
    Some("""
      WITH e AS (
        SELECT user_id, epoch_us(ts) AS t, value FROM events
        WHERE ts >= TIMESTAMP '2024-01-01' AND ts < TIMESTAMP '2024-01-15'
          AND user_id < 50
      ), v AS (
        SELECT user_id,
               (t // 21600000000) * 21600000000 AS bucket,
               CAST(round(sum(value) * 100) AS BIGINT) AS v_fp,
               count(1) AS n
        FROM e GROUP BY 1, 2
      ), b AS (
        SELECT user_id, min(bucket) AS lo, max(bucket) AS hi
        FROM v GROUP BY 1
      ), grid AS (
        SELECT user_id, u.bucket
        FROM b, unnest(generate_series(lo, hi, 21600000000)) AS u(bucket)
      ), j AS (
        SELECT g.user_id, g.bucket, v.v_fp, v.n,
               last_value(v.v_fp IGNORE NULLS) OVER (
                 PARTITION BY g.user_id ORDER BY g.bucket
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS carried
        FROM grid g LEFT JOIN v
          ON g.user_id = v.user_id AND g.bucket = v.bucket
      )
      SELECT user_id, CAST(count(1) AS BIGINT) AS n_buckets,
             CAST(sum(CASE WHEN n IS NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS n_filled,
             CAST(sum(carried) AS BIGINT) AS carry_sum_fp
      FROM j GROUP BY 1 ORDER BY 1"""))

  val q63RangeJoin = QueryDef(
    "q63_range_join_binned",
    (s, dir) => {
      val raw = Graft.eventsMicros(s, dir)
      val e = raw.select(col("event_type"), col("ts").as("t"),
          to_date(timestamp_micros(col("ts"))).as("d"))
        .withColumn("wk", toMonday(col("d")))
      val twoDays = 2L * 86400 * 1000000
      val iv = e.groupBy(col("event_type"), col("wk"))
        .agg((min(col("t")) - twoDays).as("lo"),
          (max(col("t")) + twoDays).as("hi"))
      rangeJoinBinned(e.select(col("event_type"), col("t")), "t",
          iv, "lo", "hi", binWidth = 7L * 86400 * 1000000,
          keyCols = Seq("event_type"))
        .groupBy(col("event_type"))
        .agg(
          count(lit(1)).as("n_matches"),
          count_distinct(col("t")).as("n_points"),
          count_distinct(col("wk")).as("n_intervals"))
        .orderBy(col("event_type"))
    },
    Some("""
      WITH e AS (
        SELECT event_type, epoch_us(ts) AS t,
               CAST(date_trunc('week', CAST(ts AS DATE)) AS DATE) AS wk
        FROM events
      ), iv AS (
        SELECT event_type, wk, min(t) - 172800000000 AS lo,
               max(t) + 172800000000 AS hi
        FROM e GROUP BY 1, 2
      )
      SELECT e.event_type,
             CAST(count(1) AS BIGINT) AS n_matches,
             CAST(count(DISTINCT e.t) AS BIGINT) AS n_points,
             CAST(count(DISTINCT iv.wk) AS BIGINT) AS n_intervals
      FROM e JOIN iv
        ON e.event_type = iv.event_type AND iv.lo <= e.t AND e.t <= iv.hi
      GROUP BY 1 ORDER BY 1"""))

  // ---------------------------------------------------------------------
  // CH `ORDER BY d WITH FILL`: a sparse daily aggregate (a ~1% event
  // sample) gap-filled so every calendar day of the month emits a row,
  // absent days carrying CH's zero defaults. The oracle generates the
  // same axis with generate_series + LEFT JOIN + coalesce.
  val q64WithFill = QueryDef(
    "q64_with_fill",
    (s, dir) => {
      val sparse = withSign(Graft.table(s, dir, "events"))
        .filter(pmod(col("event_id"), lit(97)) === 0)
        .groupBy(to_date(col("ts")).as("day"))
        .agg(sum(col("sign")).cast("long").as("n_signed"),
          round(sum(col("value") * col("sign")), 2).as("value_signed"))
      withFillDates(sparse, "day", "2024-01-01", "2024-01-30",
          Seq("n_signed" -> lit(0L), "value_signed" -> lit(0.0)))
        .orderBy(col("day"))
    },
    Some(s"""
      WITH axis AS (
        SELECT CAST(gs.d AS DATE) AS day
        FROM generate_series(DATE '2024-01-01', DATE '2024-01-30',
                             INTERVAL 1 DAY) gs(d)
      ), sparse AS (
        SELECT CAST(ts AS DATE) AS day,
               CAST(sum($signSql) AS BIGINT) AS n_signed,
               round(sum(value * ($signSql)), 2) AS value_signed
        FROM events WHERE event_id % 97 = 0
        GROUP BY 1
      )
      SELECT day,
             coalesce(sparse.n_signed, 0) AS n_signed,
             coalesce(sparse.value_signed, 0.0) AS value_signed
      FROM axis FULL JOIN sparse USING (day)
      ORDER BY day"""))

  // ---------------------------------------------------------------------
  // CH `WITH FILL FROM 0 TO 100 STEP 2` on a NUMERIC axis: events
  // bucketed onto multiples of 3 (sparse on the even grid), absent grid
  // values filled with zero defaults, off-grid buckets (odd multiples
  // of 3) passing through as CH keeps them. TO is exclusive (CH
  // semantics); the oracle generates the same grid with DuckDB's
  // exclusive-stop range() + FULL JOIN + coalesce.
  val q66WithFillNumeric = QueryDef(
    "q66_with_fill_numeric",
    (s, dir) => {
      val binned = Graft.table(s, dir, "events")
        .groupBy((pmod(col("event_id"), lit(37)) * 3).cast("long")
          .as("bucket"))
        .agg(count(lit(1)).cast("long").as("n"),
          round(sum(col("value")), 2).as("v"))
      withFillNumeric(binned, "bucket", from = 0, to = 100, step = 2,
          Seq("n" -> lit(0L), "v" -> lit(0.0)))
        .orderBy(col("bucket"))
    },
    Some("""
      WITH sparse AS (
        SELECT CAST((event_id % 37) * 3 AS BIGINT) AS bucket,
               CAST(count(1) AS BIGINT) AS n,
               round(sum(value), 2) AS v
        FROM events GROUP BY 1
      ), axis AS (
        SELECT CAST(r.range AS BIGINT) AS bucket FROM range(0, 100, 2) r
      )
      SELECT bucket, coalesce(sparse.n, 0) AS n,
             coalesce(sparse.v, 0.0) AS v
      FROM axis FULL JOIN sparse USING (bucket)
      ORDER BY bucket"""))

  // ---------------------------------------------------------------------
  // CH `topK(k)(x)`: the k most frequent values per group. CH's native
  // aggregate is approximate (filtered space-saving); this exact
  // two-stage form (count agg → local rank → global rank) is the
  // deterministic equivalent the oracle can reproduce — and the scale
  // shape never funnels a key's full distinct-value set into one task.
  // The driver-facing entry serializes the ranked list to a CSV string:
  // the comparison harness sorts/hashes scalar cells only.
  val q69TopKFreq = QueryDef(
    "q69_topk_freq",
    (s, dir) => {
      val e = Graft.table(s, dir, "events")
        .select(col("event_type"), pmod(col("user_id"), lit(50)).as("u"))
      topKFreq(e, Seq("event_type"), "u", 3)
        .select(col("event_type"),
          concat_ws(",", col("topk").cast("array<string>")).as("topk"))
        .orderBy(col("event_type"))
    },
    Some("""
      WITH c AS (
        SELECT event_type, user_id % 50 AS u, count(1) AS cnt
        FROM events GROUP BY 1, 2
      ), r AS (
        SELECT event_type, u,
               row_number() OVER (PARTITION BY event_type
                                  ORDER BY cnt DESC, u) AS rn
        FROM c
      )
      SELECT event_type,
             string_agg(CAST(u AS VARCHAR), ',' ORDER BY rn) AS topk
      FROM r WHERE rn <= 3 GROUP BY 1 ORDER BY 1"""))

  // ---------------------------------------------------------------------
  // CH `retention(cond1, …)` — the cohort primitive: per user, r1 =
  // "was there on the anchor day", ri = "anchor AND day-k return";
  // summed over users it is the day-1 / day-7 retention funnel every
  // analytics UI draws. Composed of plain max aggregates (map-side
  // partial agg); the oracle reproduces the algebra with bool_or.
  val q77Retention = QueryDef(
    "q77_retention",
    (s, dir) => {
      val e = Graft.table(s, dir, "events")
        .select(col("user_id"), col("ts").cast("date").as("day"))
      val per = e.groupBy(col("user_id"))
        .agg(retention(Seq(
          col("day") === lit("2024-01-02").cast("date"),
          col("day") === lit("2024-01-03").cast("date"),
          col("day") === lit("2024-01-09").cast("date"))).as("r"))
      per.agg(
        sum(element_at(col("r"), 1)).cast("long").as("n_anchor"),
        sum(element_at(col("r"), 2)).cast("long").as("n_next_day"),
        sum(element_at(col("r"), 3)).cast("long").as("n_next_week"))
    },
    Some("""
      WITH per AS (
        SELECT user_id,
               CAST(bool_or(CAST(ts AS DATE) = DATE '2024-01-02') AS INT) AS r1,
               CAST(bool_or(CAST(ts AS DATE) = DATE '2024-01-03') AS INT) AS r2,
               CAST(bool_or(CAST(ts AS DATE) = DATE '2024-01-09') AS INT) AS r3
        FROM events GROUP BY 1
      )
      SELECT CAST(sum(r1) AS BIGINT) AS n_anchor,
             CAST(sum(r1 * r2) AS BIGINT) AS n_next_day,
             CAST(sum(r1 * r3) AS BIGINT) AS n_next_week
      FROM per"""))

  // ---------------------------------------------------------------------
  // Re-aggregable distinct-count sketches — CH's uniqState/uniqMerge
  // AggregatingMergeTree rollup (store a per-(type, day) sketch table,
  // answer weekly uniques by MERGING sketches, never rescanning raw
  // events). This is the load-bearing 100 TB pattern: the daily sketch
  // table is ~|groups|·1.5 KB regardless of corpus size, and any
  // coarser rollup (week, month, all-time) is a union over it. Mapped
  // onto Spark's Datasketches HLL (lgConfigK=14 → ~0.8% rsd; the 5%
  // acceptance band is ~6 sigma). The oracle recomputes the exact
  // weekly uniques and pins the band result to 1 — an estimator
  // regression fails the hash like any wrong value.
  val q76HllSketchRollup = QueryDef(
    "q76_hll_sketch_rollup",
    (s, dir) => {
      val e = Graft.table(s, dir, "events")
        .select(col("event_type"), col("user_id"),
          col("ts").cast("date").as("day"))
      // the materialized daily sketch table (what a warehouse persists)
      val daily = e.groupBy(col("event_type"), col("day"))
        .agg(hll_sketch_agg(col("user_id"), lit(14)).as("sk"))
      val weekly = daily
        .groupBy(col("event_type"), toMonday(col("day")).as("wk"))
        .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("est"))
      val exact = e
        .groupBy(col("event_type"), toMonday(col("day")).as("wk"))
        .agg(countDistinct(col("user_id")).as("exact_users"))
      exact.join(weekly, Seq("event_type", "wk"))
        .select(col("event_type"), col("wk"), col("exact_users"),
          (abs(col("est") - col("exact_users")) <=
            lit(0.05) * col("exact_users")).cast("long").as("hll_in_band"))
        .orderBy(col("event_type"), col("wk"))
    },
    Some("""
      SELECT event_type,
             CAST(date_trunc('week', CAST(ts AS DATE)) AS DATE) AS wk,
             CAST(count(DISTINCT user_id) AS BIGINT) AS exact_users,
             CAST(1 AS BIGINT) AS hll_in_band
      FROM events GROUP BY 1, 2 ORDER BY 1, 2"""))

  // ---------------------------------------------------------------------
  // CH `ANY LEFT JOIN`: at most one right match per left row. CH picks
  // an arbitrary one; the engine's deterministic contract picks the
  // min by an explicit order (first lineitem line per order here), so
  // both engines agree row-for-row. The right side reduces BEFORE the
  // join (min_by with partial aggregation) — one shuffle cheaper than
  // join-then-dedup at fact scale.
  val q70AnyLeftJoin = QueryDef(
    "q70_any_left_join",
    (s, dir) => {
      val o = Graft.table(s, dir, "orders")
      val l = Graft.table(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
      // (l_orderkey, l_linenumber) is NOT unique in the synthetic
      // corpus — l_quantity joins the pick order so the aggregate is
      // deterministic on both engines even under full ties
      anyLeftJoin(o, l, "o_orderkey", "l_orderkey",
          Seq("l_linenumber", "l_quantity"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_orders"),
          count(col("l_quantity")).as("n_matched"),
          round(sum(col("l_quantity")), 2).as("qty_first_line"))
        .orderBy(col("o_orderpriority"))
    },
    Some("""
      WITH f AS (
        SELECT l_orderkey, l_quantity,
               row_number() OVER (PARTITION BY l_orderkey
                                  ORDER BY l_linenumber, l_quantity) AS rn
        FROM lineitem
      )
      SELECT o_orderpriority,
             CAST(count(1) AS BIGINT) AS n_orders,
             CAST(count(f.l_quantity) AS BIGINT) AS n_matched,
             round(sum(f.l_quantity), 2) AS qty_first_line
      FROM orders o LEFT JOIN f
        ON o.o_orderkey = f.l_orderkey AND f.rn = 1
      GROUP BY 1 ORDER BY 1"""))

  val defs: Seq[QueryDef] = Seq(
    q01DailySignedAgg, q02WithTotals, q03TopkMulti, q04LimitOffset,
    q05UnionTagged, q06Scd2Join, q07StarJoinAgg, q08LatestVersion,
    q09ProjAlias, q10Filters, q11DistinctUsers, q12SampleHash,
    q20RatioAlias, q36AliasWhere, q39SaltedJoin, q61AsofJoin, q62LimitBy,
    q63RangeJoin, q173ResampleCarry, q64WithFill, q66WithFillNumeric,
    q69TopKFreq,
    q70AnyLeftJoin, q76HllSketchRollup, q77Retention)
}
