package graft.queries

import graft.{Graft, QueryDef}

/** ClickHouse-dialect SQL surface (SURVEY.md §2.9): the reference
  * user's SQL — CH function names and all — running verbatim through
  * `spark.sql` on sessions built with the graft extensions. The
  * function registry rows delegate to the `graft.functions.ch`
  * combinators (plans/ChDialect.scala), so dialect SQL and the Scala
  * API are the same expressions.
  */
object DialectQueries {

  // ---------------------------------------------------------------------
  // toMonday / uniqExact / notEmpty / toInt64 over the events stream —
  // the reference Q1's function vocabulary (README.md:75-86,
  // ddl/hits.sql:114) in SQL. The view is pre-bounded via Graft.events
  // so the time range pushes down on the raw nanos (the SQL's own
  // WHERE would sit above the ns→µs conversion and reach the scan as a
  // residual, not a pushdown).
  val q40ChDialectSql = QueryDef(
    "q40_ch_dialect_sql",
    (s, dir) => {
      Graft.events(s, dir, "2024-01-01", "2024-01-29")
        .createOrReplaceTempView("events_v")
      s.sql("""
        SELECT toMonday(CAST(ts AS DATE)) AS wk,
               toInt64(count(1)) AS n,
               uniqExact(user_id) AS users,
               toInt64(sum(notEmpty(event_type))) AS n_typed
        FROM events_v
        GROUP BY toMonday(CAST(ts AS DATE))
        ORDER BY wk""")
    },
    Some("""
      SELECT CAST(date_trunc('week', CAST(ts AS DATE)) AS DATE) AS wk,
             CAST(count(1) AS BIGINT) AS n,
             CAST(count(DISTINCT user_id) AS BIGINT) AS users,
             CAST(sum(CASE WHEN event_type IS NOT NULL AND length(event_type) > 0
                           THEN 1 ELSE 0 END) AS BIGINT) AS n_typed
      FROM events
      WHERE CAST(ts AS DATE) BETWEEN DATE '2024-01-01' AND DATE '2024-01-28'
      GROUP BY 1 ORDER BY 1"""))

  // ---------------------------------------------------------------------
  // sumArray / arrayElement (CH `arr[i]` with default-on-miss) / uniq* /
  // toInt64 over the embeddings table. `arrayElement(embedding, 0)`
  // exercises the CH miss path: the element type's default (0.0), never
  // null — the oracle recomputes the same CASE rather than asserting a
  // constant.
  val q41ChDialectArrays = QueryDef(
    "q41_ch_dialect_arrays",
    (s, dir) => {
      Graft.table(s, dir, "embeddings").createOrReplaceTempView("embeddings_v")
      s.sql("""
        SELECT label,
               toInt64(count(1)) AS n,
               uniqExact(vec_id) AS ids,
               round(sumArray(embedding), 2) AS emb_sum,
               round(sum(arrayElement(embedding, 1)), 3) AS first_sum,
               round(sum(arrayElement(embedding, 0)), 3) AS miss_sum
        FROM embeddings_v
        GROUP BY label
        ORDER BY label""")
    },
    Some("""
      SELECT label,
             CAST(count(1) AS BIGINT) AS n,
             CAST(count(DISTINCT vec_id) AS BIGINT) AS ids,
             round(sum(list_aggregate(embedding::DOUBLE[], 'sum')), 2) AS emb_sum,
             round(sum(CASE WHEN len(embedding) >= 1
                            THEN embedding[1]::DOUBLE ELSE 0.0 END), 3) AS first_sum,
             round(sum(CASE WHEN 0 >= 1
                            THEN embedding[0]::DOUBLE ELSE 0.0 END), 3) AS miss_sum
      FROM embeddings
      GROUP BY 1 ORDER BY 1"""))

  // ---------------------------------------------------------------------
  // The reference's Q2 "Traffic sources" (README.md:102-119) as
  // CH-dialect SQL through spark.sql — arrayMap (lambda-first), nested,
  // if/isFinite/notEmpty/toInt64, sumArray, indexOf + arrayElement
  // (the named form of CH `arr[i]`, since Spark's bracket syntax is
  // 0-based), uniqExact, least, Sign-weighted measures, ratio
  // aggregates. The two CH alias-resolution liberties (WHERE on a
  // SELECT alias, aggregate-alias reuse) become the documented staging:
  // one subquery level each. Hash-checked against the SAME oracle as
  // the DataFrame form (q29) — both front ends must agree with each
  // other and with DuckDB.
  val q42MetricaQ2DialectSql = QueryDef(
    "q42_metrica_q2_dialect_sql",
    (s, _) => {
      MetricaQueries.fixture(s).createOrReplaceTempView("visits_v")
      s.sql("""
        SELECT `ym:s:lastSignUTMSource`,
               `ym:s:visits`,
               least(__uniq, `ym:s:visits`) AS `ym:s:users`,
               round(100.0D * __bounces / `ym:s:visits`, 4) AS `ym:s:bounceRate`,
               round(__pv / CAST(`ym:s:visits` AS DOUBLE), 4) AS `ym:s:pageDepth`,
               round(__dur / CAST(`ym:s:visits` AS DOUBLE), 4) AS `ym:s:avgVisitDurationSeconds`,
               `ym:s:ecommercePurchases`
        FROM (
          SELECT `ym:s:lastSignUTMSource`,
                 toInt64(sum(Sign)) AS `ym:s:visits`,
                 uniqExact(CounterUserIDHash) AS __uniq,
                 toInt64(sum(IsBounce * Sign)) AS __bounces,
                 toInt64(sum(PageViews * Sign)) AS __pv,
                 toInt64(sum(Duration * Sign)) AS __dur,
                 toInt64(sumArray(arrayMap(x -> if(isFinite(x), x, 0L) * Sign,
                          arrayMap(x0 -> toInt64(notEmpty(x0)), `EPurchase.ID`))))
                   AS `ym:s:ecommercePurchases`
          FROM (
            SELECT *,
                   arrayElement(`TrafficSource.UTMSource`,
                                indexOf(`TrafficSource.Model`, 2))
                     AS `ym:s:lastSignUTMSource`
            FROM visits_v
            WHERE StartDate >= DATE '2023-11-01' AND StartDate <= DATE '2023-11-14'
          )
          WHERE `ym:s:lastSignUTMSource` != ''
          GROUP BY `ym:s:lastSignUTMSource`
        )
        WHERE (`ym:s:visits` > 0.0) OR (least(__uniq, `ym:s:visits`) > 0.0)
           OR (`ym:s:ecommercePurchases` > 0.0)
        ORDER BY `ym:s:visits` DESC, `ym:s:lastSignUTMSource` ASC
        LIMIT 50""")
    },
    // both front ends (DataFrame q29, dialect SQL q42) must match the
    // same DuckDB ground truth
    MetricaQueries.q29MetricaQ2.oracle)

  // ---------------------------------------------------------------------
  // The reference's Q1 "Visits" (README.md:75-86) as dialect SQL: CH
  // `GROUP BY x WITH TOTALS` becomes `GROUP BY ROLLUP(x)` (for a single
  // key they are the same lattice: the groups plus one grand-total row
  // with a NULL key), HAVING applies to the totals row exactly as CH
  // defaults to, WHERE on the `ym:s:date` SELECT alias is staged one
  // subquery down. Same oracle as the DataFrame form q28.
  val q43MetricaQ1DialectSql = QueryDef(
    "q43_metrica_q1_dialect_sql",
    (s, _) => {
      MetricaQueries.fixture(s).createOrReplaceTempView("visits_v")
      s.sql("""
        SELECT CAST(`ym:s:date` AS STRING) AS `ym:s:date`,
               toInt64(sum(Sign)) AS `ym:s:visits`
        FROM (
          SELECT StartDate AS `ym:s:date`, Sign
          FROM visits_v
          WHERE StartDate >= DATE '2023-11-01' AND StartDate <= DATE '2023-11-08'
        )
        GROUP BY ROLLUP(`ym:s:date`)
        HAVING sum(Sign) >= 0.0
        ORDER BY CAST(`ym:s:date` AS STRING) ASC NULLS LAST
        LIMIT 10""")
    },
    MetricaQueries.q28MetricaQ1.oracle)

  // ---------------------------------------------------------------------
  // The SAME Q1, but with ClickHouse's literal `GROUP BY x WITH TOTALS`
  // clause — accepted by the injected TotalsParser (rewrites to ROLLUP
  // only after Spark's own grammar rejects the text, so valid SQL is
  // never touched). Same oracle again: three front-end forms of Q1
  // (DataFrame q28, ROLLUP SQL q43, TOTALS SQL q44) must all agree.
  val q44MetricaQ1Totals = QueryDef(
    "q44_metrica_q1_totals_sql",
    (s, _) => {
      MetricaQueries.fixture(s).createOrReplaceTempView("visits_v")
      s.sql("""
        SELECT CAST(`ym:s:date` AS STRING) AS `ym:s:date`,
               toInt64(sum(Sign)) AS `ym:s:visits`
        FROM (
          SELECT StartDate AS `ym:s:date`, Sign
          FROM visits_v
          WHERE StartDate >= DATE '2023-11-01' AND StartDate <= DATE '2023-11-08'
        )
        GROUP BY `ym:s:date` WITH TOTALS
        HAVING sum(Sign) >= 0.0
        ORDER BY CAST(`ym:s:date` AS STRING) ASC NULLS LAST
        LIMIT 0, 10""")
    },
    MetricaQueries.q28MetricaQ1.oracle)

  // ---------------------------------------------------------------------
  // The countIf/sumIf/avgIf conditional-aggregate family + the month
  // helpers — the most common CH idioms beyond the reference's own two
  // queries, exercised over the events stream.
  val q47ChConditionalAggs = QueryDef(
    "q47_ch_conditional_aggs",
    (s, dir) => {
      Graft.table(s, dir, "events").createOrReplaceTempView("events_all_v")
      s.sql("""
        SELECT toStartOfMonth(CAST(ts AS DATE)) AS mo,
               toYYYYMM(CAST(ts AS DATE)) AS yyyymm,
               countIf(event_type = 'purchase') AS purchases,
               round(sumIf(value, event_type = 'purchase'), 2) AS purchase_value,
               round(avgIf(value, event_type = 'view'), 4) AS avg_view_value
        FROM events_all_v
        GROUP BY toStartOfMonth(CAST(ts AS DATE)), toYYYYMM(CAST(ts AS DATE))
        ORDER BY mo""")
    },
    Some("""
      SELECT CAST(date_trunc('month', CAST(ts AS DATE)) AS DATE) AS mo,
             CAST(strftime(CAST(ts AS DATE), '%Y%m') AS BIGINT) AS yyyymm,
             CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchases,
             round(sum(CASE WHEN event_type = 'purchase' THEN value END), 2) AS purchase_value,
             round(avg(CASE WHEN event_type = 'view' THEN value END), 4) AS avg_view_value
      FROM events
      GROUP BY 1, 2 ORDER BY 1"""))

  // ---------------------------------------------------------------------
  // CH `uniq` (HLL-approximate distinct). An approximate value has no
  // exact oracle, so the entry verifies the CONTRACT instead: the Spark
  // side emits a flag that `uniq` landed within ±10% of `uniqExact`
  // (double the sketch's 5% target rsd) and the oracle asserts the flag
  // is 1 for every group — the hash matches iff the band held on real
  // data. ChFunctionsSpec additionally asserts the band corpus-wide.
  val q53ChUniqBand = QueryDef(
    "q53_ch_uniq_band",
    (s, dir) => {
      Graft.table(s, dir, "events").createOrReplaceTempView("events_all_v")
      s.sql("""
        SELECT event_type,
               uniqExact(user_id) AS exact_users,
               toInt64(if(abs(uniq(user_id) - uniqExact(user_id))
                          <= 0.1D * uniqExact(user_id), 1L, 0L)) AS uniq_in_band
        FROM events_all_v
        GROUP BY event_type
        ORDER BY event_type""")
    },
    Some("""
      SELECT event_type,
             CAST(count(DISTINCT user_id) AS BIGINT) AS exact_users,
             CAST(1 AS BIGINT) AS uniq_in_band
      FROM events GROUP BY 1 ORDER BY 1"""))

  // ---------------------------------------------------------------------
  // The everyday CH aggregate/date vocabulary beyond the reference's own
  // two queries: argMax ("value at latest"), median (= quantile(0.5),
  // the same exact interpolated quantile as DuckDB's quantile_cont),
  // groupUniqArray (+ arraySort for reproducible output — collection
  // order is nondeterministic under parallelism in CH-distributed and
  // Spark alike), and the toYYYYMMDD/toDayOfWeek/toHour family
  // (toDayOfWeek remapped to CH's ISO Monday=1 from Spark's Sunday=1).
  // argMax determinism: (event_type, µs) is unique in this corpus, so
  // the max-ts row per group is unique (checked at all three SFs).
  val q55ChAggVocabulary = QueryDef(
    "q55_ch_agg_vocabulary",
    (s, dir) => {
      Graft.table(s, dir, "events").createOrReplaceTempView("events_all_v")
      s.sql("""
        SELECT event_type,
               toYYYYMMDD(min(CAST(ts AS DATE))) AS first_day,
               toDayOfWeek(min(CAST(ts AS DATE))) AS first_dow,
               toHour(min(ts)) AS first_hour,
               argMax(user_id, ts) AS last_user,
               argMin(user_id, ts) AS first_user,
               round(median(value), 4) AS med_value,
               array_join(arraySort(groupUniqArray(CAST(user_id % 10 AS STRING))), ',') AS buckets
        FROM events_all_v
        GROUP BY event_type
        ORDER BY event_type""")
    },
    Some("""
      SELECT event_type,
             CAST(strftime(min(CAST(ts AS DATE)), '%Y%m%d') AS BIGINT) AS first_day,
             CAST(isodow(min(CAST(ts AS DATE))) AS BIGINT) AS first_dow,
             CAST(hour(min(ts)) AS BIGINT) AS first_hour,
             arg_max(user_id, ts) AS last_user,
             arg_min(user_id, ts) AS first_user,
             round(quantile_cont(value, 0.5), 4) AS med_value,
             array_to_string(list_sort(list_distinct(list(CAST(user_id % 10 AS VARCHAR)))), ',') AS buckets
      FROM events GROUP BY 1 ORDER BY 1"""))

  // ---------------------------------------------------------------------
  // arrayJoin — CH's row-expanding function (its explode) — composed
  // with splitByChar: the canonical CH word-count. arrayJoin drops
  // rows whose array is empty, exactly like explode; split keeps empty
  // tokens (both engines split the same way), so counts match to the
  // token.
  val q56ChArrayJoin = QueryDef(
    "q56_ch_arrayjoin_wordcount",
    (s, dir) => {
      Graft.table(s, dir, "documents").createOrReplaceTempView("documents_v")
      s.sql("""
        SELECT tok, toInt64(count(1)) AS n
        FROM (SELECT arrayJoin(splitByChar(' ', text)) AS tok
              FROM documents_v)
        GROUP BY tok
        ORDER BY n DESC, tok
        LIMIT 20""")
    },
    Some("""
      SELECT tok, CAST(count(1) AS BIGINT) AS n
      FROM (SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
      GROUP BY tok ORDER BY n DESC, tok LIMIT 20"""))

  // ---------------------------------------------------------------------
  // CH query TEXT fidelity: parameterized quantiles
  // (`quantileExact(L)(x)` — the CH parameterized-aggregate call
  // shape), PREWHERE (CH's manual pushdown split; Spark's optimizer
  // already pushes, so it folds into WHERE) and a SETTINGS clause
  // (dropped — engine tuning with no Spark counterpart), all through
  // the injected parser, verbatim over the events table.
  val q60ChQuantilePrewhere = QueryDef(
    "q60_ch_quantile_prewhere",
    (s, dir) => {
      Graft.table(s, dir, "events").createOrReplaceTempView("events_all_v")
      s.sql("""
        SELECT event_type,
               round(quantileExact(0.5)(value), 4) AS p50,
               round(quantile(0.9)(value), 4) AS p90,
               toInt64(count(1)) AS n
        FROM events_all_v
        PREWHERE value > 0
        GROUP BY event_type
        ORDER BY event_type
        SETTINGS max_threads=8""")
    },
    Some("""
      SELECT event_type,
             round(quantile_cont(value, 0.5), 4) AS p50,
             round(quantile_cont(value, 0.9), 4) AS p90,
             CAST(count(1) AS BIGINT) AS n
      FROM events WHERE value > 0
      GROUP BY 1 ORDER BY 1"""))

  // ---------------------------------------------------------------------
  // CH `LIMIT n BY key` as VERBATIM SQL TEXT through the injected
  // parser: the clause is stripped, the reduced text parses, and a
  // marker node expands to window-rank + filter during analysis
  // (plans/ChClauses.scala). Same relation and oracle as q62's
  // combinator form — two front-ends, one semantic.
  val q67ChLimitBySql = QueryDef(
    "q67_ch_limit_by_sql",
    (s, dir) => {
      Graft.table(s, dir, "events").createOrReplaceTempView("events_lb_v")
      s.sql("""
        SELECT event_type, event_id, unix_micros(ts) AS t
        FROM events_lb_v
        ORDER BY event_type, t, event_id
        LIMIT 3 BY event_type""")
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
  // CH `ORDER BY d WITH FILL FROM a TO b` as VERBATIM SQL TEXT: missing
  // calendar days materialize with CH TYPE DEFAULTS (count column fills
  // with 0), TO exclusive per CH. The expansion (ChClauseRule) is the
  // same broadcast-anti-join-union shape as withFillDates — the data
  // side is never reshuffled for the fill.
  val q68ChWithFillSql = QueryDef(
    "q68_ch_with_fill_sql",
    (s, dir) => {
      Graft.table(s, dir, "events").createOrReplaceTempView("events_wf_v")
      s.sql("""
        SELECT CAST(ts AS DATE) AS day, toInt64(count(1)) AS n
        FROM events_wf_v
        WHERE event_id % 97 = 0
        GROUP BY day
        ORDER BY day WITH FILL FROM DATE '2024-01-01' TO DATE '2024-01-31'""")
    },
    Some("""
      WITH axis AS (
        SELECT CAST(gs.d AS DATE) AS day
        FROM generate_series(DATE '2024-01-01', DATE '2024-01-30',
                             INTERVAL 1 DAY) gs(d)
      ), sparse AS (
        SELECT CAST(ts AS DATE) AS day, CAST(count(1) AS BIGINT) AS n
        FROM events WHERE event_id % 97 = 0
        GROUP BY 1
      )
      SELECT day, coalesce(sparse.n, 0) AS n
      FROM axis FULL JOIN sparse USING (day)
      ORDER BY day"""))

  // ---------------------------------------------------------------------
  // CH `windowFunnel(window)(ts, cond…)` as verbatim dialect SQL (the
  // parameterized call flattens through the TotalsParser): per user,
  // the deepest view→click→purchase chain with every step within 2 h
  // of the chain's start, then the level distribution over users. The
  // oracle replays the same per-user chain with WINDOW functions —
  // valid because promoted chain-start times are MONOTONE over the
  // event order (a later cond1 restart never has an earlier start), so
  // the fold state at any event equals a running max over 1-PRECEDING
  // rows: w1 = latest cond1 time (= fold t0), p1 = that start when a
  // cond2 event lands inside the window (= fold t1 assignments), m1 =
  // running max of p1 (= fold t1), p2 likewise for cond3. Tie order
  // (t, c0, c1, c2) mirrors the Spark-side struct sort. (A DuckDB 1.0
  // list_reduce formulation was rejected: its lambda accumulator
  // leaks state across rows under vectorized execution.)
  val q78WindowFunnel = QueryDef(
    "q78_window_funnel",
    (s, dir) => {
      Graft.table(s, dir, "events").createOrReplaceTempView("events_all_v")
      s.sql("""
        SELECT lvl, toInt64(count(1)) AS n_users FROM (
          SELECT user_id,
                 windowFunnel(7200)(ts,
                   event_type = 'view',
                   event_type = 'click',
                   event_type = 'purchase') AS lvl
          FROM events_all_v GROUP BY user_id
        ) GROUP BY lvl ORDER BY lvl""")
    },
    Some("""
      WITH e AS (
        SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS t,
               coalesce(event_type = 'view', false) AS c0,
               coalesce(event_type = 'click', false) AS c1,
               coalesce(event_type = 'purchase', false) AS c2
        FROM events
      ), a AS (
        SELECT *, max(CASE WHEN c0 THEN t END) OVER
          (PARTITION BY user_id ORDER BY t, c0, c1, c2
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS w1
        FROM e
      ), b AS (
        SELECT *, CASE WHEN c1 AND w1 IS NOT NULL AND t <= w1 + 7200
                       THEN w1 END AS p1 FROM a
      ), c AS (
        SELECT *, max(p1) OVER
          (PARTITION BY user_id ORDER BY t, c0, c1, c2
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS m1
        FROM b
      ), d AS (
        SELECT *, CASE WHEN c2 AND m1 IS NOT NULL AND t <= m1 + 7200
                       THEN m1 END AS p2 FROM c
      ), lv AS (
        SELECT user_id,
               CASE WHEN bool_or(p2 IS NOT NULL) THEN 3
                    WHEN bool_or(p1 IS NOT NULL) THEN 2
                    WHEN bool_or(c0) THEN 1 ELSE 0 END AS lvl
        FROM d GROUP BY 1
      )
      SELECT lvl, CAST(count(1) AS BIGINT) AS n_users
      FROM lv GROUP BY 1 ORDER BY 1"""))

  // ---------------------------------------------------------------------
  // The CH URL-function family (protocol/domain/domainWithoutWWW/
  // topLevelDomain/firstSignificantSubdomain/port/path/pathFull/
  // queryString/fragment/extractURLParameter/cutQueryString) — the
  // idiomatic Metrica vocabulary over page/referrer URL columns
  // (ddl/hits.sql:11,13, ddl/visits.sql:14). The corpus is a
  // deterministic URL per document covering every structural case
  // (scheme present/absent, userinfo, www, multi-label com.tr domains,
  // port, empty path, query params, fragment); the oracle rebuilds the
  // same URLs and re-extracts with the same anchored-strip regexes.
  // All combinators are native regexp expressions — one codegen'd
  // projection, no UDFs, no shuffle before the final orderBy.
  val q74ChUrlFuncs = QueryDef(
    "q74_ch_url_funcs",
    (s, dir) => {
      import org.apache.spark.sql.functions._
      import graft.functions.url
      val id = col("doc_id")
      val u = concat(
        when(pmod(id, lit(3)) === 0, "https://")
          .when(pmod(id, lit(3)) === 1, "http://").otherwise(""),
        when(pmod(id, lit(7)) === 0,
          concat(lit("u"), pmod(id, lit(5)).cast("string"), lit("@")))
          .otherwise(""),
        when(pmod(id, lit(5)) === 0, "www.example.com")
          .when(pmod(id, lit(5)) === 1, "news.portal.com.tr")
          .when(pmod(id, lit(5)) === 2, "metrica.yandex.ru")
          .when(pmod(id, lit(5)) === 3, "blog.example.org")
          .otherwise("cdn.io"),
        when(pmod(id, lit(4)) === 0, ":8080").otherwise(""),
        when(pmod(id, lit(9)) === 0, "").otherwise(concat(
          lit("/sec"), pmod(id, lit(11)).cast("string"),
          lit("/page"), pmod(id, lit(13)).cast("string"), lit(".html"))),
        when(pmod(id, lit(2)) === 0, concat(
          lit("?utm_source=s"), pmod(id, lit(3)).cast("string"),
          lit("&page="), pmod(id, lit(7)).cast("string"))).otherwise(""),
        when(pmod(id, lit(6)) === 0,
          concat(lit("#c"), pmod(id, lit(4)).cast("string"))).otherwise(""))
      Graft.table(s, dir, "documents")
        .select(id, u.as("url"))
        .select(id, col("url"),
          url.protocol(col("url")).as("proto"),
          url.domain(col("url")).as("dom"),
          url.domainWithoutWWW(col("url")).as("dom_nw"),
          url.topLevelDomain(col("url")).as("tld"),
          url.firstSignificantSubdomain(col("url")).as("fsd"),
          url.port(col("url")).as("prt"),
          url.path(col("url")).as("pth"),
          url.pathFull(col("url")).as("pfull"),
          url.queryString(col("url")).as("qs"),
          url.fragment(col("url")).as("frag"),
          url.extractURLParameter(col("url"), "utm_source").as("utm"),
          url.cutQueryString(col("url")).as("cut_qs"))
        .orderBy(id).limit(60)
    },
    Some("""
      WITH u AS (
        SELECT doc_id,
          (CASE doc_id % 3 WHEN 0 THEN 'https://' WHEN 1 THEN 'http://' ELSE '' END)
          || (CASE WHEN doc_id % 7 = 0 THEN 'u' || CAST(doc_id % 5 AS VARCHAR) || '@' ELSE '' END)
          || (CASE doc_id % 5 WHEN 0 THEN 'www.example.com' WHEN 1 THEN 'news.portal.com.tr'
               WHEN 2 THEN 'metrica.yandex.ru' WHEN 3 THEN 'blog.example.org' ELSE 'cdn.io' END)
          || (CASE WHEN doc_id % 4 = 0 THEN ':8080' ELSE '' END)
          || (CASE WHEN doc_id % 9 = 0 THEN '' ELSE '/sec' || CAST(doc_id % 11 AS VARCHAR) || '/page' || CAST(doc_id % 13 AS VARCHAR) || '.html' END)
          || (CASE WHEN doc_id % 2 = 0 THEN '?utm_source=s' || CAST(doc_id % 3 AS VARCHAR) || '&page=' || CAST(doc_id % 7 AS VARCHAR) ELSE '' END)
          || (CASE WHEN doc_id % 6 = 0 THEN '#c' || CAST(doc_id % 4 AS VARCHAR) ELSE '' END)
          AS url
        FROM documents
      ), s AS (
        SELECT doc_id, url,
          regexp_replace(regexp_replace(url, '^[A-Za-z][A-Za-z0-9+.-]*://', ''),
                         '^[^/@?#]*@', '') AS rest
        FROM u
      ), x AS (
        SELECT doc_id, url, rest,
          regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1) AS proto,
          regexp_extract(rest, '^([^/:?#]+)', 1) AS dom
        FROM s
      ), y AS (
        SELECT *, string_split(dom, '.') AS parts FROM x
      )
      SELECT doc_id, url, proto, dom,
        regexp_replace(dom, '^www\.', '') AS dom_nw,
        regexp_extract(dom, '\.([^.]+)$', 1) AS tld,
        CASE WHEN len(parts) >= 3 AND parts[-2] IN ('com','net','org','co') THEN parts[-3]
             WHEN len(parts) >= 2 THEN parts[-2] ELSE '' END AS fsd,
        CAST(CASE WHEN regexp_extract(rest, '^[^/:?#]+:([0-9]+)', 1) = '' THEN '0'
                  ELSE regexp_extract(rest, '^[^/:?#]+:([0-9]+)', 1) END AS INTEGER) AS prt,
        regexp_extract(rest, '^[^/?#]*(/[^?#]*)', 1) AS pth,
        regexp_extract(rest, '^[^/?#]*(/.*)$', 1) AS pfull,
        regexp_extract(url, '\?([^#]*)', 1) AS qs,
        regexp_extract(url, '#(.*)$', 1) AS frag,
        regexp_extract(url, '[?&]utm_source=([^&#]*)', 1) AS utm,
        regexp_extract(url, '^([^?#]*)', 1) || regexp_extract(url, '(#.*)$', 1) AS cut_qs
      FROM y ORDER BY doc_id LIMIT 60"""))

  // ---------------------------------------------------------------------
  // CH `SAMPLE f` as verbatim SQL over a binding whose schema declares
  // the sample key as field metadata — the engine's analogue of the
  // DDLs' `SAMPLE BY CounterUserIDHash` (ddl/hits.sql:119,
  // ddl/visits.sql:239). The ChSample rule pushes the deterministic
  // hash-prefix filter down to the SCAN (before the aggregate), and
  // the portable-hash stamp makes the subset replicable in the oracle:
  // both engines keep rows with knuth_hash(user_id) in the bottom 30%
  // of hash space, so counts/sums/uniques hash-match exactly.
  val q79ChSampleSql = QueryDef(
    "q79_ch_sample_sql",
    (s, dir) => {
      import org.apache.spark.sql.types._
      val keyMd = new MetadataBuilder()
        .putBoolean("graft.sampleKey", true)
        .putBoolean("graft.samplePortable", true).build()
      val schema = StructType(Seq(
        StructField("event_id", LongType),
        StructField("ts", LongType), // raw nanos; unused here
        StructField("user_id", LongType, nullable = true, keyMd),
        StructField("event_type", StringType),
        StructField("value", DoubleType),
        StructField("props", StringType)))
      graft.sources.Catalog.register(s, graft.sources.Binding(
        "events_sampled", s"$dir/events.parquet", schema = Some(schema)))
      s.sql("""
        SELECT event_type, toInt64(count(1)) AS n,
               uniqExact(user_id) AS users,
               round(sum(value), 2) AS value_sum
        FROM events_sampled SAMPLE 0.3
        GROUP BY event_type ORDER BY event_type""")
    },
    Some("""
      SELECT event_type, CAST(count(1) AS BIGINT) AS n,
             CAST(count(DISTINCT user_id) AS BIGINT) AS users,
             round(sum(value), 2) AS value_sum
      FROM events
      WHERE (user_id % 65536) * 2654435761 % 4294967296 < 1288490188
      GROUP BY 1 ORDER BY 1"""))

  // ---------------------------------------------------------------------
  // CH `SAMPLE f OFFSET o` — the parallel-workers form: the kept hash
  // window shifts to [o, o+f), so workers at disjoint offsets read
  // DISJOINT deterministic subsets (property-tested in ParserProps).
  // Verbatim SQL over the q79 sample-key binding; the oracle replays
  // the shifted portable-hash window.
  val q172ChSampleOffset = QueryDef(
    "q172_ch_sample_offset",
    (s, dir) => {
      import org.apache.spark.sql.types._
      val keyMd = new MetadataBuilder()
        .putBoolean("graft.sampleKey", true)
        .putBoolean("graft.samplePortable", true).build()
      val schema = StructType(Seq(
        StructField("event_id", LongType),
        StructField("ts", LongType), // raw int64; unused here
        StructField("user_id", LongType, nullable = true, keyMd),
        StructField("event_type", StringType),
        StructField("value", DoubleType),
        StructField("props", StringType)))
      graft.sources.Catalog.register(s, graft.sources.Binding(
        "events_sampled_o", s"$dir/events.parquet", schema = Some(schema)))
      s.sql("""
        SELECT event_type, toInt64(count(1)) AS n,
               uniqExact(user_id) AS users,
               round(sum(value), 2) AS value_sum
        FROM events_sampled_o SAMPLE 0.3 OFFSET 0.5
        GROUP BY event_type ORDER BY event_type""")
    },
    Some("""
      SELECT event_type, CAST(count(1) AS BIGINT) AS n,
             CAST(count(DISTINCT user_id) AS BIGINT) AS users,
             round(sum(value), 2) AS value_sum
      FROM events
      WHERE (user_id % 65536) * 2654435761 % 4294967296 >= 2147483648
        AND (user_id % 65536) * 2654435761 % 4294967296 < 3435973836
      GROUP BY 1 ORDER BY 1"""))

  // ---------------------------------------------------------------------
  // CH JSON extraction (JSONExtractInt/Float/String, JSONHas, and the
  // legacy Metrica visitParam* spellings) over the events `props` JSON
  // column — the params-column access pattern of the visits table.
  // CH's default-on-miss contract ('' / 0, never NULL) is exercised by
  // the 'missing' key; the float average stays order-independent
  // because the values are small integers (exact in double).
  val q82ChJsonFuncs = QueryDef(
    "q82_ch_json_funcs",
    (s, dir) => {
      Graft.table(s, dir, "events").createOrReplaceTempView("events_all_v")
      s.sql("""
        SELECT event_type,
               toInt64(sum(JSONExtractInt(props, 'k'))) AS k_sum,
               toInt64(sum(visitParamHas(props, 'k'))) AS n_with_k,
               toInt64(sum(JSONHas(props, 'missing'))) AS n_with_missing,
               toInt64(sum(JSONExtractInt(props, 'missing'))) AS miss_sum,
               round(avg(JSONExtractFloat(props, 'k')), 4) AS k_avg,
               min(visitParamExtractString(props, 'k')) AS k_min_str
        FROM events_all_v
        GROUP BY event_type ORDER BY event_type""")
    },
    Some("""
      SELECT event_type,
             CAST(sum(coalesce(CAST(json_extract(props, '$.k') AS BIGINT), 0))
               AS BIGINT) AS k_sum,
             CAST(sum(CASE WHEN json_extract(props, '$.k') IS NOT NULL
                           THEN 1 ELSE 0 END) AS BIGINT) AS n_with_k,
             CAST(sum(CASE WHEN json_extract(props, '$.missing') IS NOT NULL
                           THEN 1 ELSE 0 END) AS BIGINT) AS n_with_missing,
             CAST(sum(coalesce(CAST(json_extract(props, '$.missing') AS BIGINT),
               0)) AS BIGINT) AS miss_sum,
             round(avg(coalesce(CAST(json_extract(props, '$.k') AS DOUBLE),
               0.0)), 4) AS k_avg,
             min(coalesce(json_extract_string(props, '$.k'), '')) AS k_min_str
      FROM events GROUP BY 1 ORDER BY 1"""))

  // ---------------------------------------------------------------------
  // The remaining CH date/time + conditional-aggregate vocabulary:
  // toStartOfMonth/Day, toYear/Quarter/Month/DayOfMonth, dateDiff
  // (Spark's builtin shares CH's argument order; the unit is the bare
  // keyword where CH quotes it), addDays, minIf/maxIf. Monthly rollup
  // over events with purchase-gated min/max buyer ids.
  val q83ChDateVocab = QueryDef(
    "q83_ch_date_vocab",
    (s, dir) => {
      Graft.table(s, dir, "events").createOrReplaceTempView("events_all_v")
      s.sql("""
        SELECT toStartOfMonth(CAST(ts AS DATE)) AS mon,
               addDays(toStartOfMonth(CAST(ts AS DATE)), 10) AS mon_plus10,
               toInt64(count(1)) AS n,
               minIf(user_id, event_type = 'purchase') AS min_buyer,
               maxIf(user_id, event_type = 'purchase') AS max_buyer,
               toInt64(dateDiff(day, min(CAST(ts AS DATE)),
                                max(CAST(ts AS DATE)))) AS span_days,
               toInt64(max(toDayOfMonth(CAST(ts AS DATE)))) AS max_dom,
               toInt64(min(toYear(CAST(ts AS DATE)))) AS yr,
               toInt64(min(toQuarter(CAST(ts AS DATE)))) AS qtr,
               CAST(toStartOfDay(min(ts)) AS DATE) AS first_day
        FROM events_all_v
        GROUP BY toStartOfMonth(CAST(ts AS DATE))
        ORDER BY mon""")
    },
    Some("""
      WITH g AS (
        SELECT CAST(date_trunc('month', CAST(ts AS DATE)) AS DATE) AS mon,
               CAST(count(1) AS BIGINT) AS n,
               min(user_id) FILTER (event_type = 'purchase') AS min_buyer,
               max(user_id) FILTER (event_type = 'purchase') AS max_buyer,
               CAST(date_diff('day', min(CAST(ts AS DATE)),
                              max(CAST(ts AS DATE))) AS BIGINT) AS span_days,
               CAST(max(date_part('day', CAST(ts AS DATE))) AS BIGINT) AS max_dom,
               CAST(min(date_part('year', CAST(ts AS DATE))) AS BIGINT) AS yr,
               CAST(min(date_part('quarter', CAST(ts AS DATE))) AS BIGINT) AS qtr,
               CAST(min(ts) AS DATE) AS first_day
        FROM events GROUP BY 1
      )
      SELECT mon, CAST(mon + INTERVAL 10 DAY AS DATE) AS mon_plus10,
             n, min_buyer, max_buyer, span_days, max_dom, yr, qtr, first_day
      FROM g ORDER BY mon"""))

  // ---------------------------------------------------------------------
  // CH `sumMap(keys, values)` — the ParsedParams parallel-array rollup
  // (ddl/visits.sql:130-140): per group, zip the key/value arrays of
  // every row and sum values per key, returning aligned sorted arrays.
  // Synthetic parallel arrays (two keys per event, including same-key
  // collisions within one row when id%3 == id%5) exercise the
  // in-row-merge path; the oracle zips with positional unnest.
  val q84ChSumMap = QueryDef(
    "q84_ch_summap",
    (s, dir) => {
      Graft.table(s, dir, "events").createOrReplaceTempView("events_all_v")
      s.sql("""
        SELECT event_type,
               array_join(sm.keys, ',') AS keys,
               array_join(CAST(sm.sums AS ARRAY<STRING>), ',') AS sums
        FROM (
          SELECT event_type,
                 sumMap(array(concat('k', CAST(event_id % 3 AS STRING)),
                              concat('k', CAST(event_id % 5 AS STRING))),
                        array(event_id % 7, event_id % 11)) AS sm
          FROM events_all_v GROUP BY event_type
        ) ORDER BY event_type""")
    },
    Some("""
      WITH p AS (
        SELECT event_type,
               unnest(['k' || CAST(event_id % 3 AS VARCHAR),
                       'k' || CAST(event_id % 5 AS VARCHAR)]) AS k,
               unnest([event_id % 7, event_id % 11]) AS v
        FROM events
      ), g AS (
        SELECT event_type, k, CAST(sum(v) AS BIGINT) AS s
        FROM p GROUP BY 1, 2
      )
      SELECT event_type,
             string_agg(k, ',' ORDER BY k) AS keys,
             string_agg(CAST(s AS VARCHAR), ',' ORDER BY k) AS sums
      FROM g GROUP BY 1 ORDER BY 1"""))

  // ---------------------------------------------------------------------
  // CH sequence aggregates + capped/top-frequency distincts in one
  // dialect round-trip: sequenceMatch / sequenceCount (regex over the
  // time-ordered matched-event encoding), uniqUpTo(N) (exact count
  // capped at N+1) and topK(k) (exact most-frequent, value tie-break).
  // The oracle rebuilds the same event encoding with string_agg and
  // runs the same regex; chars A..G encode the 3-condition bitmask
  // (view=1, click=2, purchase=4), so (?1)=[ACEG], (?2)=[BCFG],
  // (?3)=[DEFG].
  val q85ChSequence = QueryDef(
    "q85_ch_sequence",
    (s, dir) => {
      Graft.table(s, dir, "events").createOrReplaceTempView("events_all_v")
      s.sql("""
        SELECT u,
               sequenceMatch('(?1).*(?2).*(?3)')(ts,
                 event_type = 'view', event_type = 'click',
                 event_type = 'purchase') AS sm,
               sequenceCount('(?1)(?2)')(ts,
                 event_type = 'view', event_type = 'click',
                 event_type = 'purchase') AS sc,
               uniqUpTo(3)(event_type) AS uut,
               array_join(topK(2)(event_type), ',') AS top2
        FROM (SELECT user_id % 17 AS u, ts, event_type FROM events_all_v)
        GROUP BY u ORDER BY u""")
    },
    Some("""
      WITH f AS (
        SELECT user_id % 17 AS u, ts, event_type,
               (CASE WHEN event_type = 'view' THEN 1 ELSE 0 END
                + CASE WHEN event_type = 'click' THEN 2 ELSE 0 END
                + CASE WHEN event_type = 'purchase' THEN 4 ELSE 0 END) AS b
        FROM events
      ), s AS (
        SELECT u, string_agg(substr('ABCDEFG', b, 1), '' ORDER BY ts, b) AS str
        FROM f WHERE b > 0 GROUP BY 1
      ), k AS (
        SELECT u, event_type, count(1) AS cnt FROM f GROUP BY 1, 2
      ), r AS (
        SELECT u, event_type,
               row_number() OVER (PARTITION BY u
                                  ORDER BY cnt DESC, event_type) AS rn
        FROM k
      ), t AS (
        SELECT u, string_agg(event_type, ',' ORDER BY rn) AS top2
        FROM r WHERE rn <= 2 GROUP BY 1
      ), uu AS (
        SELECT u, CAST(least(count(DISTINCT event_type), 4) AS BIGINT) AS uut
        FROM f GROUP BY 1
      )
      SELECT s.u,
             CAST(CASE WHEN regexp_matches(s.str,
               '[ACEG].*?[BCFG].*?[DEFG]') THEN 1 ELSE 0 END AS BIGINT) AS sm,
             CAST(len(regexp_extract_all(s.str, '[ACEG][BCFG]')) AS BIGINT) AS sc,
             uu.uut, t.top2
      FROM s JOIN uu USING (u) JOIN t USING (u)
      ORDER BY u"""))

  // ---------------------------------------------------------------------
  // Metrica report bucketing: roundDuration (session-length buckets),
  // roundAge (demographics), roundToExp2 (log-scale counts), roundDown
  // (explicit bucket array). The oracle reproduces each as an explicit
  // CASE ladder — for roundToExp2 the input domain [1, 1000] makes the
  // power list finite, so no cross-engine log2 edge exists.
  val q86ChRounding = QueryDef(
    "q86_ch_rounding",
    (s, dir) => {
      Graft.table(s, dir, "events").createOrReplaceTempView("events_all_v")
      s.sql("""
        SELECT roundDuration(CAST(event_id % 4000 AS INT)) AS dur,
               roundAge(CAST(user_id % 70 AS INT)) AS age,
               roundToExp2(CAST(event_id % 1000 + 1 AS INT)) AS e2,
               roundDown(value, array(0.0D, 5.0D, 20.0D, 100.0D)) AS vb,
               count(1) AS n
        FROM events_all_v
        GROUP BY 1, 2, 3, 4 ORDER BY 1, 2, 3, 4""")
    },
    Some("""
      WITH b AS (
        SELECT CASE WHEN d < 1 THEN 0 WHEN d < 10 THEN 1 WHEN d < 30 THEN 10
                    WHEN d < 60 THEN 30 WHEN d < 120 THEN 60
                    WHEN d < 180 THEN 120 WHEN d < 240 THEN 180
                    WHEN d < 300 THEN 240 WHEN d < 600 THEN 300
                    WHEN d < 1200 THEN 600 WHEN d < 1800 THEN 1200
                    WHEN d < 3600 THEN 1800 ELSE 3600 END AS dur,
               CASE WHEN a < 1 THEN 0 WHEN a < 18 THEN 17 WHEN a < 25 THEN 18
                    WHEN a < 35 THEN 25 WHEN a < 45 THEN 35
                    WHEN a < 55 THEN 45 ELSE 55 END AS age,
               CASE WHEN x >= 512 THEN 512 WHEN x >= 256 THEN 256
                    WHEN x >= 128 THEN 128 WHEN x >= 64 THEN 64
                    WHEN x >= 32 THEN 32 WHEN x >= 16 THEN 16
                    WHEN x >= 8 THEN 8 WHEN x >= 4 THEN 4
                    WHEN x >= 2 THEN 2 ELSE 1 END AS e2,
               CASE WHEN value >= 100 THEN 100.0 WHEN value >= 20 THEN 20.0
                    WHEN value >= 5 THEN 5.0 ELSE 0.0 END AS vb
        FROM (SELECT event_id % 4000 AS d, user_id % 70 AS a,
                     event_id % 1000 + 1 AS x, value FROM events)
      )
      SELECT CAST(dur AS BIGINT) AS dur, CAST(age AS BIGINT) AS age,
             CAST(e2 AS BIGINT) AS e2, vb, CAST(count(1) AS BIGINT) AS n
      FROM b GROUP BY 1, 2, 3, 4 ORDER BY 1, 2, 3, 4"""))

  // ---------------------------------------------------------------------
  // IPv4 / bit / digest vocabulary: a synthetic UInt32 address per user
  // (knuth-hash modulo 2^32) rendered as dotted-quad, round-tripped
  // through IPv4StringToNum (rt counts successes — the oracle
  // re-parses its own rendering the same way), bit-mixing over
  // event_id, and the base64/MD5/SHA256 digests of the group key.
  val q87ChIpBits = QueryDef(
    "q87_ch_ip_bits",
    (s, dir) => {
      Graft.table(s, dir, "events").createOrReplaceTempView("events_all_v")
      s.sql("""
        SELECT event_type,
               base64Encode(event_type) AS b64,
               hex(MD5(event_type)) AS md5h,
               hex(SHA256(event_type)) AS sh2,
               ip_min, rt, bx, n
        FROM (
          SELECT event_type,
                 min(IPv4NumToString(n32)) AS ip_min,
                 CAST(sum(IF(IPv4StringToNum(IPv4NumToString(n32)) = n32,
                             1, 0)) AS BIGINT) AS rt,
                 CAST(sum(bitXor(bitAnd(event_id, 255),
                     bitShiftLeft(bitTest(event_id, 3), 7))) AS BIGINT) AS bx,
                 count(1) AS n
          FROM (SELECT event_type, event_id,
                       (user_id * 2654435761) % 4294967296 AS n32
                FROM events_all_v)
          GROUP BY event_type
        ) ORDER BY event_type""")
    },
    Some("""
      WITH src AS (
        SELECT event_type, event_id,
               (user_id * 2654435761) % 4294967296 AS n32
        FROM events
      ), ip AS (
        SELECT event_type, event_id, n32,
               CAST(n32 // 16777216 AS VARCHAR) || '.' ||
               CAST((n32 // 65536) % 256 AS VARCHAR) || '.' ||
               CAST((n32 // 256) % 256 AS VARCHAR) || '.' ||
               CAST(n32 % 256 AS VARCHAR) AS ips
        FROM src
      ), g AS (
        SELECT event_type, min(ips) AS ip_min,
               CAST(sum(CASE WHEN
                 CAST(split_part(ips, '.', 1) AS BIGINT) * 16777216 +
                 CAST(split_part(ips, '.', 2) AS BIGINT) * 65536 +
                 CAST(split_part(ips, '.', 3) AS BIGINT) * 256 +
                 CAST(split_part(ips, '.', 4) AS BIGINT) = n32
                 THEN 1 ELSE 0 END) AS BIGINT) AS rt,
               CAST(sum(xor(event_id & 255,
                 CASE WHEN (event_id >> 3) & 1 = 1 THEN 128 ELSE 0 END))
                 AS BIGINT) AS bx,
               CAST(count(1) AS BIGINT) AS n
        FROM ip GROUP BY 1
      )
      SELECT event_type,
             base64(CAST(event_type AS BLOB)) AS b64,
             upper(md5(event_type)) AS md5h,
             upper(sha256(event_type)) AS sh2,
             ip_min, rt, bx, n
      FROM g ORDER BY event_type"""))

  // ---------------------------------------------------------------------
  // CH string vocabulary over the events props JSON text: position /
  // match / countSubstrings / replaceRegexpAll / extract-with-group /
  // replaceOne / multiSearchAny / pads+trims, aggregated per
  // event_type. The oracle rebuilds each from DuckDB's spellings
  // (strpos, regexp_matches, first-occurrence regexp_replace, ...).
  val q88ChStrings = QueryDef(
    "q88_ch_strings",
    (s, dir) => {
      Graft.table(s, dir, "events").createOrReplaceTempView("events_all_v")
      s.sql("""
        SELECT event_type,
               CAST(sum(position(props, '9')) AS BIGINT) AS sp,
               CAST(sum(match(props, '[0-9]{2}')) AS BIGINT) AS m2,
               CAST(sum(countSubstrings(props, '9')) AS BIGINT) AS c9,
               CAST(sum(lengthUTF8(replaceRegexpAll(props, '[0-9]', 'x')))
                 AS BIGINT) AS lrep,
               min(replaceOne(event_type, 'e', 'E')) AS rone,
               max(extract(props, '"k": ([0-9]+)')) AS ex1,
               CAST(sum(multiSearchAny(event_type, array('ck', 'rr', 'zz')))
                 AS BIGINT) AS msa,
               min(concat(leftPad(event_type, 10, '_'),
                          trimBoth('  x  '))) AS pads
        FROM events_all_v GROUP BY event_type ORDER BY event_type""")
    },
    Some("""
      SELECT event_type,
             CAST(sum(strpos(props, '9')) AS BIGINT) AS sp,
             CAST(sum(CASE WHEN regexp_matches(props, '[0-9]{2}')
                      THEN 1 ELSE 0 END) AS BIGINT) AS m2,
             CAST(sum(length(props) - length(replace(props, '9', '')))
               AS BIGINT) AS c9,
             CAST(sum(length(regexp_replace(props, '[0-9]', 'x', 'g')))
               AS BIGINT) AS lrep,
             min(regexp_replace(event_type, 'e', 'E')) AS rone,
             max(regexp_extract(props, '"k": ([0-9]+)', 1)) AS ex1,
             CAST(sum(CASE WHEN strpos(event_type, 'ck') > 0
                             OR strpos(event_type, 'rr') > 0
                             OR strpos(event_type, 'zz') > 0
                      THEN 1 ELSE 0 END) AS BIGINT) AS msa,
             min(lpad(event_type, 10, '_') || 'x') AS pads
      FROM events GROUP BY event_type ORDER BY event_type"""))

  // ---------------------------------------------------------------------
  // CH statistical-aggregate vocabulary. The oracle recomputes the
  // moment family from DuckDB's builtins plus explicit central-moment
  // arithmetic for skewPop/kurtPop (DuckDB's skewness/kurtosis are
  // sample-corrected, CH's *Pop are not). Doubles round on BOTH sides:
  // 6dp for the variance family, 3dp for the higher moments.
  //
  // `cr` was originally builtin `corr` rounded 6dp and flipped a round
  // half-boundary once in a full-surface run (the engines' different
  // co-moment accumulation orders differ by ULPs — the q137 flake
  // class, latent for seven rounds). It now runs corrStable over the
  // exactly-quantized value (2-decimal fixture → ×100 is integral):
  // both engines derive the SAME exact integers and apply the same
  // final IEEE ops, so the doubles are bit-identical before rounding.
  val q89ChStats = QueryDef(
    "q89_ch_stats",
    (s, dir) => {
      Graft.table(s, dir, "events").createOrReplaceTempView("events_all_v")
      s.sql("""
        SELECT event_type,
               round(stddevPop(value), 6) AS sdp,
               round(stddevSamp(value), 6) AS sds,
               round(varPop(value), 6) AS vp,
               round(varSamp(value), 6) AS vs,
               round(covarPop(value, user_id), 6) AS cvp,
               round(covarSamp(value, user_id), 6) AS cvs,
               round(corrStable(toInt64(round(value * 100)), user_id), 6)
                 AS cr,
               round(avgWeighted(value, user_id % 5 + 1), 6) AS aw,
               round(skewPop(value), 3) AS sk,
               round(kurtPop(value), 3) AS kt
        FROM events_all_v GROUP BY event_type ORDER BY event_type""")
    },
    Some("""
      WITH mu AS (
        SELECT event_type, avg(value) AS m FROM events GROUP BY 1
      ), cq AS (
        SELECT event_type, CAST(round(value * 100) AS BIGINT) AS xv,
               user_id AS yv
        FROM events
      ), cs AS (
        SELECT event_type, CAST(count(*) AS HUGEINT) AS n,
               CAST(sum(xv) AS HUGEINT) AS sx,
               CAST(sum(yv) AS HUGEINT) AS sy,
               CAST(sum(xv*yv) AS HUGEINT) AS sxy,
               CAST(sum(xv*xv) AS HUGEINT) AS sxx,
               CAST(sum(yv*yv) AS HUGEINT) AS syy
        FROM cq GROUP BY event_type
      ), cr AS (
        SELECT event_type,
               CASE WHEN n*sxx - sx*sx > 0 AND n*syy - sy*sy > 0
                    THEN CAST(n*sxy - sx*sy AS DOUBLE) /
                         sqrt(CAST(n*sxx - sx*sx AS DOUBLE) *
                              CAST(n*syy - sy*sy AS DOUBLE))
               END AS c
        FROM cs
      )
      SELECT e.event_type,
             round(stddev_pop(value), 6) AS sdp,
             round(stddev_samp(value), 6) AS sds,
             round(var_pop(value), 6) AS vp,
             round(var_samp(value), 6) AS vs,
             round(covar_pop(value, user_id), 6) AS cvp,
             round(covar_samp(value, user_id), 6) AS cvs,
             round(min(cr.c), 6) AS cr,
             round(sum(value * (user_id % 5 + 1)) / sum(user_id % 5 + 1), 6)
               AS aw,
             round(avg(power(value - m, 3))
                   / power(avg(power(value - m, 2)), 1.5), 3) AS sk,
             round(avg(power(value - m, 4))
                   / power(avg(power(value - m, 2)), 2.0), 3) AS kt
      FROM events e
      JOIN mu USING (event_type)
      JOIN cr USING (event_type)
      GROUP BY e.event_type ORDER BY e.event_type"""))

  // ---------------------------------------------------------------------
  // CH `ARRAY JOIN` CLAUSE as verbatim SQL — how every one of the
  // visits table's 164 array columns and 8 Nested groups is actually
  // queried (ddl/visits.sql:40-227; e.g. `ARRAY JOIN Goals`). The
  // parser rewrites the clause into a LATERAL VIEW generator at the
  // same FROM position: multiple items unroll in LOCKSTEP (one
  // arrays_zip + inline, never a cross product), and
  // `arrayEnumerate(arr) AS i` is CH's positional-index idiom. The
  // oracle unrolls the same zip with DuckDB's aligned multi-unnest.
  val q90ChArrayJoinSql = QueryDef(
    "q90_ch_array_join_sql",
    (s, dir) => {
      Graft.table(s, dir, "embeddings").createOrReplaceTempView("embeddings_v")
      s.sql("""
        SELECT label, toInt64(i) AS i, round(sum(e), 2) AS s,
               toInt64(count(1)) AS n,
               round(min(e), 5) AS mn, round(max(e), 5) AS mx
        FROM embeddings_v ARRAY JOIN embedding AS e, arrayEnumerate(embedding) AS i
        WHERE i <= 4
        GROUP BY label, i ORDER BY label, i""")
    },
    Some("""
      SELECT label, CAST(i AS BIGINT) AS i, round(sum(e), 2) AS s,
             CAST(count(1) AS BIGINT) AS n,
             round(min(e), 5) AS mn, round(max(e), 5) AS mx
      FROM (SELECT label, unnest(embedding) AS e,
                   unnest(generate_series(1, len(embedding))) AS i
            FROM embeddings)
      WHERE i <= 4
      GROUP BY label, i ORDER BY label, i"""))

  // ---------------------------------------------------------------------
  // CH `FROM t FINAL` as verbatim SQL — the read mode that applies
  // VersionedCollapsingMergeTree merge semantics at query time
  // (ddl/visits.sql:229-233): only the latest LIVE version of each
  // entity is visible. The engine clause travels as field metadata on
  // the binding's schema (graft.finalKey / finalVersion / finalSign),
  // and the ChFinal rule expands to the same latest-live-versions
  // relation Warehouse.compact materializes — one shuffle on the
  // entity key, per-key bounded state. Fixture: every click event's
  // v1 is cancelled by a -1 row and superseded by a v2 with doubled
  // value, so both the cancel and the update path are exercised.
  // built once per JVM per dir (pure function of the events table) so
  // a bench pass times the FINAL read, not the fixture write; the
  // first call per JVM still rebuilds from scratch, so a stale /tmp
  // dir from an earlier process can never be read
  private val q91Built = scala.collection.mutable.Set.empty[String]
  private val q91Lock = new Object

  val q91ChFinalSql = QueryDef(
    "q91_ch_final_sql",
    (s, dir) => {
      import org.apache.spark.sql.functions.{col, lit}
      import org.apache.spark.sql.types._
      // full-path cache key (basename alone would let two dirs with
      // the same basename share a stale fixture)
      val tmp = s"${sys.props("java.io.tmpdir")}/graft_final_q91_" +
        new java.io.File(dir).getName + "_" +
        java.lang.Integer.toHexString(new java.io.File(dir)
          .getAbsolutePath.hashCode)
      val bktTable = "graft_q91_versioned_" +
        java.lang.Integer.toHexString(tmp.hashCode)
      q91Lock.synchronized {
        if (!q91Built.contains(tmp)) {
          graft.FsUtil.rmTree(tmp)
          val base = s.read.parquet(s"$dir/events.parquet").select(
            col("event_id").as("eid"), lit(1L).as("ver"), lit(1).as("sign"),
            col("event_type"), col("value"))
          val cancels = base.filter(col("event_type") === "click")
            .withColumn("sign", lit(-1))
          val updates = base.filter(col("event_type") === "click")
            .withColumn("ver", lit(2L))
            .withColumn("value", col("value") * 2)
          // round 11 (verdict ask #7): the versioned warehouse is
          // BUCKETED on the collapse key — the
          // VersionedCollapsingMergeTree read (FINAL) windows over
          // eid, and a bucketed scan hands it HashPartitioning(eid)
          // so the collapse runs with NO Exchange below the window
          // (the X168/q259 lever applied to the Metrica hot path);
          // Round11Spec audits the plan
          graft.sources.Warehouse.writeBucketed(
            base.unionByName(cancels).unionByName(updates),
            bktTable, tmp, "eid", 32)
          q91Built += tmp
        }
      }
      val keyMd = new MetadataBuilder()
        .putBoolean("graft.finalKey", true).build()
      val verMd = new MetadataBuilder()
        .putBoolean("graft.finalVersion", true).build()
      val signMd = new MetadataBuilder()
        .putBoolean("graft.finalSign", true).build()
      val schema = StructType(Seq(
        StructField("eid", LongType, nullable = true, keyMd),
        StructField("ver", LongType, nullable = true, verMd),
        StructField("sign", IntegerType, nullable = true, signMd),
        StructField("event_type", StringType),
        StructField("value", DoubleType)))
      graft.sources.Catalog.register(s,
        graft.sources.Binding("events_versioned", tmp, schema = Some(schema),
          bucketTable = Some(bktTable)))
      s.sql("""
        SELECT event_type, toInt64(count(1)) AS n,
               toInt64(sum(ver)) AS ver_sum, round(sum(value), 2) AS v
        FROM events_versioned FINAL
        GROUP BY event_type ORDER BY event_type""")
    },
    bench = true,
    oracle = Some("""
      WITH base AS (
        SELECT event_id AS eid, 1 AS ver, 1 AS sign, event_type, value
        FROM events
      ), v AS (
        SELECT * FROM base
        UNION ALL
        SELECT eid, 1 AS ver, -1 AS sign, event_type, value
        FROM base WHERE event_type = 'click'
        UNION ALL
        SELECT eid, 2 AS ver, 1 AS sign, event_type, value * 2 AS value
        FROM base WHERE event_type = 'click'
      ), live AS (
        SELECT p.* FROM v p
        WHERE p.sign = 1 AND NOT EXISTS (
          SELECT 1 FROM v m
          WHERE m.sign = -1 AND m.eid = p.eid AND m.ver = p.ver)
      ), latest AS (
        SELECT eid, ver, event_type, value,
               row_number() OVER (PARTITION BY eid ORDER BY ver DESC) AS rn
        FROM live
      )
      SELECT event_type, CAST(count(1) AS BIGINT) AS n,
             CAST(sum(ver) AS BIGINT) AS ver_sum, round(sum(value), 2) AS v
      FROM latest WHERE rn = 1
      GROUP BY event_type ORDER BY event_type"""))

  // ---------------------------------------------------------------------
  // CH external-dictionary functions (dictGet / dictHas / typed
  // variants) — the Metrica-stack idiom for enriching facts with small
  // dimension attributes (CH answers RegionID lookups from in-RAM
  // dictionary replicas). The engine's analogue: the dimension is
  // collected ONCE into a hash replica that rides the task binary,
  // and every probe is an O(1) codegen'd lookup — no join, no
  // shuffle, exactly CH's cost model. The oracle is the equivalent
  // equi-join. shifted_hits exercises the miss path (nationkey+20
  // exists only for keys <= 4).
  val q92ChDictFuncs = QueryDef(
    "q92_ch_dict_funcs",
    (s, dir) => {
      import org.apache.spark.sql.functions.col
      graft.plans.Dictionaries.register("nations",
        Graft.table(s, dir, "nation")
          .select(col("n_nationkey"), col("n_name"), col("n_regionkey")),
        "n_nationkey")
      Graft.table(s, dir, "customer").createOrReplaceTempView("customer_v")
      s.sql("""
        SELECT dictGet('nations', 'n_name', c_nationkey) AS nation,
               toInt64(dictGet('nations', 'n_regionkey', c_nationkey)) AS region,
               toInt64(count(1)) AS n,
               round(sum(c_acctbal), 2) AS bal,
               toInt64(sum(dictHas('nations', c_nationkey + 20))) AS shifted_hits
        FROM customer_v
        GROUP BY 1, 2 ORDER BY 1""")
    },
    Some("""
      SELECT n.n_name AS nation, CAST(n.n_regionkey AS BIGINT) AS region,
             CAST(count(1) AS BIGINT) AS n,
             round(sum(c.c_acctbal), 2) AS bal,
             CAST(sum(CASE WHEN c.c_nationkey + 20 <= 24 THEN 1 ELSE 0 END)
                  AS BIGINT) AS shifted_hits
      FROM customer c JOIN nation n ON n.n_nationkey = c.c_nationkey
      GROUP BY 1, 2 ORDER BY 1"""))

  // ---------------------------------------------------------------------
  // CH window-function vocabulary: lagInFrame / leadInFrame (CH's
  // well-defined in-frame window functions) and neighbor — which in CH
  // reads BLOCK order, nondeterministic on any distributed engine, so
  // the engine requires the explicit OVER the CH docs themselves
  // recommend migrating to. Omitted defaults fall to the value type's
  // default (CH's contract, not NULL). Session deltas per user ordered
  // by event time; tie-broken by event_id for full determinism.
  val q94ChWindowSql = QueryDef(
    "q94_ch_window_sql",
    (s, dir) => {
      Graft.table(s, dir, "events").createOrReplaceTempView("events_all_v")
      s.sql("""
        SELECT user_id, event_id, unix_micros(ts) AS ts_us,
               round(lagInFrame(value, 1, 0.0D) OVER w, 4) AS prev_v,
               round(leadInFrame(value, 1, 0.0D) OVER w, 4) AS next_v,
               round(neighbor(value, 2, -1.0D) OVER w, 4) AS nb2,
               round(value - lagInFrame(value, 1, value) OVER w, 4) AS rdiff
        FROM events_all_v
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ORDER BY user_id, event_id LIMIT 300""")
    },
    Some("""
      SELECT user_id, event_id, epoch_us(ts) AS ts_us,
             round(coalesce(lag(value, 1) OVER w, 0.0), 4) AS prev_v,
             round(coalesce(lead(value, 1) OVER w, 0.0), 4) AS next_v,
             round(coalesce(lead(value, 2) OVER w, -1.0), 4) AS nb2,
             round(value - coalesce(lag(value, 1) OVER w, value), 4) AS rdiff
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
      ORDER BY user_id, event_id LIMIT 300"""))

  // ---------------------------------------------------------------------
  // The CH DDL front-end end-to-end, all SQL: CREATE TABLE with a
  // VersionedCollapsingMergeTree ENGINE clause (the engine clause
  // BECOMES the metadata stamps — plans/ChDdl.scala; the spec proves
  // the reference's own 106/224-column hits.sql/visits.sql parse to
  // the transcribed schemas), INSERT INTO ... SELECT through the
  // week-partitioned clustered writer, and a FINAL read. Every click
  // event's v1 is cancelled and superseded by a doubled-value v2 —
  // the same collapse the q91 oracle replays independently.
  val q98ChDdlWorkflow = QueryDef(
    "q98_ch_ddl_workflow",
    (s, dir) => {
      val root = s"${sys.props("java.io.tmpdir")}/graft_ddl_q98_" +
        new java.io.File(dir).getName
      graft.FsUtil.rmTree(root)
      s.conf.set("spark.graft.warehouse", root)
      try {
        Graft.table(s, dir, "events").createOrReplaceTempView("events_src_v")
        s.sql("""
          CREATE TABLE metrica.events_vers
          (
              `eid` UInt64,
              `d` Date,
              `ver` UInt64,
              `sign` Int8,
              `event_type` String,
              `value` Float64
          )
          ENGINE = VersionedCollapsingMergeTree(sign, ver)
          PARTITION BY toMonday(d)
          ORDER BY (eid)
          SETTINGS index_granularity = 8192""")
        s.sql("""
          INSERT INTO events_vers
          SELECT event_id AS eid, CAST(ts AS DATE) AS d, 1 AS ver,
                 CAST(1 AS TINYINT) AS sign, event_type, value
          FROM events_src_v
          UNION ALL
          SELECT event_id, CAST(ts AS DATE), 1, CAST(-1 AS TINYINT),
                 event_type, value
          FROM events_src_v WHERE event_type = 'click'
          UNION ALL
          SELECT event_id, CAST(ts AS DATE), 2, CAST(1 AS TINYINT),
                 event_type, value * 2
          FROM events_src_v WHERE event_type = 'click'""")
        s.sql("""
          SELECT event_type, toInt64(count(1)) AS n,
                 toInt64(sum(ver)) AS ver_sum, round(sum(value), 2) AS v
          FROM events_vers FINAL
          GROUP BY event_type ORDER BY event_type""")
      } finally s.conf.unset("spark.graft.warehouse")
    },
    Some("""
      WITH base AS (
        SELECT event_id AS eid, 1 AS ver, 1 AS sign, event_type, value
        FROM events
      ), v AS (
        SELECT * FROM base
        UNION ALL
        SELECT eid, 1 AS ver, -1 AS sign, event_type, value
        FROM base WHERE event_type = 'click'
        UNION ALL
        SELECT eid, 2 AS ver, 1 AS sign, event_type, value * 2 AS value
        FROM base WHERE event_type = 'click'
      ), live AS (
        SELECT p.* FROM v p
        WHERE p.sign = 1 AND NOT EXISTS (
          SELECT 1 FROM v m
          WHERE m.sign = -1 AND m.eid = p.eid AND m.ver = p.ver)
      ), latest AS (
        SELECT eid, ver, event_type, value,
               row_number() OVER (PARTITION BY eid ORDER BY ver DESC) AS rn
        FROM live
      )
      SELECT event_type, CAST(count(1) AS BIGINT) AS n,
             CAST(sum(ver) AS BIGINT) AS ver_sum, round(sum(value), 2) AS v
      FROM latest WHERE rn = 1
      GROUP BY event_type ORDER BY event_type"""))

  // ---------------------------------------------------------------------
  // arrayReduce('agg', arr) — CH's generic per-row array aggregator,
  // dispatched at analysis to the codegen'd array combinators (sum /
  // min / max / count / avg / uniqExact / any / anyLast); an unknown
  // aggregate fails loudly. The oracle replays each reduction with
  // DuckDB's list_aggregate family.
  val q99ChArrayReduce = QueryDef(
    "q99_ch_array_reduce",
    (s, dir) => {
      Graft.table(s, dir, "embeddings").createOrReplaceTempView("embeddings_v")
      s.sql("""
        SELECT label,
               round(sum(arrayReduce('sum', embedding)), 2) AS s,
               round(sum(arrayReduce('max', embedding)), 4) AS mx,
               round(sum(arrayReduce('min', embedding)), 4) AS mn,
               round(sum(arrayReduce('avg', embedding)), 4) AS av,
               toInt64(sum(arrayReduce('count', embedding))) AS cnt,
               toInt64(sum(arrayReduce('uniqExact', embedding))) AS uq,
               round(sum(arrayReduce('any', embedding)), 4) AS first_sum
        FROM embeddings_v GROUP BY label ORDER BY label""")
    },
    Some("""
      SELECT label,
             round(sum(list_aggregate(embedding, 'sum')), 2) AS s,
             round(sum(list_aggregate(embedding, 'max')), 4) AS mx,
             round(sum(list_aggregate(embedding, 'min')), 4) AS mn,
             round(sum(list_aggregate(embedding, 'sum')
                       / len(embedding)), 4) AS av,
             CAST(sum(len(embedding)) AS BIGINT) AS cnt,
             CAST(sum(len(list_distinct(embedding))) AS BIGINT) AS uq,
             round(sum(embedding[1]), 4) AS first_sum
      FROM embeddings GROUP BY label ORDER BY label"""))

  // ---------------------------------------------------------------------
  // The full CH materialized-view workflow as verbatim SQL: CREATE
  // TABLE (DDL), CREATE MATERIALIZED VIEW ... AS SELECT ...
  // uniqState(...), three day-sliced INSERTs (each fold is
  // O(batch + groups) — the MV never rescans history; users
  // overlapping across inserts prove the state unions, not sums),
  // then the canonical uniqMerge read at the MV's own grain. The
  // oracle recomputes exact uniques and pins the 5% band to 1
  // (sketch registers are order-independent, so the insert split
  // changes nothing).
  // ---------------------------------------------------------------------
  // topKState/-Merge in the MV workflow: the exact top-frequent-values
  // state beside q100's count/sum/uniq — state = the sorted value
  // list (merge-order-proof), Merge = the SAME count fold + ( -count,
  // value) sort the engine's topK uses, so folding day-batch states
  // to a weekly grain equals the direct aggregate EXACTLY (no band
  // needed). The oracle computes per-week top-3 by (count desc, value
  // asc) straight from the raw rows.
  val q170ChTopKMv = QueryDef(
    "q170_ch_topk_mv",
    (s, dir) => {
      val root = s"${sys.props("java.io.tmpdir")}/graft_mv_q170_" +
        new java.io.File(dir).getName
      graft.FsUtil.rmTree(root)
      s.conf.set("spark.graft.warehouse", root)
      try {
        Graft.table(s, dir, "events")
          .createOrReplaceTempView("events_src_v")
        s.sql("""
          CREATE TABLE ev_topk_src (`uid` UInt64, `event_type` String,
            `d` Date)
          ENGINE = MergeTree PARTITION BY toMonday(d) ORDER BY (uid)""")
        s.sql("""
          CREATE MATERIALIZED VIEW ev_topk_mv
          ENGINE = AggregatingMergeTree
          AS SELECT d, event_type,
                    topKState(toString(uid % 17)) AS tk
          FROM ev_topk_src GROUP BY d, event_type""")
        Seq(("2024-01-01", "2024-01-07"), ("2024-01-08", "2024-01-14"))
          .foreach { case (a, z) =>
            s.sql(s"""
              INSERT INTO ev_topk_src
              SELECT user_id AS uid, event_type, CAST(ts AS DATE) AS d
              FROM events_src_v
              WHERE CAST(ts AS DATE) BETWEEN cast('$a' as date)
                                         AND cast('$z' as date)""")
          }
        s.sql("""
          SELECT toMonday(d) AS wk, event_type,
                 arrayStringConcat(topKMerge(3)(tk), ',') AS top_buckets
          FROM ev_topk_mv GROUP BY wk, event_type
          ORDER BY wk, event_type""")
      } finally s.conf.unset("spark.graft.warehouse")
    },
    Some("""
      WITH c AS (
        SELECT CAST(date_trunc('week', CAST(ts AS DATE)) AS DATE) AS wk,
               event_type, CAST(user_id % 17 AS VARCHAR) AS b,
               CAST(count(1) AS BIGINT) AS n
        FROM events
        WHERE CAST(ts AS DATE) BETWEEN DATE '2024-01-01'
                                   AND DATE '2024-01-14'
        GROUP BY 1, 2, 3
      ), rk AS (
        SELECT wk, event_type, b,
               row_number() OVER (PARTITION BY wk, event_type
                 ORDER BY n DESC, b ASC) AS r
        FROM c
      )
      SELECT wk, event_type,
             string_agg(b, ',' ORDER BY r) AS top_buckets
      FROM rk WHERE r <= 3
      GROUP BY wk, event_type ORDER BY wk, event_type"""))

  val q100ChMvWorkflow = QueryDef(
    "q100_ch_mv_workflow",
    (s, dir) => {
      import org.apache.spark.sql.functions.{abs, col, lit}
      val root = s"${sys.props("java.io.tmpdir")}/graft_mv_q100_" +
        new java.io.File(dir).getName
      graft.FsUtil.rmTree(root)
      s.conf.set("spark.graft.warehouse", root)
      try {
        Graft.table(s, dir, "events").createOrReplaceTempView("events_src_v")
        s.sql("""
          CREATE TABLE ev_mv_src (`uid` UInt64, `event_type` String,
            `v` Float64, `d` Date)
          ENGINE = MergeTree PARTITION BY toMonday(d) ORDER BY (uid)""")
        s.sql("""
          CREATE MATERIALIZED VIEW ev_mv ENGINE = AggregatingMergeTree
          AS SELECT toMonday(d) AS wk, event_type,
                    countState() AS n, sumState(v) AS sv,
                    uniqState(uid) AS u
          FROM ev_mv_src GROUP BY wk, event_type""")
        Seq(("2024-01-01", "2024-01-10"), ("2024-01-11", "2024-01-20"),
          ("2024-01-21", "2024-01-31")).foreach { case (a, z) =>
          s.sql(s"""
            INSERT INTO ev_mv_src
            SELECT user_id AS uid, event_type, value AS v,
                   CAST(ts AS DATE) AS d
            FROM events_src_v
            WHERE CAST(ts AS DATE) BETWEEN cast('$a' as date)
                                       AND cast('$z' as date)""")
        }
        // count/sum merges are EXACT (hash-compared outright); the
        // uniq sketch gets the 5% band
        val est = s.sql("""
          SELECT wk, event_type, countMerge(n) AS n,
                 round(sumMerge(sv), 2) AS v_sum, uniqMerge(u) AS est
          FROM ev_mv GROUP BY wk, event_type""")
        val exact = s.sql("""
          SELECT toMonday(CAST(ts AS DATE)) AS wk, event_type,
                 toInt64(count(DISTINCT user_id)) AS exact_users
          FROM events_src_v
          WHERE CAST(ts AS DATE) BETWEEN cast('2024-01-01' as date)
                                     AND cast('2024-01-31' as date)
          GROUP BY 1, 2""")
        exact.join(est, Seq("wk", "event_type"))
          .select(col("wk"), col("event_type"), col("n"), col("v_sum"),
            col("exact_users"),
            (abs(col("est") - col("exact_users")) <=
              lit(0.05) * col("exact_users")).cast("long").as("mv_in_band"))
          .orderBy(col("wk"), col("event_type"))
      } finally s.conf.unset("spark.graft.warehouse")
    },
    Some("""
      SELECT CAST(date_trunc('week', CAST(ts AS DATE)) AS DATE) AS wk,
             event_type,
             CAST(count(1) AS BIGINT) AS n,
             round(sum(value), 2) AS v_sum,
             CAST(count(DISTINCT user_id) AS BIGINT) AS exact_users,
             CAST(1 AS BIGINT) AS mv_in_band
      FROM events
      WHERE CAST(ts AS DATE) BETWEEN DATE '2024-01-01' AND DATE '2024-01-31'
      GROUP BY 1, 2 ORDER BY 1, 2"""))

  // ---------------------------------------------------------------------
  // ASOF LEFT JOIN as verbatim SQL — q61's prevailing-checkpoint
  // semantics through the parser: the ASOF keyword strips, the marked
  // Join rewrites into the two-pass prefix-scan operator (never the
  // equi-match-then-filter pair blowup), and the DuckDB oracle runs
  // its OWN native ASOF LEFT JOIN over the same relations.
  val q101ChAsofSql = QueryDef(
    "q101_ch_asof_join_sql",
    (s, dir) => {
      import org.apache.spark.sql.functions.{col, count, lit, min,
        timestamp_micros, to_date}
      import graft.functions.ch.toMonday
      val raw = Graft.eventsMicros(s, dir)
      val e = raw.select(col("event_type"),
        col("ts").as("t"),
        to_date(timestamp_micros(col("ts"))).as("d"))
        .withColumn("wk", toMonday(col("d")))
      e.select(col("event_type"), col("t"))
        .createOrReplaceTempView("asof_e_v")
      e.filter(col("wk") > lit("2024-01-01").cast("date"))
        .groupBy(col("event_type"), col("wk"))
        .agg(min(col("t")).as("cp_ts"), count(lit(1)).as("rate"))
        .select(col("event_type"), col("cp_ts"), col("rate"))
        .createOrReplaceTempView("asof_cp_v")
      s.sql("""
        SELECT e.event_type,
               toInt64(count(1)) AS n_events,
               toInt64(count(cp.rate)) AS n_matched,
               toInt64(sum(cp.rate)) AS rate_sum,
               uniqExact(cp.cp_ts) AS n_cp
        FROM asof_e_v e ASOF LEFT JOIN asof_cp_v cp
          ON e.event_type = cp.event_type AND e.t >= cp.cp_ts
        GROUP BY e.event_type ORDER BY e.event_type""")
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
      GROUP BY 1 ORDER BY 1"""))

  // ---------------------------------------------------------------------
  // Round-7 third-leg vocabulary: CH's quoted-unit dateDiff (BOUNDARY-
  // based — truncate both sides to the unit, then count units; the
  // parser routes the quoted spelling past Spark's bare-unit
  // special case) and epoch-aligned toStartOfInterval bucketing, both
  // replayed by DuckDB's identically-boundary-based date_diff /
  // epoch arithmetic.
  val q119ChDateDiff = QueryDef(
    "q119_ch_datediff_interval",
    (s, dir) => {
      Graft.table(s, dir, "events").createOrReplaceTempView("events_v119")
      s.sql("""
        SELECT event_type,
               dateDiff('day', min(ts), max(ts)) AS span_days,
               dateDiff('hour', min(ts), max(ts)) AS span_hours,
               dateDiff('week', min(ts), max(ts)) AS span_weeks,
               dateDiff('month', min(ts), max(ts)) AS span_months,
               uniqExact(toStartOfInterval(ts, INTERVAL 6 HOUR))
                 AS buckets_6h,
               uniqExact(toStartOfInterval(ts, INTERVAL 1 MONTH))
                 AS buckets_month,
               toInt64(count(1)) AS n
        FROM events_v119
        GROUP BY event_type ORDER BY event_type""")
    },
    Some("""
      SELECT event_type,
             CAST(date_diff('day', min(ts), max(ts)) AS BIGINT)
               AS span_days,
             CAST(date_diff('hour', min(ts), max(ts)) AS BIGINT)
               AS span_hours,
             CAST(date_diff('week', min(ts), max(ts)) AS BIGINT)
               AS span_weeks,
             CAST(date_diff('month', min(ts), max(ts)) AS BIGINT)
               AS span_months,
             CAST(count(DISTINCT epoch_us(ts) // 21600000000)
               AS BIGINT) AS buckets_6h,
             CAST(count(DISTINCT date_trunc('month', ts)) AS BIGINT)
               AS buckets_month,
             CAST(count(1) AS BIGINT) AS n
      FROM events GROUP BY event_type ORDER BY event_type"""))

  // CH age('unit', a, b) — COMPLETE elapsed units (the full-period
  // counterpart of q119's boundary-based dateDiff; DuckDB date_sub
  // replays it) — plus the ISO calendar trio toDayOfYear / toISOWeek /
  // toISOYear.
  val q121ChAgeIso = QueryDef(
    "q121_ch_age_iso",
    (s, dir) => {
      Graft.table(s, dir, "events").createOrReplaceTempView("events_v121")
      s.sql("""
        SELECT event_type,
               age('day', min(ts), max(ts)) AS age_days,
               age('hour', min(ts), max(ts)) AS age_hours,
               age('month', min(ts), max(ts)) AS age_months,
               uniqExact(toDayOfYear(ts)) AS doy_u,
               uniqExact(toISOWeek(ts)) AS isow_u,
               toInt64(min(toISOYear(ts))) AS isoy_min,
               toInt64(count(1)) AS n
        FROM events_v121
        GROUP BY event_type ORDER BY event_type""")
    },
    Some("""
      SELECT event_type,
             CAST(date_sub('day', min(ts), max(ts)) AS BIGINT)
               AS age_days,
             CAST(date_sub('hour', min(ts), max(ts)) AS BIGINT)
               AS age_hours,
             CAST(date_sub('month', min(ts), max(ts)) AS BIGINT)
               AS age_months,
             CAST(count(DISTINCT dayofyear(ts)) AS BIGINT) AS doy_u,
             CAST(count(DISTINCT weekofyear(ts)) AS BIGINT) AS isow_u,
             CAST(min(isoyear(ts)) AS BIGINT) AS isoy_min,
             CAST(count(1) AS BIGINT) AS n
      FROM events GROUP BY event_type ORDER BY event_type"""))

  // arrayMin/Max/Avg and the lambda family arrayFirst/arrayLast/
  // arrayAll — element-type DEFAULT on a no-match first/last (CH's
  // arr[i] miss contract), per-row integer 1e-4 units so float sums
  // never ride summation order.
  val q120ChArrayVocab2 = QueryDef(
    "q120_ch_array_vocab2",
    (s, dir) => {
      Graft.table(s, dir, "embeddings")
        .createOrReplaceTempView("emb_v120")
      s.sql("""
        SELECT label,
               toInt64(sum(toInt64(round(
                 toFloat64(arrayMin(embedding)) * 10000)))) AS mn,
               toInt64(sum(toInt64(round(
                 toFloat64(arrayMax(embedding)) * 10000)))) AS mx,
               toInt64(sum(toInt64(round(arrayAvg(embedding) * 10000))))
                 AS av,
               toInt64(sum(toInt64(round(toFloat64(
                 arrayFirst(x -> x > 0, embedding)) * 10000)))) AS fpos,
               toInt64(sum(toInt64(round(toFloat64(
                 arrayLast(x -> x > 0, embedding)) * 10000)))) AS lpos,
               toInt64(sum(toInt64(arrayAll(x -> isFinite(x), embedding))))
                 AS all_finite,
               toInt64(count(1)) AS n
        FROM emb_v120 GROUP BY label ORDER BY label""")
    },
    Some("""
      SELECT label,
             CAST(sum(CAST(round(CAST(list_min(embedding) AS DOUBLE)
               * 10000) AS BIGINT)) AS BIGINT) AS mn,
             CAST(sum(CAST(round(CAST(list_max(embedding) AS DOUBLE)
               * 10000) AS BIGINT)) AS BIGINT) AS mx,
             CAST(sum(CAST(round((CASE WHEN len(embedding) = 0 THEN 0.0
               ELSE list_aggregate(CAST(embedding AS DOUBLE[]), 'sum')
                    / len(embedding) END) * 10000) AS BIGINT)) AS BIGINT)
               AS av,
             CAST(sum(CAST(round(CAST(coalesce(
               list_filter(embedding, x -> x > 0)[1], 0) AS DOUBLE)
               * 10000) AS BIGINT)) AS BIGINT) AS fpos,
             CAST(sum(CAST(round(CAST(coalesce(
               list_filter(embedding, x -> x > 0)[-1], 0) AS DOUBLE)
               * 10000) AS BIGINT)) AS BIGINT) AS lpos,
             CAST(sum(CASE WHEN len(list_filter(embedding,
               x -> isfinite(x))) = len(embedding) THEN 1 ELSE 0 END)
               AS BIGINT) AS all_finite,
             CAST(count(1) AS BIGINT) AS n
      FROM embeddings GROUP BY label ORDER BY label"""))

  // CH scalar WITH (`WITH <expr> AS <name>` — the alias is a macro
  // substituted into every clause, Spark's grammar only knows the
  // subquery CTE form), transform() parallel-array mapping (the
  // Metrica idiom for labeling enum-ish ids), and the conditional
  // distinct counts uniqExactIf. The threshold alias feeds both -If
  // conditions; the transform alias is a select item (keeping its
  // name, CH's output naming) AND a group key.
  val q122ChScalarWith = QueryDef(
    "q122_ch_scalar_with",
    (s, dir) => {
      Graft.table(s, dir, "events").createOrReplaceTempView("events_v122")
      s.sql("""
        WITH 250.0 AS hi,
             transform(event_type, array('click', 'view'),
                       array('C', 'V'), '?') AS code
        SELECT event_type, code,
               uniqExactIf(user_id, value > hi) AS hi_users,
               uniqExactIf(user_id, value <= hi) AS lo_users,
               toInt64(countIf(value > hi)) AS hi_n,
               toInt64(count(1)) AS n
        FROM events_v122
        GROUP BY event_type, code
        ORDER BY event_type""")
    },
    Some("""
      SELECT event_type,
             CASE event_type WHEN 'click' THEN 'C' WHEN 'view' THEN 'V'
                  ELSE '?' END AS code,
             CAST(count(DISTINCT CASE WHEN value > 250.0 THEN user_id END)
               AS BIGINT) AS hi_users,
             CAST(count(DISTINCT CASE WHEN value <= 250.0 THEN user_id END)
               AS BIGINT) AS lo_users,
             CAST(count(CASE WHEN value > 250.0 THEN 1 END) AS BIGINT)
               AS hi_n,
             CAST(count(1) AS BIGINT) AS n
      FROM events GROUP BY event_type, code ORDER BY event_type"""))

  // decodeURLComponent (percent-decoding, '+' stays literal — the
  // SearchPhrase idiom), cutWWW, and arrayEnumerateUniq (per-element
  // occurrence index — the funnel "first time this page" idiom). The
  // oracle decodes by replaying the bounded code set with replaces,
  // constructs cutWWW's expected text directly, and rebuilds the
  // occurrence index with prefix-slice counts. The occurrence-index
  // array is CSV-serialized on both sides (the q75 members pattern):
  // the driver comparator hashes scalar cells only.
  val q127ChUrlDecode = QueryDef(
    "q127_ch_url_decode_enum",
    (s, dir) => {
      Graft.table(s, dir, "documents")
        .createOrReplaceTempView("docs_v127")
      s.sql("""
        SELECT doc_id,
               decodeURLComponent(concat('q', CAST(doc_id % 7 AS STRING),
                 '%20and%2For%3D', CAST(doc_id % 3 AS STRING),
                 '+plus%26x')) AS dec,
               cutWWW(CASE WHEN doc_id % 2 = 0
                 THEN concat('https://www.ex', CAST(doc_id % 5 AS STRING),
                   '.com/p')
                 ELSE concat('http://u@www.site',
                   CAST(doc_id % 5 AS STRING), '.org/q?a=1')
                 END) AS nw,
               concat_ws(',', CAST(arrayEnumerateUniq(array(
                 CAST(doc_id % 2 AS STRING), CAST(doc_id % 3 AS STRING),
                 CAST(doc_id % 2 AS STRING), 'k',
                 CAST(doc_id % 3 AS STRING))) AS ARRAY<STRING>)) AS enu
        FROM docs_v127 ORDER BY doc_id LIMIT 200""")
    },
    Some("""
      WITH a AS (
        SELECT doc_id,
               [CAST(doc_id % 2 AS VARCHAR), CAST(doc_id % 3 AS VARCHAR),
                CAST(doc_id % 2 AS VARCHAR), 'k',
                CAST(doc_id % 3 AS VARCHAR)] AS arr
        FROM documents
      )
      SELECT doc_id,
             replace(replace(replace(replace(
               concat('q', CAST(doc_id % 7 AS VARCHAR), '%20and%2For%3D',
                 CAST(doc_id % 3 AS VARCHAR), '+plus%26x'),
               '%20', ' '), '%2F', '/'), '%3D', '='), '%26', '&') AS dec,
             CASE WHEN doc_id % 2 = 0
               THEN concat('https://ex', CAST(doc_id % 5 AS VARCHAR),
                 '.com/p')
               ELSE concat('http://u@site', CAST(doc_id % 5 AS VARCHAR),
                 '.org/q?a=1')
               END AS nw,
             array_to_string(
               [CAST(len(list_filter(arr[1:i], y -> y = arr[i]))
                     AS BIGINT)
                for i in range(1, len(arr) + 1)], ',') AS enu
      FROM a ORDER BY doc_id LIMIT 200"""))

  // Weighted parameterized aggregates: quantileExactWeighted(L)(x, w)
  // → percentile's frequency argument; topKWeighted(k)(x, w) → the
  // weight-summed top-k fold. The oracle replays the quantile by
  // REPEATING each row w times (the definition of a frequency
  // percentile) and the top-k with an explicit weight-sum ranking.
  // The top-k list is CSV-serialized on both sides (the q75 members
  // pattern): the driver comparator hashes scalar cells only.
  val q129ChWeightedAggs = QueryDef(
    "q129_ch_weighted_aggs",
    (s, dir) => {
      Graft.table(s, dir, "events").createOrReplaceTempView("events_v129")
      s.sql("""
        SELECT event_type,
               round(quantileExactWeighted(0.5)(
                 value, CAST(user_id % 5 + 1 AS BIGINT)), 4) AS p50w,
               concat_ws(',', topKWeighted(3)(CAST(user_id % 7 AS STRING),
                 CAST(user_id % 3 + 1 AS BIGINT))) AS topw,
               toInt64(count(1)) AS n
        FROM events_v129
        GROUP BY event_type ORDER BY event_type""")
    },
    Some("""
      WITH r AS (
        SELECT event_type, value,
               CAST(user_id % 5 + 1 AS BIGINT) AS w5,
               CAST(user_id % 7 AS VARCHAR) AS v7,
               CAST(user_id % 3 + 1 AS BIGINT) AS w3
        FROM events
      ), rep5 AS (
        SELECT event_type, value
        FROM r, unnest(generate_series(1, w5))
      ), p AS (
        SELECT event_type, round(quantile_cont(value, 0.5), 4) AS p50w,
               count(1) AS n_rep
        FROM rep5 GROUP BY event_type
      ), wsum AS (
        SELECT event_type, v7, sum(w3) AS tw
        FROM r GROUP BY event_type, v7
      ), rk AS (
        SELECT event_type, v7, tw,
               row_number() OVER (PARTITION BY event_type
                                  ORDER BY tw DESC, v7 ASC) AS rn
        FROM wsum
      ), tl AS (
        SELECT event_type, string_agg(v7, ',' ORDER BY rn) AS topw
        FROM rk WHERE rn <= 3 GROUP BY event_type
      ), cnt AS (
        SELECT event_type, CAST(count(1) AS BIGINT) AS n
        FROM events GROUP BY event_type
      )
      SELECT p.event_type, p.p50w, tl.topw, cnt.n
      FROM p JOIN tl USING (event_type) JOIN cnt USING (event_type)
      ORDER BY event_type"""))

  // CH ANY strictness as verbatim SQL: each user joined to AT MOST
  // one event row. CH picks an arbitrary match; the engine picks the
  // MINIMUM right row in full-column order (event_id leads the
  // schema, so the earliest event id wins) — deterministic, which is
  // what lets an oracle exist at all. The right side reduces to one
  // row per key BEFORE the join (WindowGroupLimit map-side trim).
  val q130ChAnyJoin = QueryDef(
    "q130_ch_any_join_sql",
    (s, dir) => {
      Graft.table(s, dir, "events").createOrReplaceTempView("events_v130")
      s.sql("""
        SELECT u.user_id, e.event_id, e.event_type
        FROM (SELECT DISTINCT user_id FROM events_v130) u
        ANY LEFT JOIN events_v130 e ON u.user_id = e.user_id
        ORDER BY u.user_id""")
    },
    Some("""
      WITH u AS (SELECT DISTINCT user_id FROM events),
      f AS (
        SELECT user_id, event_id, event_type,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY event_id) AS rn
        FROM events
      )
      SELECT u.user_id, f.event_id, f.event_type
      FROM u LEFT JOIN f ON u.user_id = f.user_id AND f.rn = 1
      ORDER BY u.user_id"""))

  // The CH scratch-relation idiom end-to-end: numbers() through the
  // parser (renamed range), a parameterized quantile over it, the
  // FORMAT tail and statement terminator stripped — a CH console
  // paste runs unchanged.
  val q132ChNumbers = QueryDef(
    "q132_ch_numbers_sql",
    (s, dir) => s.sql("""
      SELECT intDiv(number, 10) AS g,
             quantileExact(0.5)(toFloat64(number)) AS med,
             toInt64(count(1)) AS n
      FROM numbers(100)
      GROUP BY g ORDER BY g
      FORMAT TabSeparated;"""),
    Some("""
      SELECT CAST(n // 10 AS BIGINT) AS g,
             quantile_cont(CAST(n AS DOUBLE), 0.5) AS med,
             CAST(count(1) AS BIGINT) AS n
      FROM generate_series(0, 99) AS t(n)
      GROUP BY 1 ORDER BY g"""))

  // `LIMIT n WITH TIES` over a tie-heavy ranking (per-user event
  // counts): the verbatim clause expands to the nth-key boundary
  // filter — never a global rank window. The outer orderBy is
  // presentation-only (ties are unordered within the clause's single
  // sort axis; the compare needs a total order).
  val q133ChLimitTies = QueryDef(
    "q133_ch_limit_ties",
    (s, dir) => {
      import org.apache.spark.sql.functions.col
      Graft.table(s, dir, "events").createOrReplaceTempView("events_v133")
      s.sql("""
        SELECT user_id, toInt64(count(1)) AS cnt
        FROM events_v133
        GROUP BY user_id
        ORDER BY cnt DESC
        LIMIT 10 WITH TIES""")
        .orderBy(col("cnt").desc, col("user_id"))
    },
    Some("""
      WITH c AS (
        SELECT user_id, CAST(count(1) AS BIGINT) AS cnt
        FROM events GROUP BY user_id
      ), m AS (
        SELECT min(cnt) AS b
        FROM (SELECT cnt FROM c ORDER BY cnt DESC LIMIT 10)
      )
      SELECT c.user_id, c.cnt FROM c, m
      WHERE c.cnt >= m.b
      ORDER BY cnt DESC, user_id"""))

  // Fuzzy text matching over the corpus: ngramSearch scores each
  // document's head against a needle (multiset 4-gram containment —
  // the SearchPhrase / typo-tolerant-filter idiom). The oracle
  // replays the identity the implementation uses: overlap =
  // Σ min(needle count, haystack count), via a gram join.
  val q135ChNgramSearch = QueryDef(
    "q135_ch_ngram_search",
    (s, dir) => {
      Graft.table(s, dir, "documents")
        .createOrReplaceTempView("docs_v135")
      s.sql("""
        SELECT lang,
               round(avg(round(ngramSearch(
                 substring(lower(trim(text)), 1, 100), 'the data'),
                 6)), 4) AS avg_score,
               toInt64(countIf(round(ngramSearch(
                 substring(lower(trim(text)), 1, 100), 'the data'),
                 6) >= 0.3)) AS hits,
               toInt64(count(1)) AS n
        FROM docs_v135 GROUP BY lang ORDER BY lang""")
    },
    Some("""
      WITH s AS (
        SELECT doc_id, lang,
               substr(lower(trim(text)), 1, 100) AS h
        FROM documents
      ), hg AS (
        SELECT doc_id, g, CAST(count(1) AS BIGINT) AS c
        FROM (SELECT doc_id, substr(h, i, 4) AS g
              FROM (SELECT doc_id, h,
                      unnest(generate_series(1,
                        greatest(length(h) - 3, 0))) AS i
                    FROM s))
        GROUP BY doc_id, g
      ), ng AS (
        SELECT g, CAST(count(1) AS BIGINT) AS c
        FROM (SELECT substr('the data', i, 4) AS g
              FROM generate_series(1, 5) AS t(i))
        GROUP BY g
      ), nn AS (SELECT CAST(sum(c) AS DOUBLE) AS n FROM ng),
      ov AS (
        SELECT hg.doc_id, sum(least(ng.c, hg.c)) AS o
        FROM hg JOIN ng USING (g) GROUP BY hg.doc_id
      ), sc AS (
        SELECT s.lang,
               round(coalesce(ov.o, 0) / nn.n, 6) AS score
        FROM s LEFT JOIN ov USING (doc_id) CROSS JOIN nn
      )
      SELECT lang, round(avg(score), 4) AS avg_score,
             CAST(sum(CASE WHEN score >= 0.3 THEN 1 ELSE 0 END)
               AS BIGINT) AS hits,
             CAST(count(1) AS BIGINT) AS n
      FROM sc GROUP BY lang ORDER BY lang"""))

  // The add/subtract date family, timeSlot / relative counters,
  // alphaTokens, geo, and array shingles — all through verbatim SQL
  // against the oracle. Round-10 post-mortem of the three-round red:
  // the divergent column was NEVER the trig term — it was `h5`.
  // Spark's `toUnixTimestamp` TRUNCATES sub-second micros while
  // DuckDB's bare `epoch()` ROUNDS, so any group whose max ts has
  // fraction >= .5 s flipped by one (judge-diffed: sf0.1 `click`
  // .684, `purchase` .674). The oracle now wraps in floor() — the
  // same convention q231 already used — and the haversine `gc`
  // column (retired in r9 on the wrong theory) is REINSTATED with
  // its r8 guard-banded km buckets: cell-diffed green at both SFs.
  val q137ChDateGeoVocab = QueryDef(
    "q137_ch_date_geo_vocab",
    (s, dir) => {
      Graft.table(s, dir, "events").createOrReplaceTempView("events_v137")
      s.sql("""
        SELECT event_type,
               CAST(min(addMonths(toDate(ts), 2)) AS STRING) AS m2,
               toUnixTimestamp(max(addHours(ts, 5))) AS h5,
               CAST(max(toLastDayOfMonth(toDate(ts))) AS STRING) AS ld,
               uniqExact(timeSlot(ts)) AS slots,
               toInt64(max(toRelativeDayNum(ts))) AS rd,
               toInt64(sum(size(alphaTokens(props)))) AS at,
               toInt64(sum(floor((greatCircleDistance(
                 CAST(user_id % 90 AS DOUBLE) + 0.5,
                 CAST(user_id % 60 AS DOUBLE) + 0.5,
                 CAST(event_id % 90 AS DOUBLE) + 0.5,
                 CAST(event_id % 60 AS DOUBLE) + 0.5)
                 + 0.001) / 1000))) AS gc,
               toInt64(sum(size(arrayShingles(
                 sequence(1, CAST(user_id % 6 AS INT) + 1), 2)))) AS sh,
               toInt64(count(1)) AS n
        FROM events_v137
        GROUP BY event_type ORDER BY event_type""")
    },
    Some("""
      SELECT event_type,
             CAST(CAST(min(CAST(ts AS DATE) + INTERVAL 2 MONTH) AS DATE)
               AS VARCHAR) AS m2,
             CAST(floor(epoch(max(ts + INTERVAL 5 HOUR))) AS BIGINT) AS h5,
             CAST(max(last_day(CAST(ts AS DATE))) AS VARCHAR) AS ld,
             CAST(count(DISTINCT to_timestamp(
               floor(epoch(ts) / 1800) * 1800)) AS BIGINT) AS slots,
             CAST(max(floor(epoch(ts) / 86400)) AS BIGINT) AS rd,
             CAST(sum(len(regexp_extract_all(props, '[A-Za-z]+')))
               AS BIGINT) AS at,
             CAST(sum(floor((2 * 6371000 * asin(sqrt(
               pow(sin((radians(CAST(event_id % 60 AS DOUBLE) + 0.5)
                        - radians(CAST(user_id % 60 AS DOUBLE) + 0.5)) / 2), 2)
               + cos(radians(CAST(user_id % 60 AS DOUBLE) + 0.5))
               * cos(radians(CAST(event_id % 60 AS DOUBLE) + 0.5))
               * pow(sin((radians(CAST(event_id % 90 AS DOUBLE) + 0.5)
                          - radians(CAST(user_id % 90 AS DOUBLE) + 0.5)) / 2), 2)))
               + 0.001) / 1000)) AS BIGINT) AS gc,
             CAST(sum(greatest(user_id % 6, 0)) AS BIGINT) AS sh,
             CAST(count(1) AS BIGINT) AS n
      FROM events GROUP BY event_type ORDER BY event_type"""))

  // CH `system.tables` introspection: the runbook query against the
  // engine's own catalog state. Scoped to names this entry registers
  // itself (catalog state is session-global and other entries mutate
  // it), so the oracle is a constant row set.
  val q139ChSystemTables = QueryDef(
    "q139_ch_system_tables",
    (s, dir) => {
      import graft.sources.{Binding, Catalog}
      Catalog.register(s,
        Binding("q139_events", s"$dir/events.parquet"),
        Binding("q139_docs", s"$dir/documents.parquet"))
      s.sql("""
        SELECT name, engine FROM system.tables
        WHERE name LIKE 'q139_%' ORDER BY name""")
    },
    Some("""
      SELECT * FROM (VALUES ('q139_docs', 'parquet'),
                            ('q139_events', 'parquet')) AS t(name, engine)
      ORDER BY name"""))

  // ---------------------------------------------------------------------
  // CH GROUP BY modifiers WITH ROLLUP / WITH CUBE — the subtotal
  // modifiers next to the already-covered WITH TOTALS
  // (clickhouse.com/docs/sql-reference/statements/select/group-by):
  // ROLLUP adds prefix-subtotal rows, CUBE every key-subset subtotal,
  // key columns NULL-filled in subtotal rows exactly as Spark's own
  // modifiers do — so the dialect text plans straight into Spark's
  // native Expand-based grouping-sets aggregation (ONE pass over the
  // data producing all grouping sets; no per-subtotal re-scan).
  // grouping() disambiguates a NULL key from a subtotal row in both
  // engines. NULLS FIRST pinned: Spark and DuckDB default opposite
  // null orderings.
  val q143ChRollupCube = QueryDef(
    "q143_ch_rollup_cube_sql",
    (s, dir) => {
      Graft.table(s, dir, "lineitem").createOrReplaceTempView("lineitem_v")
      s.sql("""
        SELECT 'rollup' AS mode, l_returnflag, l_linestatus,
               toInt64(grouping(l_returnflag) * 2 + grouping(l_linestatus))
                 AS g,
               toInt64(sum(l_quantity)) AS sum_qty,
               toInt64(count(1)) AS n
        FROM lineitem_v
        GROUP BY l_returnflag, l_linestatus WITH ROLLUP
        UNION ALL
        SELECT 'cube' AS mode, l_returnflag, l_linestatus,
               toInt64(grouping(l_returnflag) * 2 + grouping(l_linestatus))
                 AS g,
               toInt64(sum(l_quantity)) AS sum_qty,
               toInt64(count(1)) AS n
        FROM lineitem_v
        GROUP BY l_returnflag, l_linestatus WITH CUBE
        ORDER BY mode, g, l_returnflag NULLS FIRST,
                 l_linestatus NULLS FIRST""")
    },
    Some("""
      SELECT 'rollup' AS mode, l_returnflag, l_linestatus,
             CAST(grouping(l_returnflag) * 2 + grouping(l_linestatus)
               AS BIGINT) AS g,
             CAST(sum(l_quantity) AS BIGINT) AS sum_qty,
             CAST(count(1) AS BIGINT) AS n
      FROM lineitem
      GROUP BY ROLLUP (l_returnflag, l_linestatus)
      UNION ALL
      SELECT 'cube' AS mode, l_returnflag, l_linestatus,
             CAST(grouping(l_returnflag) * 2 + grouping(l_linestatus)
               AS BIGINT) AS g,
             CAST(sum(l_quantity) AS BIGINT) AS sum_qty,
             CAST(count(1) AS BIGINT) AS n
      FROM lineitem
      GROUP BY CUBE (l_returnflag, l_linestatus)
      ORDER BY mode, g, l_returnflag NULLS FIRST,
               l_linestatus NULLS FIRST"""))

  // ---------------------------------------------------------------------
  // The AggregatingMergeTree family beyond sums and sketches:
  // quantileExactState / argMaxState / argMinState folded across
  // day-sliced INSERTs, then read with their -Merge finishers. The
  // quantile state is CH-faithful (the sorted value list — CH's own
  // quantileExact state); its Merge computes the SAME interpolated
  // quantile as the engine's direct quantileExact(L)(x), so the MV
  // answer equals the raw-table aggregate the oracle runs. argMin/
  // argMax ties break on (ordering, value) — a deterministic total
  // order, replayed in the oracle as an explicit window rank (DuckDB's
  // own arg_max leaves ties unspecified).
  val q144ChMvQuantile = QueryDef(
    "q144_ch_mv_quantile_sql",
    (s, dir) => {
      val root = s"${sys.props("java.io.tmpdir")}/graft_mv_q144_" +
        new java.io.File(dir).getName
      graft.FsUtil.rmTree(root)
      s.conf.set("spark.graft.warehouse", root)
      try {
        Graft.table(s, dir, "events").createOrReplaceTempView("events_src_v")
        s.sql("""
          CREATE TABLE ev_mvq_src (`uid` UInt64, `event_type` String,
            `v` Float64, `d` Date)
          ENGINE = MergeTree PARTITION BY toMonday(d) ORDER BY (uid)""")
        s.sql("""
          CREATE MATERIALIZED VIEW ev_mvq ENGINE = AggregatingMergeTree
          AS SELECT toMonday(d) AS wk,
                    quantileExactState(v) AS qv,
                    argMaxState(event_type, v) AS top_et,
                    argMinState(uid, v) AS low_uid,
                    countState() AS n
          FROM ev_mvq_src GROUP BY wk""")
        Seq(("2024-01-01", "2024-01-10"), ("2024-01-11", "2024-01-20"),
          ("2024-01-21", "2024-01-31")).foreach { case (a, z) =>
          s.sql(s"""
            INSERT INTO ev_mvq_src
            SELECT user_id AS uid, event_type, value AS v,
                   CAST(ts AS DATE) AS d
            FROM events_src_v
            WHERE CAST(ts AS DATE) BETWEEN cast('$a' as date)
                                       AND cast('$z' as date)""")
        }
        s.sql("""
          SELECT wk, round(quantileExactMerge(0.5)(qv), 4) AS med_v,
                 argMaxMerge(top_et) AS top_et,
                 argMinMerge(low_uid) AS low_uid,
                 countMerge(n) AS n
          FROM ev_mvq GROUP BY wk ORDER BY wk""")
      } finally s.conf.unset("spark.graft.warehouse")
    },
    Some("""
      WITH e AS (
        SELECT CAST(date_trunc('week', CAST(ts AS DATE)) AS DATE) AS wk,
               user_id AS uid, event_type, value AS v
        FROM events
        WHERE CAST(ts AS DATE) BETWEEN DATE '2024-01-01'
                                   AND DATE '2024-01-31'
      ), et AS (
        SELECT wk, event_type, row_number() OVER (PARTITION BY wk
          ORDER BY v DESC, event_type DESC) AS rk FROM e
      ), lu AS (
        SELECT wk, uid, row_number() OVER (PARTITION BY wk
          ORDER BY v ASC, uid ASC) AS rk FROM e
      ), q AS (
        SELECT wk, round(quantile_cont(v, 0.5), 4) AS med_v,
               CAST(count(1) AS BIGINT) AS n
        FROM e GROUP BY wk
      )
      SELECT q.wk, q.med_v, et.event_type AS top_et,
             CAST(lu.uid AS BIGINT) AS low_uid, q.n
      FROM q JOIN et ON et.wk = q.wk AND et.rk = 1
             JOIN lu ON lu.wk = q.wk AND lu.rk = 1
      ORDER BY q.wk"""))

  // ---------------------------------------------------------------------
  // CH set operators and subquery predicates: INTERSECT / EXCEPT
  // (DISTINCT spelled explicitly — CH's bare default is ALL where
  // Spark's and the standard's is DISTINCT, so portable CH text says
  // which), IN (subquery) and correlated EXISTS. All four plan as
  // joins (LeftSemi/LeftAnti), never per-row subquery re-execution —
  // the shape that survives scale.
  val q145ChSetOps = QueryDef(
    "q145_ch_set_ops_sql",
    (s, dir) => {
      Graft.table(s, dir, "events").createOrReplaceTempView("setops_ev_v")
      Graft.table(s, dir, "orders").createOrReplaceTempView("setops_ord_v")
      s.sql("""
        SELECT 'intersect' AS mode, toInt64(count(1)) AS n FROM (
          SELECT user_id FROM setops_ev_v WHERE event_type = 'click'
          INTERSECT DISTINCT
          SELECT user_id FROM setops_ev_v WHERE event_type = 'signup')
        UNION ALL
        SELECT 'except' AS mode, toInt64(count(1)) AS n FROM (
          SELECT user_id FROM setops_ev_v WHERE event_type = 'click'
          EXCEPT DISTINCT
          SELECT user_id FROM setops_ev_v WHERE event_type = 'error')
        UNION ALL
        SELECT 'in_sub' AS mode, toInt64(count(1)) AS n
        FROM setops_ev_v
        WHERE user_id IN (SELECT o_custkey FROM setops_ord_v
                          WHERE o_totalprice > 200000)
        UNION ALL
        SELECT 'exists' AS mode, toInt64(count(1)) AS n
        FROM setops_ev_v e
        WHERE EXISTS (SELECT 1 FROM setops_ord_v o
                      WHERE o.o_custkey = e.user_id
                        AND o.o_totalprice > 200000)
        ORDER BY mode""")
    },
    Some("""
      SELECT 'intersect' AS mode, CAST(count(1) AS BIGINT) AS n FROM (
        SELECT user_id FROM events WHERE event_type = 'click'
        INTERSECT
        SELECT user_id FROM events WHERE event_type = 'signup')
      UNION ALL
      SELECT 'except' AS mode, CAST(count(1) AS BIGINT) AS n FROM (
        SELECT user_id FROM events WHERE event_type = 'click'
        EXCEPT
        SELECT user_id FROM events WHERE event_type = 'error')
      UNION ALL
      SELECT 'in_sub' AS mode, CAST(count(1) AS BIGINT) AS n
      FROM events
      WHERE user_id IN (SELECT o_custkey FROM orders
                        WHERE o_totalprice > 200000)
      UNION ALL
      SELECT 'exists' AS mode, CAST(count(1) AS BIGINT) AS n
      FROM events e
      WHERE EXISTS (SELECT 1 FROM orders o
                    WHERE o.o_custkey = e.user_id
                      AND o.o_totalprice > 200000)
      ORDER BY mode"""))

  // ---------------------------------------------------------------------
  // WITH FILL ... INTERPOLATE: fill rows carry the most recent data
  // value forward in axis order (the CH chart idiom for "hold the
  // last reading across gaps") instead of the type default; leading
  // fill rows with no predecessor still take the default. Only the
  // carry-forward form — CH's `col AS expr` recomputes from the
  // PREVIOUS row, a sequential recursion with no bounded relational
  // form, and is rejected loudly. The carry window is single-partition
  // but runs over the PRESENTATION-sized fill output (which already
  // feeds the query's own global ORDER BY), never the corpus. The
  // HAVING threshold punches gaps into the daily series so both
  // carried rows and the Jan-31 tail-fill are exercised; the oracle
  // replays the carry as a native ASOF join of missing grid days to
  // the latest earlier data day.
  val q146ChFillInterpolate = QueryDef(
    "q146_ch_fill_interpolate_sql",
    (s, dir) => {
      Graft.table(s, dir, "events").createOrReplaceTempView("fillint_ev_v")
      s.sql("""
        SELECT d, n FROM (
          SELECT CAST(ts AS DATE) AS d, toInt64(count(1)) AS n
          FROM fillint_ev_v
          GROUP BY CAST(ts AS DATE) HAVING count(1) >= 334
        )
        ORDER BY d WITH FILL FROM cast('2024-01-01' as date)
                                TO cast('2024-02-01' as date)
                   INTERPOLATE (n)""")
    },
    Some("""
      WITH agg AS (
        SELECT CAST(ts AS DATE) AS d, CAST(count(1) AS BIGINT) AS n
        FROM events GROUP BY 1 HAVING count(1) >= 334
      ), grid AS (
        SELECT CAST(unnest(generate_series(DATE '2024-01-01',
          DATE '2024-01-31', INTERVAL 1 DAY)) AS DATE) AS d
      ), interp AS (
        SELECT g.d, coalesce(a.n, 0) AS n
        FROM (SELECT d FROM grid
              WHERE d NOT IN (SELECT d FROM agg)) g
        ASOF LEFT JOIN agg a ON g.d >= a.d
      )
      SELECT d, n FROM (SELECT * FROM agg UNION ALL SELECT * FROM interp)
      ORDER BY d"""))

  // maxMap/minMap (sumMap's per-key-extreme siblings, same
  // parallel-array fixture incl. in-row same-key collisions) and
  // deltaSumTimestamp — the ts-ordered counter-increase aggregate (CH
  // docs themselves deprecate block-ordered deltaSum in its favor;
  // this dialect registers deltaSum as a hard error pointing here).
  // Values snap to fixed-point via floor (NOT round: the two engines'
  // half-way rules differ — the q137 discipline); diff ties broken by
  // (ts, value) in both engines.
  val q188ChRunningMaps = QueryDef(
    "q188_ch_extreme_maps_delta",
    (s, dir) => {
      Graft.table(s, dir, "events").createOrReplaceTempView("events_v188")
      s.sql("""
        SELECT event_type,
               array_join(mm.keys, ',') AS mmk,
               array_join(CAST(mm.vals AS ARRAY<STRING>), ',') AS mmv,
               array_join(nm.keys, ',') AS nmk,
               array_join(CAST(nm.vals AS ARRAY<STRING>), ',') AS nmv,
               ds, n
        FROM (
          SELECT event_type,
                 maxMap(array(concat('k', CAST(event_id % 3 AS STRING)),
                              concat('k', CAST(event_id % 5 AS STRING))),
                        array(event_id % 7, event_id % 11)) AS mm,
                 minMap(array(concat('k', CAST(event_id % 3 AS STRING)),
                              concat('k', CAST(event_id % 5 AS STRING))),
                        array(event_id % 7, event_id % 11)) AS nm,
                 deltaSumTimestamp(CAST(floor(value * 1000) AS BIGINT),
                   ts) AS ds,
                 toInt64(count(1)) AS n
          FROM events_v188 GROUP BY event_type
        ) ORDER BY event_type""")
    },
    Some("""
      WITH p AS (
        SELECT event_type,
               unnest(['k' || CAST(event_id % 3 AS VARCHAR),
                       'k' || CAST(event_id % 5 AS VARCHAR)]) AS k,
               unnest([event_id % 7, event_id % 11]) AS v
        FROM events
      ), g AS (
        SELECT event_type, k, CAST(max(v) AS BIGINT) AS mx,
               CAST(min(v) AS BIGINT) AS mn
        FROM p GROUP BY 1, 2
      ), m AS (
        SELECT event_type,
               string_agg(k, ',' ORDER BY k) AS mmk,
               string_agg(CAST(mx AS VARCHAR), ',' ORDER BY k) AS mmv,
               string_agg(k, ',' ORDER BY k) AS nmk,
               string_agg(CAST(mn AS VARCHAR), ',' ORDER BY k) AS nmv
        FROM g GROUP BY 1
      ), d0 AS (
        SELECT event_type, CAST(floor(value * 1000) AS BIGINT) AS v, ts
        FROM events
      ), d1 AS (
        SELECT event_type,
               v - lag(v) OVER (PARTITION BY event_type
                                ORDER BY ts, v) AS dd
        FROM d0
      ), d AS (
        SELECT event_type,
               CAST(coalesce(sum(CASE WHEN dd > 0 THEN dd ELSE 0 END),
                 0) AS BIGINT) AS ds
        FROM d1 GROUP BY 1
      ), c AS (
        SELECT event_type, CAST(count(1) AS BIGINT) AS n
        FROM events GROUP BY 1
      )
      SELECT m.event_type, m.mmk, m.mmv, m.nmk, m.nmv, d.ds, c.n
      FROM m JOIN d USING (event_type) JOIN c USING (event_type)
      ORDER BY event_type"""))

  // runningAccumulate(sumState(x)) — CH's running total over an
  // aggregate state, verbatim, under this dialect's explicit-OVER
  // policy (the -State argument rides into the window unchanged).
  // The window orders a DAY-cardinality frame, not the corpus: the
  // single ordered partition is bounded by the date range.
  val q190ChRunningAccumulate = QueryDef(
    "q190_ch_running_accumulate",
    (s, dir) => {
      Graft.table(s, dir, "events").createOrReplaceTempView("events_v190")
      s.sql("""
        SELECT CAST(day AS STRING) AS day, cnt,
               runningAccumulate(sumState(cnt)) OVER (ORDER BY day
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS run
        FROM (
          SELECT toDate(ts) AS day, toInt64(count(1)) AS cnt
          FROM events_v190 GROUP BY toDate(ts)
        ) ORDER BY day""")
    },
    Some("""
      WITH d AS (
        SELECT CAST(ts AS DATE) AS day, CAST(count(1) AS BIGINT) AS cnt
        FROM events GROUP BY 1
      )
      SELECT CAST(day AS VARCHAR) AS day, cnt,
             CAST(sum(cnt) OVER (ORDER BY day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS run
      FROM d ORDER BY day"""))

  // CH bitmap vocabulary (X102) end-to-end in verbatim SQL:
  // groupBitmapState builds the per-group set, the bitmap* algebra
  // runs against a literal reference bitmap {0..49}, and the oracle
  // replays every cardinality from the distinct (event_type, value)
  // table — union/xor cardinalities derived arithmetically
  // (|bm∪ref| = hi + 50, |bm⊕ref| = (50-lo) + hi), so a wrong
  // set-algebra mapping cannot cancel out.
  val q193ChBitmap = QueryDef(
    "q193_ch_bitmap_sql",
    (s, dir) => {
      Graft.table(s, dir, "events").createOrReplaceTempView("events_v193")
      s.sql("""
        SELECT event_type,
               bitmapCardinality(bm) AS card,
               uniq_card,
               bitmapAndCardinality(bm,
                 bitmapBuild(sequence(CAST(0 AS BIGINT),
                   CAST(49 AS BIGINT)))) AS lo,
               bitmapAndnotCardinality(bm,
                 bitmapBuild(sequence(CAST(0 AS BIGINT),
                   CAST(49 AS BIGINT)))) AS hi,
               bitmapOrCardinality(bm,
                 bitmapBuild(sequence(CAST(0 AS BIGINT),
                   CAST(49 AS BIGINT)))) AS u_card,
               bitmapXorCardinality(bm,
                 bitmapBuild(sequence(CAST(0 AS BIGINT),
                   CAST(49 AS BIGINT)))) AS x_card,
               CAST(bitmapContains(bm, CAST(7 AS BIGINT)) AS BIGINT)
                 AS has7,
               array_join(CAST(slice(bitmapToArray(bm), 1, 5)
                 AS ARRAY<STRING>), ',') AS first5
        FROM (
          SELECT event_type,
                 groupBitmapState(user_id % 100) AS bm,
                 groupBitmap(user_id % 100) AS uniq_card
          FROM events_v193 GROUP BY event_type
        ) ORDER BY event_type""")
    },
    Some("""
      WITH v AS (
        SELECT DISTINCT event_type, user_id % 100 AS u FROM events
      ), agg AS (
        SELECT event_type,
               CAST(count(*) AS BIGINT) AS card,
               CAST(count(*) AS BIGINT) AS uniq_card,
               CAST(sum(CASE WHEN u <= 49 THEN 1 ELSE 0 END)
                 AS BIGINT) AS lo,
               CAST(sum(CASE WHEN u > 49 THEN 1 ELSE 0 END)
                 AS BIGINT) AS hi,
               CAST(max(CASE WHEN u = 7 THEN 1 ELSE 0 END)
                 AS BIGINT) AS has7
        FROM v GROUP BY event_type
      ), f5 AS (
        SELECT event_type,
               string_agg(CAST(u AS VARCHAR), ',' ORDER BY u) AS first5
        FROM (
          SELECT event_type, u,
                 row_number() OVER (PARTITION BY event_type
                                    ORDER BY u) AS rn
          FROM v
        ) WHERE rn <= 5 GROUP BY event_type
      )
      SELECT a.event_type, a.card, a.uniq_card, a.lo, a.hi,
             a.hi + 50 AS u_card, (50 - a.lo) + a.hi AS x_card,
             a.has7, f5.first5
      FROM agg a JOIN f5 USING (event_type)
      ORDER BY a.event_type"""))

  // CH `system.parts` introspection (X106 plumbing): the partition
  // inventory of a warehouse table through the catalog — a
  // FILESYSTEM listing (driver-sized), fresh per query like
  // system.tables. The entry builds its own week-partitioned
  // warehouse from events and the oracle derives the same partition
  // set from the raw timestamps (date_trunc week == toMonday).
  val q197ChSystemParts = QueryDef(
    "q197_ch_system_parts",
    (s, dir) => {
      import graft.sources.{Binding, Catalog, Warehouse}
      import org.apache.spark.sql.functions.col
      val tmp = sys.props("java.io.tmpdir") + "/graft_parts_q197_" +
        new java.io.File(dir).getName + "_" +
        java.lang.Integer.toHexString(
          new java.io.File(dir).getAbsolutePath.hashCode)
      graft.FsUtil.rmTree(tmp)
      val ev = Graft.table(s, dir, "events")
        .select(col("event_id"), col("ts"), col("event_type"))
      Warehouse.write(ev, tmp, "ts", Seq("event_id"),
        mode = "overwrite")
      Catalog.register(s, Binding("q197_wh", tmp))
      s.sql("""
        SELECT `table`, partition, partition_key FROM system.parts
        WHERE `table` = 'q197_wh' ORDER BY partition""")
    },
    Some("""
      SELECT 'q197_wh' AS "table",
             CAST(CAST(date_trunc('week', CAST(ts AS DATE)) AS DATE)
               AS VARCHAR) AS partition,
             'week' AS partition_key
      FROM events GROUP BY 2 ORDER BY partition"""))

  // CH `OPTIMIZE TABLE ... DEDUPLICATE` (X107): exact duplicate rows
  // dropped at merge time — the statement-level twin of the X1
  // operator. The entry double-writes a subset into its own
  // warehouse, deduplicates via the verbatim statement, and the
  // oracle is simply the ORIGINAL subset (full-row dedup of exact
  // copies is deterministic).
  val q198ChOptimizeDedup = QueryDef(
    "q198_ch_optimize_dedup",
    (s, dir) => {
      import graft.sources.{Binding, Catalog, Warehouse}
      import org.apache.spark.sql.functions.col
      val tmp = sys.props("java.io.tmpdir") + "/graft_dedup_q198_" +
        new java.io.File(dir).getName + "_" +
        java.lang.Integer.toHexString(
          new java.io.File(dir).getAbsolutePath.hashCode)
      graft.FsUtil.rmTree(tmp)
      val ev = Graft.table(s, dir, "events")
        .select(col("event_id"), col("ts"), col("event_type"))
        .filter(col("event_id") % 5 === 0)
      Warehouse.write(ev, tmp, "ts", Seq("event_id"))
      Warehouse.write(ev.filter(col("event_id") % 10 === 0), tmp,
        "ts", Seq("event_id"))
      Catalog.register(s, Binding("q198_wh", tmp))
      s.sql("OPTIMIZE TABLE q198_wh DEDUPLICATE").collect()
      s.sql("""
        SELECT event_type, toInt64(count(1)) AS n,
               toInt64(sum(event_id)) AS id_sum
        FROM q198_wh GROUP BY event_type ORDER BY event_type""")
    },
    Some("""
      SELECT event_type, CAST(count(1) AS BIGINT) AS n,
             CAST(sum(event_id) AS BIGINT) AS id_sum
      FROM events WHERE event_id % 5 = 0
      GROUP BY event_type ORDER BY event_type"""))

  // Interval-sweep aggregates (X109): intervalLengthSum — total
  // covered length of the union of [s, e) intervals (overlap counted
  // once), maxIntersections — peak concurrency, and
  // maxIntersectionsPosition — where the peak first occurs. Synthetic
  // integer intervals from event_id keep every endpoint exact;
  // one-in-11 intervals are empty and one-in-13 inverted, exercising
  // the degenerate-interval guards in both engines. The oracle
  // replays the sweep with window functions: a running max-end for
  // the union length, a ±1 boundary-event running sum for the peak
  // (delta −1 sorts before +1 at equal positions — the half-open
  // contract), and the first row reaching the peak for its position.
  val q200ChIntervalAggs = QueryDef(
    "q200_ch_interval_aggs",
    (s, dir) => {
      Graft.table(s, dir, "events").createOrReplaceTempView("events_v200")
      s.sql("""
        SELECT user_id % 8 AS cohort,
               intervalLengthSum(s, e) AS covered,
               maxIntersections(s, e) AS peak,
               maxIntersectionsPosition(s, e) AS peak_pos,
               toInt64(count(1)) AS n
        FROM (SELECT user_id,
                     (event_id * 7) % 1000 AS s,
                     (event_id * 7) % 1000 +
                       (CASE WHEN event_id % 11 = 0 THEN 0
                             WHEN event_id % 13 = 0 THEN -5
                             ELSE event_id % 97 + 5 END) AS e
              FROM events_v200)
        GROUP BY cohort ORDER BY cohort""")
    },
    Some("""
      WITH iv AS (
        SELECT user_id % 8 AS cohort,
               (event_id * 7) % 1000 AS s,
               (event_id * 7) % 1000 +
                 (CASE WHEN event_id % 11 = 0 THEN 0
                       WHEN event_id % 13 = 0 THEN -5
                       ELSE event_id % 97 + 5 END) AS e
        FROM events
      ), valid AS (
        SELECT * FROM iv WHERE e > s
      ), cov AS (
        SELECT cohort,
               greatest(0, e - greatest(s, coalesce(
                 max(e) OVER (PARTITION BY cohort ORDER BY s, e
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                 s))) AS contrib
        FROM valid
      ), cov2 AS (
        SELECT cohort, CAST(sum(contrib) AS BIGINT) AS covered
        FROM cov GROUP BY cohort
      ), ev AS (
        SELECT cohort, s AS pos, 1 AS d FROM valid
        UNION ALL
        SELECT cohort, e AS pos, -1 AS d FROM valid
      ), runs AS (
        SELECT cohort, pos, d,
               sum(d) OVER (PARTITION BY cohort ORDER BY pos, d
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run,
               row_number() OVER (PARTITION BY cohort
                 ORDER BY pos, d) AS rn
        FROM ev
      ), pk AS (
        SELECT cohort, CAST(max(run) AS BIGINT) AS peak FROM runs
        GROUP BY cohort
      ), pos AS (
        SELECT r.cohort, CAST(min_by(r.pos, r.rn) AS BIGINT) AS peak_pos
        FROM runs r JOIN pk ON r.cohort = pk.cohort AND r.run = pk.peak
        GROUP BY r.cohort
      ), cnt AS (
        SELECT user_id % 8 AS cohort, CAST(count(1) AS BIGINT) AS n
        FROM events GROUP BY cohort
      )
      SELECT cnt.cohort, coalesce(cov2.covered, 0) AS covered,
             coalesce(pk.peak, 0) AS peak,
             coalesce(pos.peak_pos, 0) AS peak_pos, cnt.n
      FROM cnt
      LEFT JOIN cov2 ON cnt.cohort = cov2.cohort
      LEFT JOIN pk ON cnt.cohort = pk.cohort
      LEFT JOIN pos ON cnt.cohort = pos.cohort
      ORDER BY cnt.cohort"""))

  // Ordered moving-window group arrays + the groupBit fold family
  // (X110). groupArrayMovingSum/Avg take an explicit ordering column
  // (CH reads nondeterministic block order — the deltaSumTimestamp
  // policy); event_id is unique, so the order is total. The moving
  // average divides by the FULL window (CH's always-k divisor) and is
  // serialized as exact ×100 integers (quarter-steps — no float
  // rendering in the compared surface). Arrays CSV-serialize (the q75
  // members pattern).
  val q201ChMovingBits = QueryDef(
    "q201_ch_moving_bits",
    (s, dir) => {
      Graft.table(s, dir, "events").createOrReplaceTempView("events_v201")
      s.sql("""
        SELECT event_type,
               concat_ws(',', groupArrayMovingSum(5)(
                 user_id + event_id % 50, event_id)) AS ms,
               concat_ws(',', groupArrayMovingSum(
                 user_id + event_id % 50, event_id)) AS rs,
               concat_ws(',', arrayMap(x -> toInt64(round(x * 100)),
                 groupArrayMovingAvg(4)(user_id, event_id))) AS ma,
               groupBitAnd(user_id + 3) AS band,
               groupBitOr(user_id + 3) AS bor,
               groupBitXor(user_id + 3) AS bxor,
               toInt64(count(1)) AS n
        FROM events_v201
        WHERE event_id % 17 = 0
        GROUP BY event_type ORDER BY event_type""")
    },
    Some("""
      WITH r AS (
        SELECT event_type, event_id, user_id,
               user_id + event_id % 50 AS x
        FROM events WHERE event_id % 17 = 0
      ), w AS (
        SELECT event_type, event_id,
               sum(x) OVER (PARTITION BY event_type ORDER BY event_id
                 ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) AS ms5,
               sum(x) OVER (PARTITION BY event_type ORDER BY event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS rsum,
               sum(user_id) OVER (PARTITION BY event_type ORDER BY event_id
                 ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) * 25 AS ma4
        FROM r
      ), agg AS (
        SELECT event_type,
               string_agg(CAST(ms5 AS VARCHAR), ',' ORDER BY event_id) AS ms,
               string_agg(CAST(rsum AS VARCHAR), ',' ORDER BY event_id) AS rs,
               string_agg(CAST(ma4 AS VARCHAR), ',' ORDER BY event_id) AS ma
        FROM w GROUP BY event_type
      ), b AS (
        SELECT event_type,
               CAST(bit_and(user_id + 3) AS BIGINT) AS band,
               CAST(bit_or(user_id + 3) AS BIGINT) AS bor,
               CAST(bit_xor(user_id + 3) AS BIGINT) AS bxor,
               CAST(count(1) AS BIGINT) AS n
        FROM r GROUP BY event_type
      )
      SELECT agg.event_type, agg.ms, agg.rs, agg.ma,
             b.band, b.bor, b.bxor, b.n
      FROM agg JOIN b ON agg.event_type = b.event_type
      ORDER BY agg.event_type"""))

  // entropy + the KMV uniqTheta sketch (X111/X112). entropy compares
  // guard-band-floored milli-bits (the q137 lesson: transcendental
  // outputs never sit raw in a hashed surface). uniqTheta(64) runs
  // the ESTIMATOR path (each event_type holds well over 64 distinct
  // event ids) and uniqTheta(user_id) the small-side exact path; the
  // oracle replays the 48-bit-MD5 KMV definition verbatim — distinct
  // hashes, 64th smallest, integer-division estimate — which is the
  // point of the md5-hex hash choice (DuckDB can compute it).
  val q202ChEntropyTheta = QueryDef(
    "q202_ch_entropy_theta",
    (s, dir) => {
      Graft.table(s, dir, "events").createOrReplaceTempView("events_v202")
      s.sql("""
        SELECT event_type,
               toInt64(floor(entropy(user_id % 20) * 1000 + 0.5)) AS ent_mb,
               uniqTheta(64)(toString(event_id)) AS theta64,
               uniqTheta(toString(user_id)) AS theta_small,
               uniqExact(user_id) AS exact_users,
               toInt64(count(1)) AS n
        FROM events_v202
        GROUP BY event_type ORDER BY event_type""")
    },
    Some("""
      WITH counts AS (
        SELECT event_type, user_id % 20 AS v, count(1) AS c
        FROM events GROUP BY event_type, v
      ), ent AS (
        SELECT event_type,
               CAST(floor((log2(sum(c)) -
                 sum(c * log2(c)) / sum(c)) * 1000 + 0.5) AS BIGINT)
                 AS ent_mb
        FROM counts GROUP BY event_type
      ), h64 AS (
        SELECT DISTINCT event_type,
               CAST('0x' || substring(md5(CAST(event_id AS VARCHAR)), 1, 12)
                 AS BIGINT) AS h
        FROM events WHERE event_id IS NOT NULL
      ), k64 AS (
        SELECT event_type, h,
               row_number() OVER (PARTITION BY event_type ORDER BY h) AS rk,
               count(1) OVER (PARTITION BY event_type) AS nh
        FROM h64
      ), t64 AS (
        SELECT event_type,
               CASE WHEN max(nh) < 64 THEN CAST(max(nh) AS BIGINT)
                    ELSE (63 * 281474976710656) //
                         max(CASE WHEN rk = 64 THEN h END)
               END AS theta64
        FROM k64 WHERE rk <= 64 GROUP BY event_type
      ), hs AS (
        SELECT DISTINCT event_type,
               CAST('0x' || substring(md5(CAST(user_id AS VARCHAR)), 1, 12)
                 AS BIGINT) AS h
        FROM events WHERE user_id IS NOT NULL
      ), ks AS (
        SELECT event_type, h,
               row_number() OVER (PARTITION BY event_type ORDER BY h) AS rk,
               count(1) OVER (PARTITION BY event_type) AS nh
        FROM hs
      ), ts AS (
        SELECT event_type,
               CASE WHEN max(nh) < 256 THEN CAST(max(nh) AS BIGINT)
                    ELSE (255 * 281474976710656) //
                         max(CASE WHEN rk = 256 THEN h END)
               END AS theta_small
        FROM ks WHERE rk <= 256 GROUP BY event_type
      ), ex AS (
        SELECT event_type,
               CAST(count(DISTINCT user_id) AS BIGINT) AS exact_users,
               CAST(count(1) AS BIGINT) AS n
        FROM events GROUP BY event_type
      )
      SELECT ex.event_type, ent.ent_mb, t64.theta64, ts.theta_small,
             ex.exact_users, ex.n
      FROM ex
      JOIN ent ON ex.event_type = ent.event_type
      JOIN t64 ON ex.event_type = t64.event_type
      JOIN ts ON ex.event_type = ts.event_type
      ORDER BY ex.event_type"""))

  // CH `SELECT DISTINCT ON (keys)` (X113): first row per key group —
  // sugar for LIMIT 1 BY, and the engine rewrites it onto the SAME
  // ChLimitBy marker (plans/TotalsParser.extractDistinctOn), so the
  // plan is the WindowGroupLimit-trimmed rank filter, not a global
  // distinct. The ORDER BY gives the within-key order (event_id DESC
  // → the latest event per cohort survives, deterministically — CH
  // leaves the survivor arbitrary, this engine's LIMIT BY policy
  // pins it to the scope's sort).
  val q203ChDistinctOn = QueryDef(
    "q203_ch_distinct_on",
    (s, dir) => {
      Graft.table(s, dir, "events").createOrReplaceTempView("events_v203")
      s.sql("""
        SELECT DISTINCT ON (cohort)
               user_id % 10 AS cohort, event_id, event_type
        FROM events_v203
        ORDER BY cohort, event_id DESC""")
    },
    Some("""
      WITH r AS (
        SELECT user_id % 10 AS cohort, event_id, event_type,
               row_number() OVER (PARTITION BY user_id % 10
                 ORDER BY event_id DESC) AS rn
        FROM events
      )
      SELECT cohort, event_id, event_type FROM r WHERE rn = 1
      ORDER BY cohort, event_id DESC"""))

  // CH pointInPolygon (X114): even-odd ray casting over a non-convex
  // pentagon (its concave notch at (10,10) is what distinguishes
  // even-odd from a convex test). Every arithmetic step is IEEE
  // +−×÷ — bit-deterministic across engines — so the oracle replays
  // the EXACT crossing formula per (point, edge) pair and the hashed
  // surface needs no guard band. No polygon edge is horizontal, so
  // the division-by-zero branch stays unreachable in both engines.
  val q204ChPointInPolygon = QueryDef(
    "q204_ch_point_in_polygon",
    (s, dir) => {
      Graft.table(s, dir, "events").createOrReplaceTempView("events_v204")
      s.sql("""
        SELECT event_type,
               toInt64(sum(pointInPolygon(px, py, array(
                 array(0.0D, 0.0D), array(20.0D, 5.0D),
                 array(10.0D, 10.0D), array(20.0D, 20.0D),
                 array(0.0D, 15.0D))))) AS inside,
               toInt64(count(1)) AS n
        FROM (SELECT event_type,
                     CAST(event_id % 40 AS DOUBLE) - 5.0D AS px,
                     CAST(user_id % 30 AS DOUBLE) - 5.0D AS py
              FROM events_v204)
        GROUP BY event_type ORDER BY event_type""")
    },
    Some("""
      WITH p AS (
        SELECT event_id, event_type,
               CAST(event_id % 40 AS DOUBLE) - 5.0 AS px,
               CAST(user_id % 30 AS DOUBLE) - 5.0 AS py
        FROM events
      ), edges(x1, y1, x2, y2) AS (
        VALUES (0.0, 0.0, 20.0, 5.0), (20.0, 5.0, 10.0, 10.0),
               (10.0, 10.0, 20.0, 20.0), (20.0, 20.0, 0.0, 15.0),
               (0.0, 15.0, 0.0, 0.0)
      ), c AS (
        SELECT p.event_id, p.event_type,
               sum(CASE WHEN ((y1 > py) != (y2 > py))
                         AND px < (x2 - x1) * (py - y1) / (y2 - y1) + x1
                   THEN 1 ELSE 0 END) AS crossings
        FROM p CROSS JOIN edges
        GROUP BY p.event_id, p.event_type
      )
      SELECT event_type,
             CAST(sum(crossings % 2) AS BIGINT) AS inside,
             CAST(count(1) AS BIGINT) AS n
      FROM c GROUP BY event_type ORDER BY event_type"""))

  // SummingMergeTree (X115): `FROM t FINAL` collapses to one row per
  // ORDER BY key — ENGINE-listed columns summed back to their
  // declared type, other non-key columns pinned to the group MINIMUM
  // (CH: "any value"; deterministic here so results replay), and a
  // merged row whose sum columns are ALL zero is DROPPED (CH's
  // documented cleanup — site 999's +1/−1 and +2.5/−2.5 cancel and
  // the site vanishes). Amounts are exact binary fractions
  // (halves/quarters), so the Float64 sum column stays
  // order-insensitive and ULP-flake-free in the hashed surface.
  val q205ChSummingMergeTree = QueryDef(
    "q205_ch_summing_merge_tree",
    (s, dir) => {
      val root = s"${sys.props("java.io.tmpdir")}/graft_ddl_q205_" +
        new java.io.File(dir).getName
      graft.FsUtil.rmTree(root)
      s.conf.set("spark.graft.warehouse", root)
      try {
        Graft.table(s, dir, "events")
          .createOrReplaceTempView("events_src_v205")
        s.sql("""
          CREATE TABLE metrica.daily_sums
          (
              `site` UInt32,
              `d` Date,
              `clicks` Int64,
              `amount` Float64,
              `label` String
          )
          ENGINE = SummingMergeTree(clicks, amount)
          PARTITION BY toMonday(d)
          ORDER BY (site, d)
          SETTINGS index_granularity = 8192""")
        s.sql("""
          INSERT INTO daily_sums
          SELECT CAST(user_id % 12 AS INT) AS site, CAST(ts AS DATE) AS d,
                 CAST(CASE WHEN event_type = 'click' THEN 1
                           WHEN event_type = 'view' THEN 2
                           ELSE 0 END AS BIGINT) AS clicks,
                 CAST(CASE WHEN event_type = 'view' THEN 0.5
                           WHEN event_type = 'error' THEN 1.5
                           ELSE 0.25 END AS DOUBLE) AS amount,
                 event_type AS label
          FROM events_src_v205
          UNION ALL
          SELECT 999, DATE '2024-01-01', CAST(1 AS BIGINT),
                 CAST(2.5 AS DOUBLE), 'z'
          UNION ALL
          SELECT 999, DATE '2024-01-01', CAST(-1 AS BIGINT),
                 CAST(-2.5 AS DOUBLE), 'z'""")
        s.sql("""
          SELECT site, toInt64(count(1)) AS days,
                 toInt64(sum(clicks)) AS clicks,
                 round(sum(amount), 2) AS amount, min(label) AS lbl
          FROM daily_sums FINAL
          GROUP BY site ORDER BY site""")
      } finally s.conf.unset("spark.graft.warehouse")
    },
    Some("""
      WITH src AS (
        SELECT CAST(user_id % 12 AS INT) AS site, CAST(ts AS DATE) AS d,
               CAST(CASE WHEN event_type = 'click' THEN 1
                         WHEN event_type = 'view' THEN 2
                         ELSE 0 END AS BIGINT) AS clicks,
               CAST(CASE WHEN event_type = 'view' THEN 0.5
                         WHEN event_type = 'error' THEN 1.5
                         ELSE 0.25 END AS DOUBLE) AS amount,
               event_type AS label
        FROM events
        UNION ALL
        SELECT 999, DATE '2024-01-01', 1, 2.5, 'z'
        UNION ALL
        SELECT 999, DATE '2024-01-01', -1, -2.5, 'z'
      ), merged AS (
        SELECT site, d, CAST(sum(clicks) AS BIGINT) AS clicks,
               sum(amount) AS amount, min(label) AS label
        FROM src GROUP BY site, d
      ), kept AS (
        SELECT * FROM merged WHERE clicks != 0 OR amount != 0
      )
      SELECT site, CAST(count(1) AS BIGINT) AS days,
             CAST(sum(clicks) AS BIGINT) AS clicks,
             round(sum(amount), 2) AS amount, min(label) AS lbl
      FROM kept GROUP BY site ORDER BY site"""))

  // Rank-test family (X116, plans/NativeStats.scala): mannWhitneyUTest,
  // kolmogorovSmirnovTest, rankCorr — statistic-only (the p-value
  // CDF-approximation families are library-specific; see the
  // determinism policy in NativeStats). The compared surface is exact:
  // 2·U and dnum = D·n₁·n₂ are integers recovered by round() (≤ 1 ulp
  // error against values ≪ 2^52), and ρ is the same three final IEEE
  // ops on the same exact integers in both engines — bit-identical
  // doubles, no tolerance. x has only 97 distinct values per cohort,
  // so mid-rank tie handling is exercised, not just unique ranks.
  val q206ChRankTests = QueryDef(
    "q206_ch_rank_tests",
    (s, dir) => {
      Graft.table(s, dir, "events").createOrReplaceTempView("events_v206")
      s.sql("""
        SELECT cohort,
               toInt64(round(2 * mannWhitneyUTest(x, idx))) AS u2,
               toInt64(round(kolmogorovSmirnovTest(x, idx) *
                 countIf(idx = 0) * countIf(idx != 0))) AS dnum,
               rankCorr(x, y) AS rho,
               toInt64(count(1)) AS n
        FROM (SELECT user_id % 6 AS cohort, event_id % 2 AS idx,
                     (event_id * 13) % 97 AS x,
                     ((event_id * 13) % 97) * 3 + user_id % 23 AS y
              FROM events_v206)
        GROUP BY cohort ORDER BY cohort""")
    },
    Some("""
      WITH src AS (
        SELECT user_id % 6 AS cohort, event_id % 2 AS idx,
               (event_id * 13) % 97 AS x,
               ((event_id * 13) % 97) * 3 + user_id % 23 AS y
        FROM events
      ), rk AS (
        SELECT cohort, idx,
               2*rank() OVER (PARTITION BY cohort ORDER BY x)
                 + count(*) OVER (PARTITION BY cohort, x) - 1 AS r2x,
               2*rank() OVER (PARTITION BY cohort ORDER BY y)
                 + count(*) OVER (PARTITION BY cohort, y) - 1 AS r2y
        FROM src
      ), mwu AS (
        SELECT cohort,
               sum(CASE WHEN idx = 0 THEN r2x ELSE 0 END) AS rsum2,
               sum(CASE WHEN idx = 0 THEN 1 ELSE 0 END) AS n1,
               sum(CASE WHEN idx != 0 THEN 1 ELSE 0 END) AS n2,
               count(*) AS nn
        FROM rk GROUP BY cohort
      ), ksg AS (
        SELECT cohort, x,
               sum(CASE WHEN idx = 0 THEN 1 ELSE 0 END) AS a,
               sum(CASE WHEN idx != 0 THEN 1 ELSE 0 END) AS b
        FROM src GROUP BY cohort, x
      ), ksc AS (
        SELECT cohort,
               sum(a) OVER (PARTITION BY cohort ORDER BY x) AS c1,
               sum(b) OVER (PARTITION BY cohort ORDER BY x) AS c2
        FROM ksg
      ), ks AS (
        SELECT k.cohort, max(abs(m.n2 * k.c1 - m.n1 * k.c2)) AS dnum
        FROM ksc k JOIN mwu m ON k.cohort = m.cohort
        GROUP BY k.cohort
      ), sp AS (
        SELECT cohort, CAST(count(*) AS HUGEINT) AS n,
               CAST(sum(r2x * r2y) AS HUGEINT) AS sxy,
               CAST(sum(r2x) AS HUGEINT) AS sx,
               CAST(sum(r2y) AS HUGEINT) AS sy,
               CAST(sum(r2x * r2x) AS HUGEINT) AS sxx,
               CAST(sum(r2y * r2y) AS HUGEINT) AS syy
        FROM rk GROUP BY cohort
      ), rho AS (
        SELECT cohort,
               CAST(n*sxy - sx*sy AS DOUBLE) /
                 sqrt(CAST(n*sxx - sx*sx AS DOUBLE) *
                      CAST(n*syy - sy*sy AS DOUBLE)) AS rho
        FROM sp
      )
      SELECT m.cohort, CAST(m.rsum2 - m.n1*(m.n1+1) AS BIGINT) AS u2,
             CAST(ks.dnum AS BIGINT) AS dnum, rho.rho AS rho,
             CAST(m.nn AS BIGINT) AS n
      FROM mwu m
      JOIN ks ON m.cohort = ks.cohort
      JOIN rho ON m.cohort = rho.cohort
      ORDER BY m.cohort"""))

  // Regression family (X117, graft.functions.ch): simpleLinearRegression
  // → named tuple (k, b) unpacked by subquery field access, plus
  // corrStable — Pearson over exact decimal moment sums (plain `corr`
  // stays Spark's builtin; see the ChDialect registry note). All three
  // doubles are the same final IEEE expressions over the same exact
  // integers in both engines.
  val q207ChRegression = QueryDef(
    "q207_ch_regression",
    (s, dir) => {
      Graft.table(s, dir, "lineitem")
        .createOrReplaceTempView("lineitem_v207")
      s.sql("""
        SELECT flag, r.k AS k, r.b AS b, c, n FROM (
          SELECT l_returnflag AS flag,
                 simpleLinearRegression(x, y) AS r,
                 corrStable(x, y) AS c,
                 toInt64(count(1)) AS n
          FROM (SELECT l_returnflag,
                       l_partkey % 1000 AS x,
                       (l_partkey % 1000) * 3 + l_suppkey % 100 AS y
                FROM lineitem_v207)
          GROUP BY l_returnflag
        ) ORDER BY flag""")
    },
    Some("""
      WITH src AS (
        SELECT l_returnflag AS flag, l_partkey % 1000 AS x,
               (l_partkey % 1000) * 3 + l_suppkey % 100 AS y
        FROM lineitem
      ), s AS (
        SELECT flag, CAST(count(*) AS HUGEINT) AS n,
               CAST(sum(x) AS HUGEINT) AS sx,
               CAST(sum(y) AS HUGEINT) AS sy,
               CAST(sum(x*y) AS HUGEINT) AS sxy,
               CAST(sum(x*x) AS HUGEINT) AS sxx,
               CAST(sum(y*y) AS HUGEINT) AS syy
        FROM src GROUP BY flag
      )
      SELECT flag,
             CAST(n*sxy - sx*sy AS DOUBLE) /
               CAST(n*sxx - sx*sx AS DOUBLE) AS k,
             (CAST(sy AS DOUBLE) -
               (CAST(n*sxy - sx*sy AS DOUBLE) /
                CAST(n*sxx - sx*sx AS DOUBLE)) * CAST(sx AS DOUBLE))
               / CAST(n AS DOUBLE) AS b,
             CAST(n*sxy - sx*sy AS DOUBLE) /
               sqrt(CAST(n*sxx - sx*sx AS DOUBLE) *
                    CAST(n*syy - sy*sy AS DOUBLE)) AS c,
             CAST(n AS BIGINT) AS n
      FROM s ORDER BY flag"""))

  // URL hierarchy / authority family (X118, functions/url.scala):
  // URLHierarchy / URLPathHierarchy (drill-down prefixes — the
  // Metrica report dimension over page URLs), the
  // cutToFirstSignificantSubdomain owner-domain cut,
  // extractURLParameterNames/Parameters, netloc (full authority with
  // userinfo and port), and encodeURLComponent. URLs are constructed
  // from fixture columns identically in both engines (the q74/q186
  // pattern); hierarchy arrays serialize with '|' (the q75 members
  // pattern). The oracle rebuilds the hierarchies with
  // regexp_extract_all + list lambdas and the expected encoding with
  // chained replaces over the constrained input alphabet (DuckDB has
  // no url_encode). Pure codegen'd projections — zero shuffles beyond
  // the final 90-group rollup.
  val q208ChUrlHierarchy = QueryDef(
    "q208_ch_url_hierarchy",
    (s, dir) => {
      Graft.table(s, dir, "events").createOrReplaceTempView("events_v208")
      s.sql("""
        SELECT hostk, qk, dk, fk,
               min(concat_ws('|', URLHierarchy(u))) AS hier,
               max(concat_ws('|', URLPathHierarchy(u))) AS ph,
               min(cutToFirstSignificantSubdomain(u)) AS fsd,
               min(concat_ws(',', extractURLParameterNames(u))) AS names,
               max(concat_ws(',', extractURLParameters(u))) AS params,
               min(netloc(u)) AS nl,
               min(encodeURLComponent(concat('a b+/', et))) AS enc,
               toInt64(count(1)) AS n
        FROM (
          SELECT user_id % 3 AS hostk, event_id % 2 AS qk,
                 event_id % 3 AS dk, event_id % 5 AS fk,
                 event_type AS et,
                 CONCAT('https://',
                   CASE WHEN user_id % 3 = 0
                          THEN 'user:pw@www.news.portal.com:8080'
                        WHEN user_id % 3 = 1 THEN 'blog.example.org'
                        ELSE 'shop.site.co.uk' END,
                   '/cat', CAST(event_id % 4 AS STRING),
                   CASE WHEN event_id % 3 = 0
                        THEN CONCAT('//item', CAST(event_id % 7 AS STRING))
                        ELSE CONCAT('/p', CAST(event_id % 5 AS STRING)) END,
                   CASE WHEN event_id % 2 = 0
                        THEN CONCAT('?q=', CAST(user_id % 10 AS STRING),
                                    '&utm_source=x&flag')
                        ELSE '' END,
                   CASE WHEN event_id % 5 = 0 THEN '#frag' ELSE '' END) AS u
          FROM events_v208)
        GROUP BY hostk, qk, dk, fk
        ORDER BY hostk, qk, dk, fk""")
    },
    Some("""
      WITH raw AS (
        SELECT user_id % 3 AS hostk, event_id % 2 AS qk,
               event_id % 3 AS dk, event_id % 5 AS fk,
               event_type AS et,
               'https://' ||
                 CASE WHEN user_id % 3 = 0
                        THEN 'user:pw@www.news.portal.com:8080'
                      WHEN user_id % 3 = 1 THEN 'blog.example.org'
                      ELSE 'shop.site.co.uk' END ||
                 '/cat' || CAST(event_id % 4 AS VARCHAR) ||
                 CASE WHEN event_id % 3 = 0
                      THEN '//item' || CAST(event_id % 7 AS VARCHAR)
                      ELSE '/p' || CAST(event_id % 5 AS VARCHAR) END ||
                 CASE WHEN event_id % 2 = 0
                      THEN '?q=' || CAST(user_id % 10 AS VARCHAR) ||
                           '&utm_source=x&flag'
                      ELSE '' END ||
                 CASE WHEN event_id % 5 = 0 THEN '#frag' ELSE '' END AS u
        FROM events
      ), parts AS (
        SELECT *,
               regexp_extract(u,
                 '^((?:[A-Za-z][A-Za-z0-9+.-]*://)?[^/?#]*)', 1) AS pfx
        FROM raw
      ), tok AS (
        SELECT *,
               regexp_extract_all(u[length(pfx)+1:],
                 '[^/?]*[/?]+|[^/?]+') AS toks,
               regexp_extract(
                 regexp_replace(u, '^[A-Za-z][A-Za-z0-9+.-]*://', ''),
                 '^([^/?#]*)', 1) AS nl0
        FROM parts
      ), tok2 AS (
        SELECT *,
               str_split(regexp_extract(
                 regexp_replace(nl0, '^[^/@?#]*@', ''),
                 '^([^/:?#]+)', 1), '.') AS hp
        FROM tok
      ), comp AS (
        SELECT hostk, qk, dk, fk,
               CASE WHEN len(toks) = 0 THEN u
                    ELSE array_to_string(list_transform(
                      range(1, len(toks)+1),
                      i -> pfx || array_to_string(toks[1:i], '')), '|')
               END AS hier,
               coalesce(array_to_string(list_filter(list_transform(
                 range(1, len(toks)+1),
                 i -> array_to_string(toks[1:i], '')),
                 e -> e != '/'), '|'), '') AS ph,
               CASE
                 WHEN len(hp) >= 3 AND hp[len(hp)-1] IN
                   ('com','net','org','co')
                   THEN array_to_string(hp[len(hp)-2:len(hp)], '.')
                 WHEN len(hp) >= 2
                   THEN array_to_string(hp[len(hp)-1:len(hp)], '.')
                 ELSE '' END AS fsd,
               coalesce(array_to_string(regexp_extract_all(u,
                 '[?&]([^=&#]+)', 1), ','), '') AS names,
               coalesce(array_to_string(regexp_extract_all(u,
                 '[?&]([^&#]+)', 1), ','), '') AS params,
               nl0 AS nl,
               replace(replace(replace('a b+/' || et,
                 '+', '%2B'), ' ', '%20'), '/', '%2F') AS enc
        FROM tok2
      )
      SELECT hostk, qk, dk, fk,
             min(hier) AS hier, max(ph) AS ph, min(fsd) AS fsd,
             min(names) AS names, max(params) AS params,
             min(nl) AS nl, min(enc) AS enc,
             CAST(count(1) AS BIGINT) AS n
      FROM comp
      GROUP BY hostk, qk, dk, fk
      ORDER BY hostk, qk, dk, fk"""))

  // Report-rendering vocabulary (X120): histogram(bins)(x) as the
  // pinned DETERMINISTIC equal-width variant (CH's adaptive histogram
  // is nondeterministic by design — ch.histogramEq's doc), bar() with
  // unicode-eighth cells, formatReadableSize/Quantity with the
  // floor(v·100+0.5) two-decimal rendering (printf's %.2f rounds
  // HALF_UP on the JVM and half-even in C — a format string would
  // diverge at half-boundaries), and the median* sugar over the
  // percentile rewrite. Histogram bounds serialize as ×100 integers
  // (same IEEE mn + i·w both engines → same floor); bar/size/quantity
  // feed on exact integers so every division replays.
  val q210ChRenderHistogram = QueryDef(
    "q210_ch_render_histogram",
    (s, dir) => {
      Graft.table(s, dir, "events").createOrReplaceTempView("events_v210")
      s.sql("""
        SELECT event_type,
               concat_ws('|', transform(histogram(8)(value),
                 h -> concat(CAST(floor(h.lo * 100 + 0.5) AS BIGINT), ':',
                             CAST(floor(h.hi * 100 + 0.5) AS BIGINT), ':',
                             CAST(h.cnt AS BIGINT)))) AS hist,
               bar(count(1) % 700, 0, 700, 10) AS b,
               formatReadableSize(sum(user_id % 4096) * 1024) AS sz,
               formatReadableQuantity(count(1) * 12345) AS qty,
               round(medianExact(value), 4) AS med,
               toInt64(count(1)) AS n
        FROM events_v210
        GROUP BY event_type ORDER BY event_type""")
    },
    Some("""
      WITH st AS (
        SELECT event_type, min(value) AS mn, max(value) AS mx,
               (max(value) - min(value)) / 8 AS w,
               count(1) AS n, sum(user_id % 4096) AS uidsum,
               quantile_cont(value, 0.5) AS med
        FROM events GROUP BY event_type
      ), bidx AS (
        SELECT e.event_type,
               CASE WHEN st.w = 0 THEN 0
                    ELSE least(CAST(floor((e.value - st.mn) / st.w)
                      AS INT), 7) END AS i
        FROM events e JOIN st ON e.event_type = st.event_type
      ), bc AS (
        SELECT event_type, i, count(1) AS c FROM bidx GROUP BY 1, 2
      ), grid AS (
        SELECT st.event_type, gs.i
        FROM st CROSS JOIN (SELECT unnest(range(8)) AS i) gs
      ), hist0 AS (
        SELECT g.event_type, g.i, coalesce(bc.c, 0) AS c
        FROM grid g LEFT JOIN bc
          ON g.event_type = bc.event_type AND g.i = bc.i
      ), hists AS (
        SELECT h.event_type,
               string_agg(
                 CAST(floor((st.mn + h.i * st.w) * 100 + 0.5) AS BIGINT)
                 || ':' ||
                 CAST(floor((st.mn + (h.i + 1) * st.w) * 100 + 0.5)
                   AS BIGINT)
                 || ':' || h.c, '|' ORDER BY h.i) AS hist
        FROM hist0 h JOIN st ON h.event_type = st.event_type
        GROUP BY h.event_type
      ), rend AS (
        SELECT event_type,
               CAST(floor((n % 700) / 700.0 * 80) AS INT) AS e,
               uidsum * 1024 AS bytes, n * 12345 AS q, med, n
        FROM st
      ), fin AS (
        SELECT event_type,
               repeat('█', e // 8) ||
                 (['', '▏', '▎', '▍', '▌', '▋', '▊', '▉'])[(e % 8) + 1]
                 AS b,
               CASE
                 WHEN bytes < 1024 THEN
                   (CAST(floor(bytes * 100 + 0.5) AS BIGINT) // 100)
                   || '.' || lpad(CAST(CAST(floor(bytes * 100 + 0.5)
                     AS BIGINT) % 100 AS VARCHAR), 2, '0') || ' B'
                 WHEN bytes < 1048576 THEN
                   (CAST(floor(bytes / 1024.0 * 100 + 0.5) AS BIGINT)
                     // 100)
                   || '.' || lpad(CAST(CAST(floor(bytes / 1024.0 * 100
                     + 0.5) AS BIGINT) % 100 AS VARCHAR), 2, '0')
                   || ' KiB'
                 WHEN bytes < 1073741824 THEN
                   (CAST(floor(bytes / 1048576.0 * 100 + 0.5) AS BIGINT)
                     // 100)
                   || '.' || lpad(CAST(CAST(floor(bytes / 1048576.0
                     * 100 + 0.5) AS BIGINT) % 100 AS VARCHAR), 2, '0')
                   || ' MiB'
                 ELSE
                   (CAST(floor(bytes / 1073741824.0 * 100 + 0.5)
                     AS BIGINT) // 100)
                   || '.' || lpad(CAST(CAST(floor(bytes / 1073741824.0
                     * 100 + 0.5) AS BIGINT) % 100 AS VARCHAR), 2, '0')
                   || ' GiB'
               END AS sz,
               CASE
                 WHEN q < 1000 THEN
                   (CAST(floor(q * 100 + 0.5) AS BIGINT) // 100)
                   || '.' || lpad(CAST(CAST(floor(q * 100 + 0.5)
                     AS BIGINT) % 100 AS VARCHAR), 2, '0')
                 WHEN q < 1000000 THEN
                   (CAST(floor(q / 1e3 * 100 + 0.5) AS BIGINT) // 100)
                   || '.' || lpad(CAST(CAST(floor(q / 1e3 * 100 + 0.5)
                     AS BIGINT) % 100 AS VARCHAR), 2, '0')
                   || ' thousand'
                 WHEN q < 1000000000 THEN
                   (CAST(floor(q / 1e6 * 100 + 0.5) AS BIGINT) // 100)
                   || '.' || lpad(CAST(CAST(floor(q / 1e6 * 100 + 0.5)
                     AS BIGINT) % 100 AS VARCHAR), 2, '0')
                   || ' million'
                 ELSE
                   (CAST(floor(q / 1e9 * 100 + 0.5) AS BIGINT) // 100)
                   || '.' || lpad(CAST(CAST(floor(q / 1e9 * 100 + 0.5)
                     AS BIGINT) % 100 AS VARCHAR), 2, '0')
                   || ' billion'
               END AS qty,
               round(med, 4) AS med, CAST(n AS BIGINT) AS n
        FROM rend
      )
      SELECT f.event_type, hists.hist, f.b, f.sz, f.qty, f.med, f.n
      FROM fin f JOIN hists ON f.event_type = hists.event_type
      ORDER BY f.event_type"""))

  // Array/string vocabulary gap-fill (X121) in verbatim CH SQL:
  // arrayFirstIndex / arraySplit (ArrayAggregate folds — a lambda
  // argument requires the root to be the HOF), countEqual (null-safe),
  // arrayProduct (Float64 fold), arrayJaccardIndex (two exact set
  // sizes, one division), hasSubstr (contiguous-run probe),
  // splitByRegexp (CH argument order, trailing empties),
  // multiSearchAllPositions (1-based, 0 on miss), hex/unhex round
  // trip, halfMD5 (first 8 MD5 bytes as unsigned — serialized as a
  // string so DuckDB's UBIGINT and Spark's decimal(20,0) compare in
  // the same dtype), toFixedString/toStringCutToZero. The oracle
  // replays the three-element array algebra with scalar CASEs and the
  // list forms with DuckDB lambdas.
  val q211ChArrayGapFill = QueryDef(
    "q211_ch_array_gap_fill",
    (s, dir) => {
      Graft.table(s, dir, "events").createOrReplaceTempView("events_v211")
      s.sql("""
        SELECT event_type, k,
               min(arrayFirstIndex(x -> x > 2, arr)) AS fi,
               max(concat_ws('|', transform(arraySplit(x -> x = 0, arr),
                 g -> concat_ws(',', transform(g,
                   e -> CAST(e AS STRING)))))) AS spl,
               toInt64(sum(countEqual(arr, 1))) AS ce,
               round(sum(arrayProduct(array(1 + event_id % 3, 2))), 1)
                 AS ap,
               round(min(arrayJaccardIndex(arr, array(1, 2, 3))), 6)
                 AS aj,
               toInt64(sum(if(hasSubstr(arr,
                 array(event_id % 5, event_id % 7)), 1, 0))) AS hs,
               min(concat_ws('|',
                 splitByRegexp('[aeiou]+', event_type))) AS sbr,
               min(concat_ws(',', transform(
                 multiSearchAllPositions(event_type,
                   array('a', 'ck', 'zz')),
                 p -> CAST(p AS STRING)))) AS msp,
               min(hex(event_type)) AS hx,
               toInt64(sum(if(unhex(hex(event_type)) = event_type, 1, 0)))
                 AS uh,
               min(CAST(halfMD5(event_type) AS STRING)) AS hm,
               min(toStringCutToZero(toFixedString(
                 substring(event_type, 1, 3), 6))) AS cut,
               toInt64(count(1)) AS n
        FROM (SELECT event_type, event_id % 4 AS k, event_id,
                     array(event_id % 7, event_id % 5, event_id % 3) AS arr
              FROM events_v211)
        GROUP BY event_type, k
        ORDER BY event_type, k""")
    },
    Some("""
      WITH src AS (
        SELECT event_type, event_id % 4 AS k, event_id,
               event_id % 7 AS a1, event_id % 5 AS a2, event_id % 3 AS a3
        FROM events
      ), per AS (
        SELECT event_type, k,
               CASE WHEN a1 > 2 THEN 1 WHEN a2 > 2 THEN 2
                    WHEN a3 > 2 THEN 3 ELSE 0 END AS fi,
               CASE
                 WHEN a2 != 0 AND a3 != 0 THEN a1 || ',' || a2 || ',' || a3
                 WHEN a2 = 0 AND a3 != 0 THEN a1 || '|' || '0,' || a3
                 WHEN a2 != 0 AND a3 = 0 THEN a1 || ',' || a2 || '|' || '0'
                 ELSE a1 || '|0|0'
               END AS spl,
               (CASE WHEN a1 = 1 THEN 1 ELSE 0 END) +
               (CASE WHEN a2 = 1 THEN 1 ELSE 0 END) +
               (CASE WHEN a3 = 1 THEN 1 ELSE 0 END) AS ce,
               (1 + event_id % 3) * 2.0 AS ap,
               CAST(len(list_filter(list_distinct([a1, a2, a3]),
                 e -> list_contains([1, 2, 3], e))) AS DOUBLE) /
                 len(list_distinct([a1, a2, a3, 1, 2, 3])) AS aj,
               CASE WHEN (a1 = a2 AND a2 = a1) OR (a2 = a2 AND a3 = a1)
                    THEN 1 ELSE 0 END AS hs,
               array_to_string(string_split_regex(event_type,
                 '[aeiou]+'), '|') AS sbr,
               strpos(event_type, 'a') || ',' || strpos(event_type, 'ck')
                 || ',' || strpos(event_type, 'zz') AS msp,
               hex(event_type) AS hx,
               CASE WHEN CAST(unhex(hex(event_type)) AS VARCHAR)
                         = event_type THEN 1 ELSE 0 END AS uh,
               CAST(CAST(concat('0x', substring(md5(event_type), 1, 16))
                 AS UBIGINT) AS VARCHAR) AS hm,
               substring(event_type, 1, 3) AS cut
        FROM src
      )
      SELECT event_type, k,
             CAST(min(fi) AS BIGINT) AS fi, max(spl) AS spl,
             CAST(sum(ce) AS BIGINT) AS ce, round(sum(ap), 1) AS ap,
             round(min(aj), 6) AS aj, CAST(sum(hs) AS BIGINT) AS hs,
             min(sbr) AS sbr, min(msp) AS msp, min(hx) AS hx,
             CAST(sum(uh) AS BIGINT) AS uh, min(hm) AS hm,
             min(cut) AS cut, CAST(count(1) AS BIGINT) AS n
      FROM per GROUP BY event_type, k
      ORDER BY event_type, k"""))

  // largestTriangleThreeBuckets (X122, plans/NativeStats.scala): the
  // LTTB dashboard decimator as a verbatim CH parameterized aggregate.
  // The selection is SEQUENTIAL (each pick depends on the previous),
  // so the oracle replays it with a RECURSIVE CTE: per (group, step),
  // a correlated scalar subquery ranks the step's bucket by the same
  // denominator-cleared exact-integer doubled-area the Scala fold
  // uses (|(px·c − Σx)(yc − py) − (px − xc)(Σy − py·c)| in HUGEINT),
  // first-of-max tie-break via ORDER BY rn. x = event_id is unique,
  // so the (x, y) sort is total. n = 8 → 6 middle buckets.
  val q212ChLttb = QueryDef(
    "q212_ch_lttb",
    (s, dir) => {
      Graft.table(s, dir, "events").createOrReplaceTempView("events_v212")
      s.sql("""
        SELECT event_type,
               concat_ws('|', transform(
                 largestTriangleThreeBuckets(8)(event_id,
                   toInt64(round(value * 100))),
                 p -> concat(p.x, ':', p.y))) AS pts,
               toInt64(count(1)) AS n
        FROM events_v212
        GROUP BY event_type ORDER BY event_type""")
    },
    Some("""
      WITH RECURSIVE src AS (
        SELECT event_type AS et, event_id AS x,
               CAST(round(value * 100) AS BIGINT) AS y
        FROM events
      ), ord AS (
        SELECT et, x, y,
               row_number() OVER (PARTITION BY et ORDER BY x) - 1 AS rn,
               count(*) OVER (PARTITION BY et) AS nn
        FROM src
      ), steps AS (
        SELECT unnest(range(6)) AS step
      ), nbs AS (
        SELECT o.et, st.step,
               CAST(count(*) AS HUGEINT) AS c,
               CAST(sum(o.x) AS HUGEINT) AS sx,
               CAST(sum(o.y) AS HUGEINT) AS sy
        FROM ord o JOIN steps st
          ON o.rn >= CASE WHEN st.step = 5 THEN o.nn - 1
                     ELSE 1 + (st.step + 1) * (o.nn - 2) // 6 END
         AND o.rn < CASE WHEN st.step = 5 THEN o.nn
                    ELSE 1 + (st.step + 2) * (o.nn - 2) // 6 END
        GROUP BY o.et, st.step
      ), sel AS (
        SELECT et, 0 AS step, x AS px, y AS py, nn FROM ord WHERE rn = 0
        UNION ALL
        SELECT s.et, s.step + 1,
          (SELECT c.x FROM ord c JOIN nbs b
             ON b.et = s.et AND b.step = s.step
           WHERE c.et = s.et
             AND c.rn >= 1 + s.step * (s.nn - 2) // 6
             AND c.rn < 1 + (s.step + 1) * (s.nn - 2) // 6
           ORDER BY abs(
             (CAST(s.px AS HUGEINT) * b.c - b.sx) * (c.y - s.py) -
             (CAST(s.px AS HUGEINT) - c.x) *
               (b.sy - CAST(s.py AS HUGEINT) * b.c)) DESC, c.rn
           LIMIT 1),
          (SELECT c.y FROM ord c JOIN nbs b
             ON b.et = s.et AND b.step = s.step
           WHERE c.et = s.et
             AND c.rn >= 1 + s.step * (s.nn - 2) // 6
             AND c.rn < 1 + (s.step + 1) * (s.nn - 2) // 6
           ORDER BY abs(
             (CAST(s.px AS HUGEINT) * b.c - b.sx) * (c.y - s.py) -
             (CAST(s.px AS HUGEINT) - c.x) *
               (b.sy - CAST(s.py AS HUGEINT) * b.c)) DESC, c.rn
           LIMIT 1),
          s.nn
        FROM sel s WHERE s.step < 6
      ), allsel AS (
        SELECT et, step, px, py FROM sel
        UNION ALL
        SELECT et, 7, x, y FROM ord WHERE rn = nn - 1
      )
      SELECT a.et AS event_type,
             string_agg(a.px || ':' || a.py, '|' ORDER BY a.step) AS pts,
             CAST(min(o.nn) AS BIGINT) AS n
      FROM allsel a JOIN (SELECT DISTINCT et, nn FROM ord) o
        ON a.et = o.et
      GROUP BY a.et ORDER BY a.et"""),
    bench = true)

  // CH table PROJECTIONs (X123, plans/ChProjections.scala): ADD
  // PROJECTION materializes the rollup next to the table and the
  // optimizer silently rewrites any GROUP-BY-subset aggregate (with
  // key-only filters) onto the stored partials — sum over sums, sum
  // over counts, max over maxes. The entry REQUIRES the rewrite
  // actually planned onto the projection parquet (the executedPlan
  // must scan `__proj_`), so a silently-lost rewrite fails the driver
  // row, not just a spec. The oracle replays the same aggregates on
  // the raw events — identical results through a different access
  // path is exactly the projection contract.
  val q213ChProjection = QueryDef(
    "q213_ch_projection",
    (s, dir) => {
      val root = s"${sys.props("java.io.tmpdir")}/graft_ddl_q213_" +
        new java.io.File(dir).getName
      graft.FsUtil.rmTree(root)
      s.conf.set("spark.graft.warehouse", root)
      try {
        Graft.table(s, dir, "events")
          .createOrReplaceTempView("events_src_v213")
        s.sql("""
          CREATE TABLE metrica.proj_events
          (
              `site` UInt32,
              `d` Date,
              `etype` String,
              `clicks` Int64,
              `amount` Float64
          )
          ENGINE = MergeTree
          PARTITION BY toMonday(d)
          ORDER BY (site, etype)
          SETTINGS index_granularity = 8192""")
        s.sql("""
          INSERT INTO proj_events
          SELECT CAST(user_id % 16 AS INT) AS site, CAST(ts AS DATE) AS d,
                 event_type AS etype,
                 CAST(event_id % 97 AS BIGINT) AS clicks,
                 CAST(round(value * 4) / 4 AS DOUBLE) AS amount
          FROM events_src_v213""")
        s.sql("""
          ALTER TABLE proj_events ADD PROJECTION by_site_type
          (SELECT site, etype, sum(clicks), count(), max(amount),
                  min(clicks)
           GROUP BY site, etype)""")
        val q = s.sql("""
          SELECT site, toInt64(sum(clicks)) AS clicks,
                 toInt64(count(1)) AS n, round(max(amount), 2) AS mx
          FROM proj_events
          WHERE etype != 'error'
          GROUP BY site ORDER BY site""")
        val plan = q.queryExecution.executedPlan.toString
        require(plan.contains("__proj_"),
          "q213: the rollup was NOT rewritten onto the projection — " +
            "plan reads the raw table:\n" + plan)
        q
      } finally s.conf.unset("spark.graft.warehouse")
    },
    Some("""
      WITH src AS (
        SELECT CAST(user_id % 16 AS INT) AS site, event_type AS etype,
               event_id % 97 AS clicks,
               round(value * 4) / 4 AS amount
        FROM events
      )
      SELECT site, CAST(sum(clicks) AS BIGINT) AS clicks,
             CAST(count(1) AS BIGINT) AS n,
             round(max(amount), 2) AS mx
      FROM src WHERE etype != 'error'
      GROUP BY site ORDER BY site"""))

  // CH partition operations (X124, plans/ChAlterTable.scala): DROP /
  // DETACH / ATTACH / MOVE PARTITION over the warehouse's week
  // directories — pure renames, never a data rewrite (CH's MergeTree
  // ops toolbox; at 100 TB a partition op that rewrites is a
  // full-partition job for a directory move). The workflow drops the
  // earliest week, round-trips the second through DETACH/ATTACH
  // (counting the detached state in between), and MOVEs the third
  // into a second table; the oracle replays the surviving-week
  // arithmetic with a dense_rank over the same toMonday weeks.
  val q214ChPartitionOps = QueryDef(
    "q214_ch_partition_ops",
    (s, dir) => {
      val root = s"${sys.props("java.io.tmpdir")}/graft_ddl_q214_" +
        new java.io.File(dir).getName
      graft.FsUtil.rmTree(root)
      s.conf.set("spark.graft.warehouse", root)
      try {
        Graft.table(s, dir, "events")
          .createOrReplaceTempView("events_src_v214")
        for (t <- Seq("part_main", "part_side")) s.sql(s"""
          CREATE TABLE metrica.$t
          (
              `uid` UInt64,
              `d` Date,
              `etype` String
          )
          ENGINE = MergeTree
          PARTITION BY toMonday(d)
          ORDER BY (uid)
          SETTINGS index_granularity = 8192""")
        s.sql("""
          INSERT INTO part_main
          SELECT user_id AS uid, CAST(ts AS DATE) AS d,
                 event_type AS etype
          FROM events_src_v214""")
        // the three earliest Mondays, derived from the data itself so
        // the same entry runs at every SF
        val weeks = s.sql("""
          SELECT DISTINCT toMonday(CAST(ts AS DATE)) AS w
          FROM events_src_v214 ORDER BY w""").collect().map(_.getDate(0))
        require(weeks.length >= 3, s"q214 needs >= 3 weeks, got ${weeks.length}")
        s.sql(s"ALTER TABLE part_main DROP PARTITION '${weeks(0)}'")
        s.sql(s"ALTER TABLE part_main DETACH PARTITION '${weeks(1)}'")
        val whileDetached = s.sql(
          s"""SELECT count(1) FROM part_main
              WHERE d >= DATE '${weeks(1)}'
                AND d < DATE '${weeks(1)}' + INTERVAL 7 DAY""")
          .head().getLong(0)
        require(whileDetached == 0,
          s"q214: detached week still visible ($whileDetached rows)")
        s.sql(s"ALTER TABLE part_main ATTACH PARTITION '${weeks(1)}'")
        s.sql(s"ALTER TABLE part_main MOVE PARTITION '${weeks(2)}' " +
          "TO TABLE part_side")
        s.sql("""
          SELECT 'main' AS tbl, toInt64(count(1)) AS n,
                 toInt64(uniqExact(toMonday(d))) AS weeks
          FROM part_main
          UNION ALL
          SELECT 'side' AS tbl, toInt64(count(1)) AS n,
                 toInt64(uniqExact(toMonday(d))) AS weeks
          FROM part_side
          ORDER BY tbl""")
      } finally s.conf.unset("spark.graft.warehouse")
    },
    Some("""
      WITH wk AS (
        SELECT CAST(date_trunc('week', CAST(ts AS DATE)) AS DATE) AS w
        FROM events
      ), ranked AS (
        SELECT w, dense_rank() OVER (ORDER BY w) AS r FROM wk
      )
      SELECT 'main' AS tbl, CAST(count(1) AS BIGINT) AS n,
             CAST(count(DISTINCT w) AS BIGINT) AS weeks
      FROM ranked WHERE r != 1 AND r != 3
      UNION ALL
      SELECT 'side' AS tbl, CAST(count(1) AS BIGINT) AS n,
             CAST(count(DISTINCT w) AS BIGINT) AS weeks
      FROM ranked WHERE r = 3
      ORDER BY tbl"""))

  // CH vector-distance family (X125): dotProduct, L1/L2/L2Squared/
  // Linf distances, cosineDistance over the embeddings table,
  // quantized ×1000 to integers so every fold is an exact sum in any
  // order and only the final sqrt/divide is IEEE (mirrored by the
  // oracle — the NativeStats pattern); pointInEllipses joins the geo
  // vocabulary next to pointInPolygon. Per-pair rows (consecutive
  // vec_ids), no cross-row float aggregation.
  val q215ChVectorDistances = QueryDef(
    "q215_ch_vector_distances",
    (s, dir) => {
      Graft.table(s, dir, "embeddings")
        .createOrReplaceTempView("embeddings_v215")
      s.sql("""
        WITH qv AS (
          SELECT vec_id,
                 transform(embedding,
                   e -> CAST(round(CAST(e AS DOUBLE) * 1000) AS BIGINT))
                   AS q
          FROM embeddings_v215
        )
        SELECT a.vec_id,
               toInt64(dotProduct(a.q, b.q)) AS dp,
               toInt64(L1Distance(a.q, b.q)) AS l1,
               toInt64(L2SquaredDistance(a.q, b.q)) AS l2sq,
               L2Distance(a.q, b.q) AS l2,
               toInt64(LinfDistance(a.q, b.q)) AS linf,
               cosineDistance(a.q, b.q) AS cosd,
               toInt64(pointInEllipses(
                 CAST(a.vec_id % 20 AS DOUBLE), CAST(a.vec_id % 30 AS DOUBLE),
                 10.0D, 15.0D, 8.0D, 9.0D,
                 2.0D, 2.0D, 3.0D, 4.0D)) AS in_ell
        FROM qv a JOIN qv b ON b.vec_id = a.vec_id + 1
        WHERE a.vec_id < 40
        ORDER BY a.vec_id""")
    },
    Some("""
      WITH qv AS (
        SELECT vec_id,
               list_transform(embedding,
                 e -> CAST(round(CAST(e AS DOUBLE) * 1000) AS BIGINT)) AS q
        FROM embeddings
      ), pairs AS (
        SELECT a.vec_id, a.q AS qa, b.q AS qb
        FROM qv a JOIN qv b ON b.vec_id = a.vec_id + 1
        WHERE a.vec_id < 40
      ), comp AS (
        SELECT vec_id,
               CAST(list_sum(list_transform(range(1, len(qa)+1),
                 i -> qa[i]*qb[i])) AS BIGINT) AS dp,
               CAST(list_sum(list_transform(range(1, len(qa)+1),
                 i -> abs(qa[i]-qb[i]))) AS BIGINT) AS l1,
               CAST(list_sum(list_transform(range(1, len(qa)+1),
                 i -> (qa[i]-qb[i])*(qa[i]-qb[i]))) AS BIGINT) AS l2sq,
               CAST(list_max(list_transform(range(1, len(qa)+1),
                 i -> abs(qa[i]-qb[i]))) AS BIGINT) AS linf,
               CAST(list_sum(list_transform(range(1, len(qa)+1),
                 i -> qa[i]*qa[i])) AS BIGINT) AS nx,
               CAST(list_sum(list_transform(range(1, len(qa)+1),
                 i -> qb[i]*qb[i])) AS BIGINT) AS ny
        FROM pairs
      )
      SELECT c.vec_id, c.dp, c.l1, c.l2sq,
             sqrt(CAST(c.l2sq AS DOUBLE)) AS l2, c.linf,
             CASE WHEN c.nx > 0 AND c.ny > 0
                  THEN 1.0 - CAST(c.dp AS DOUBLE) /
                       (sqrt(CAST(c.nx AS DOUBLE)) *
                        sqrt(CAST(c.ny AS DOUBLE)))
             END AS cosd,
             CAST(CASE WHEN
               ((c.vec_id % 20 - 10.0) / 8.0) *
                 ((c.vec_id % 20 - 10.0) / 8.0) +
               ((c.vec_id % 30 - 15.0) / 9.0) *
                 ((c.vec_id % 30 - 15.0) / 9.0) <= 1.0
               OR
               ((c.vec_id % 20 - 2.0) / 3.0) *
                 ((c.vec_id % 20 - 2.0) / 3.0) +
               ((c.vec_id % 30 - 2.0) / 4.0) *
                 ((c.vec_id % 30 - 2.0) / 4.0) <= 1.0
               THEN 1 ELSE 0 END AS BIGINT) AS in_ell
      FROM comp c ORDER BY c.vec_id"""))

  // Scalar vocabulary gap-fill 2 (X126, by the second function
  // census): toYearWeek (ISO pin), dateName/monthName (JVM English
  // names = DuckDB's dayname/monthname), multiSearchFirstPosition,
  // appendTrailingCharIfAbsent, tokens, exp2/exp10 (exact on the
  // integer exponents used), intDivOrZero/moduloOrZero (crash-free
  // division), max2/min2, gcd/lcm (fixed 63-round Euclid fold —
  // exact integer steps, bounding any Long pair), currentDatabase.
  val q216ChScalarGapFill = QueryDef(
    "q216_ch_scalar_gap_fill",
    (s, dir) => {
      Graft.table(s, dir, "events").createOrReplaceTempView("events_v216")
      s.sql("""
        SELECT event_type,
               min(toYearWeek(CAST(ts AS DATE))) AS yw,
               min(dateName('weekday', CAST(ts AS DATE))) AS wd,
               min(monthName(CAST(ts AS DATE))) AS mn,
               toInt64(sum(multiSearchFirstPosition(event_type,
                 array('ck', 'err', 'se')))) AS msf,
               min(appendTrailingCharIfAbsent(event_type, 'w')) AS app,
               min(concat_ws('-', tokens(concat(event_type, ' 7,x')))) AS tk,
               toInt64(sum(toInt64(exp2(event_id % 10)))) AS e2,
               toInt64(sum(toInt64(exp10(event_id % 4)))) AS e10,
               toInt64(sum(intDivOrZero(event_id, user_id % 5))) AS idz,
               toInt64(sum(moduloOrZero(event_id, user_id % 7))) AS mdz,
               toInt64(sum(toInt64(round(max2(value, 100.0D) * 100)) +
                 toInt64(round(min2(value, 100.0D) * 100)))) AS mm2,
               toInt64(sum(gcd(event_id % 48, user_id % 36))) AS g,
               toInt64(sum(lcm(1 + event_id % 6, 1 + user_id % 4))) AS l,
               min(currentDatabase()) AS db,
               toInt64(count(1)) AS n
        FROM events_v216
        GROUP BY event_type ORDER BY event_type""")
    },
    Some("""
      SELECT event_type,
             CAST(min(yearweek(CAST(ts AS DATE))) AS BIGINT) AS yw,
             min(dayname(CAST(ts AS DATE))) AS wd,
             min(monthname(CAST(ts AS DATE))) AS mn,
             CAST(sum(coalesce(least(
               nullif(strpos(event_type, 'ck'), 0),
               nullif(strpos(event_type, 'err'), 0),
               nullif(strpos(event_type, 'se'), 0)), 0)) AS BIGINT) AS msf,
             min(CASE WHEN event_type LIKE '%w' THEN event_type
                      ELSE event_type || 'w' END) AS app,
             min(array_to_string(regexp_extract_all(event_type || ' 7,x',
               '[A-Za-z0-9]+'), '-')) AS tk,
             CAST(sum(CAST(pow(2.0, event_id % 10) AS BIGINT)) AS BIGINT)
               AS e2,
             CAST(sum(CAST(pow(10.0, event_id % 4) AS BIGINT)) AS BIGINT)
               AS e10,
             CAST(sum(CASE WHEN user_id % 5 = 0 THEN 0
                  ELSE event_id // (user_id % 5) END) AS BIGINT) AS idz,
             CAST(sum(CASE WHEN user_id % 7 = 0 THEN 0
                  ELSE event_id % (user_id % 7) END) AS BIGINT) AS mdz,
             CAST(sum(CAST(round(greatest(value, 100.0) * 100) AS BIGINT) +
               CAST(round(least(value, 100.0) * 100) AS BIGINT))
               AS BIGINT) AS mm2,
             CAST(sum(gcd(event_id % 48, user_id % 36)) AS BIGINT) AS g,
             CAST(sum(lcm(1 + event_id % 6, 1 + user_id % 4)) AS BIGINT)
               AS l,
             min('default') AS db,
             CAST(count(1) AS BIGINT) AS n
      FROM events
      GROUP BY event_type ORDER BY event_type"""))

  // system.projections introspection (X128): the registry view next
  // to system.tables / system.parts — one row per registered table
  // projection with its key list and stored partials; the oracle is
  // the statically-expected registry content (the q197 pattern).
  val q218ChSystemProjections = QueryDef(
    "q218_ch_system_projections",
    (s, dir) => {
      val root = s"${sys.props("java.io.tmpdir")}/graft_ddl_q218_" +
        new java.io.File(dir).getName
      graft.FsUtil.rmTree(root)
      graft.plans.ChProjections.clear()
      s.conf.set("spark.graft.warehouse", root)
      try {
        Graft.table(s, dir, "events")
          .createOrReplaceTempView("events_src_v218")
        s.sql("""
          CREATE TABLE metrica.projsys
          (
              `site` UInt32,
              `d` Date,
              `etype` String,
              `clicks` Int64
          )
          ENGINE = MergeTree
          PARTITION BY toMonday(d)
          ORDER BY (site, etype)
          SETTINGS index_granularity = 8192""")
        s.sql("""
          INSERT INTO projsys
          SELECT CAST(user_id % 4 AS INT) AS site, CAST(ts AS DATE) AS d,
                 event_type AS etype, CAST(1 AS BIGINT) AS clicks
          FROM events_src_v218 WHERE event_id < 500""")
        s.sql("""
          ALTER TABLE projsys ADD PROJECTION by_site
          (SELECT site, sum(clicks), count() GROUP BY site)""")
        s.sql("""
          ALTER TABLE projsys ADD PROJECTION by_type
          (SELECT etype, max(clicks), count() GROUP BY etype)""")
        s.sql("""
          SELECT table, name, keys, aggs FROM system.projections
          WHERE table = 'projsys' ORDER BY name""")
      } finally s.conf.unset("spark.graft.warehouse")
    },
    Some("""
      SELECT * FROM (VALUES
        ('projsys', 'by_site', 'site', 'sum(clicks),count()'),
        ('projsys', 'by_type', 'etype', 'max(clicks),count()'))
        AS t("table", name, keys, aggs)
      ORDER BY name"""))

  // Geohash encode/decode (X129): standard geohash via the
  // binary-expansion formulation — `floor((lon+180)/360 · 2^nlon)`
  // instead of iterative bisection, so the bit strings are one pure
  // IEEE expression both engines replay; chars interleave lon-first
  // into the geohash base32 alphabet, decode returns the CELL CENTER
  // (CH's contract) through the exact inverse expression shape. The
  // spec pins the canonical 'ezs42' cell and the ±180/±90 clamps.
  val q219ChGeohash = QueryDef(
    "q219_ch_geohash",
    (s, dir) => {
      Graft.table(s, dir, "events").createOrReplaceTempView("events_v219")
      s.sql("""
        WITH pts AS (
          SELECT event_id,
                 CAST(event_id % 360 AS DOUBLE) - 180.0D + 0.25D AS lon,
                 CAST(user_id % 180 AS DOUBLE) - 90.0D + 0.25D AS lat
          FROM events_v219 WHERE event_id < 400
        )
        SELECT event_id, geohashEncode(lon, lat, 8) AS gh,
               geohashDecode(geohashEncode(lon, lat, 8)).longitude AS clon,
               geohashDecode(geohashEncode(lon, lat, 8)).latitude AS clat
        FROM pts ORDER BY event_id""")
    },
    Some("""
      WITH pts AS (
        SELECT event_id,
               CAST(event_id % 360 AS DOUBLE) - 180.0 + 0.25 AS lon,
               CAST(user_id % 180 AS DOUBLE) - 90.0 + 0.25 AS lat
        FROM events WHERE event_id < 400
      ), idx AS (
        SELECT event_id,
               least(greatest(CAST(floor((lon - -180.0) / 360.0
                 * 1048576.0) AS BIGINT), 0), 1048575) AS lonI,
               least(greatest(CAST(floor((lat - -90.0) / 180.0
                 * 1048576.0) AS BIGINT), 0), 1048575) AS latI,
               '0123456789bcdefghjkmnpqrstuvwxyz' AS b32
        FROM pts
      )
      SELECT event_id,
             substring(b32, CAST(((lonI >> 19) & 1) * 16 + ((latI >> 19) & 1) * 8 + ((lonI >> 18) & 1) * 4 + ((latI >> 18) & 1) * 2 + ((lonI >> 17) & 1) * 1 AS INT) + 1, 1) ||
               substring(b32, CAST(((latI >> 17) & 1) * 16 + ((lonI >> 16) & 1) * 8 + ((latI >> 16) & 1) * 4 + ((lonI >> 15) & 1) * 2 + ((latI >> 15) & 1) * 1 AS INT) + 1, 1) ||
               substring(b32, CAST(((lonI >> 14) & 1) * 16 + ((latI >> 14) & 1) * 8 + ((lonI >> 13) & 1) * 4 + ((latI >> 13) & 1) * 2 + ((lonI >> 12) & 1) * 1 AS INT) + 1, 1) ||
               substring(b32, CAST(((latI >> 12) & 1) * 16 + ((lonI >> 11) & 1) * 8 + ((latI >> 11) & 1) * 4 + ((lonI >> 10) & 1) * 2 + ((latI >> 10) & 1) * 1 AS INT) + 1, 1) ||
               substring(b32, CAST(((lonI >> 9) & 1) * 16 + ((latI >> 9) & 1) * 8 + ((lonI >> 8) & 1) * 4 + ((latI >> 8) & 1) * 2 + ((lonI >> 7) & 1) * 1 AS INT) + 1, 1) ||
               substring(b32, CAST(((latI >> 7) & 1) * 16 + ((lonI >> 6) & 1) * 8 + ((latI >> 6) & 1) * 4 + ((lonI >> 5) & 1) * 2 + ((latI >> 5) & 1) * 1 AS INT) + 1, 1) ||
               substring(b32, CAST(((lonI >> 4) & 1) * 16 + ((latI >> 4) & 1) * 8 + ((lonI >> 3) & 1) * 4 + ((latI >> 3) & 1) * 2 + ((lonI >> 2) & 1) * 1 AS INT) + 1, 1) ||
               substring(b32, CAST(((latI >> 2) & 1) * 16 + ((lonI >> 1) & 1) * 8 + ((latI >> 1) & 1) * 4 + ((lonI >> 0) & 1) * 2 + ((latI >> 0) & 1) * 1 AS INT) + 1, 1) AS gh,
             (CAST(lonI AS DOUBLE) + 0.5) / 1048576.0 * 360.0
               + (-180.0) AS clon,
             (CAST(latI AS DOUBLE) + 0.5) / 1048576.0 * 180.0
               + (-90.0) AS clat
      FROM idx ORDER BY event_id"""))

  // DDL TTL + MATERIALIZE TTL (X130): `TTL d + INTERVAL 14 DAY DELETE`
  // stamps the retention contract in the CREATE; `ALTER TABLE …
  // MATERIALIZE TTL AS OF '<date>'` applies it at week-partition
  // granularity (CH's ttl_only_drop_parts fast path — a directory
  // retire, never a rewrite; the AS OF pin is the engine's
  // deterministic-clock extension, today when omitted). The reference
  // itself runs on hybrid-storage TTL (README.md:178-180). The AS OF
  // date derives from the data (max event date), so the same entry
  // replays at every SF; the oracle recomputes the surviving weeks
  // with the same toMonday(asOf − 14d) cutoff arithmetic.
  val q220ChTtlMaterialize = QueryDef(
    "q220_ch_ttl_materialize",
    (s, dir) => {
      val root = s"${sys.props("java.io.tmpdir")}/graft_ddl_q220_" +
        new java.io.File(dir).getName
      graft.FsUtil.rmTree(root)
      s.conf.set("spark.graft.warehouse", root)
      try {
        Graft.table(s, dir, "events")
          .createOrReplaceTempView("events_src_v220")
        s.sql("""
          CREATE TABLE metrica.ttl_events
          (
              `uid` UInt64,
              `d` Date,
              `etype` String
          )
          ENGINE = MergeTree
          PARTITION BY toMonday(d)
          ORDER BY (uid)
          TTL d + INTERVAL 14 DAY DELETE
          SETTINGS index_granularity = 8192""")
        s.sql("""
          INSERT INTO ttl_events
          SELECT user_id AS uid, CAST(ts AS DATE) AS d,
                 event_type AS etype
          FROM events_src_v220""")
        val asOf = s.sql(
          "SELECT max(CAST(ts AS DATE)) FROM events_src_v220")
          .head().getDate(0)
        s.sql(s"ALTER TABLE ttl_events MATERIALIZE TTL AS OF '$asOf'")
        s.sql("""
          SELECT toMonday(d) AS wk, toInt64(count(1)) AS n
          FROM ttl_events GROUP BY toMonday(d) ORDER BY wk""")
      } finally s.conf.unset("spark.graft.warehouse")
    },
    Some("""
      WITH mx AS (
        SELECT CAST(date_trunc('week',
          max(CAST(ts AS DATE)) - INTERVAL 14 DAY) AS DATE) AS cutoff
        FROM events
      )
      SELECT CAST(date_trunc('week', CAST(ts AS DATE)) AS DATE) AS wk,
             CAST(count(1) AS BIGINT) AS n
      FROM events
      WHERE CAST(date_trunc('week', CAST(ts AS DATE)) AS DATE)
            >= (SELECT cutoff FROM mx)
      GROUP BY 1 ORDER BY wk"""))

  // CH star modifiers (X131): `* EXCEPT (cols)` (native in Spark 4's
  // grammar) and `* REPLACE (expr AS name, …)` (rewritten by the
  // parser onto the EXCEPT form — replaced columns move to the END,
  // the documented positional deviation; the comparator normalizes
  // column order anyway). Both in one verbatim statement, nested:
  // the inner subquery REPLACEs, the outer EXCEPTs.
  val q221ChStarModifiers = QueryDef(
    "q221_ch_star_modifiers",
    (s, dir) => {
      Graft.table(s, dir, "events").createOrReplaceTempView("events_v221")
      s.sql("""
        SELECT * EXCEPT (b)
        FROM (
          SELECT * REPLACE (upper(event_type) AS event_type,
                            toInt64(round(value * 100)) * 2 AS value)
          FROM (SELECT event_id, event_type, value, user_id % 10 AS b
                FROM events_v221 WHERE event_id < 50)
        )
        ORDER BY event_id""")
    },
    Some("""
      SELECT event_id, upper(event_type) AS event_type,
             CAST(round(value * 100) AS BIGINT) * 2 AS value
      FROM events WHERE event_id < 50
      ORDER BY event_id"""))

  // ---------------------------------------------------------------------
  // X133: categorical-association family — cramersV / bias-corrected /
  // contingency / theilsU / categoricalInformationValue over the
  // contingency-table native aggregate (plans/NativeStats.CatAssocAgg:
  // count-map state bounded by category-pair cardinality, map-side
  // combined). Outputs round to 6 dp — the final ln/sqrt are IEEE ops
  // whose fold order differs from DuckDB's (transcendental policy; the
  // counts underneath are exact integers both sides).
  val q224CatAssociation = QueryDef(
    "q224_cat_association",
    (s, dir) => {
      Graft.table(s, dir, "events").createOrReplaceTempView("events_v224")
      s.sql("""
        SELECT event_type,
               round(cramersV(CAST(user_id % 3 AS STRING),
                              CAST(event_id % 4 AS STRING)), 6) AS v,
               round(cramersVBiasCorrected(CAST(user_id % 3 AS STRING),
                              CAST(event_id % 4 AS STRING)), 6) AS vc,
               round(contingency(CAST(user_id % 3 AS STRING),
                              CAST(event_id % 4 AS STRING)), 6) AS ct,
               round(theilsU(CAST(user_id % 3 AS STRING),
                              CAST(event_id % 4 AS STRING)), 6) AS u,
               round(categoricalInformationValue(
                 CAST(user_id % 3 AS STRING),
                 CAST(event_id % 2 AS STRING)), 6) AS iv,
               toInt64(count(1)) AS n
        FROM events_v224
        GROUP BY event_type ORDER BY event_type""")
    },
    Some("""
      WITH obs AS (
        SELECT event_type AS g, user_id % 3 AS a, event_id % 4 AS b,
               count(*) AS c
        FROM events GROUP BY 1, 2, 3
      ), ra AS (SELECT g, a, sum(c) AS r FROM obs GROUP BY 1, 2),
      cb AS (SELECT g, b, sum(c) AS s FROM obs GROUP BY 1, 2),
      nn AS (SELECT g, CAST(sum(c) AS DOUBLE) AS n,
                    count(DISTINCT a) AS nr, count(DISTINCT b) AS nc
             FROM obs GROUP BY 1),
      grid AS (
        SELECT ra.g, ra.a, cb.b, ra.r, cb.s, coalesce(obs.c, 0) AS o
        FROM ra JOIN cb USING (g) LEFT JOIN obs USING (g, a, b)
      ), x2 AS (
        SELECT grid.g,
               sum(pow(o - r * s / nn.n, 2) / (r * s / nn.n)) AS x2
        FROM grid JOIN nn USING (g) GROUP BY 1
      ), ent AS (
        SELECT ra.g,
               ln(any_value(nn.n)) -
                 sum(r * ln(CAST(r AS DOUBLE))) / any_value(nn.n) AS ha
        FROM ra JOIN nn USING (g) GROUP BY 1
      ), condent AS (
        SELECT o.g, sum(CAST(cb.s AS DOUBLE) / nn.n *
          (ln(CAST(cb.s AS DOUBLE)) - hcell.hs / cb.s)) AS hab
        FROM (SELECT DISTINCT g, b FROM obs) o
        JOIN cb USING (g, b) JOIN nn USING (g)
        JOIN (SELECT g, b, sum(c * ln(CAST(c AS DOUBLE))) AS hs
              FROM obs GROUP BY 1, 2) hcell USING (g, b)
        GROUP BY 1
      ), ivo AS (
        SELECT event_type AS g, user_id % 3 AS a,
               sum(CASE WHEN event_id % 2 = 0 THEN 1 ELSE 0 END) AS bad,
               sum(CASE WHEN event_id % 2 <> 0 THEN 1 ELSE 0 END) AS good
        FROM events GROUP BY 1, 2
      ), ivt AS (
        SELECT g, sum(bad) AS tbad, sum(good) AS tgood FROM ivo GROUP BY 1
      ), iv AS (
        SELECT ivo.g,
               sum(CASE WHEN bad > 0 AND good > 0 THEN
                 (good / CAST(tgood AS DOUBLE) - bad / CAST(tbad AS DOUBLE))
                 * ln((good / CAST(tgood AS DOUBLE)) /
                      (bad / CAST(tbad AS DOUBLE)))
                 ELSE 0 END) AS iv
        FROM ivo JOIN ivt USING (g) GROUP BY 1
      )
      SELECT nn.g AS event_type,
             round(sqrt(x2.x2 / (nn.n * least(nn.nr - 1, nn.nc - 1))), 6)
               AS v,
             round(sqrt(greatest(0,
                 x2.x2 / nn.n - (nn.nr - 1) * (nn.nc - 1) / (nn.n - 1)) /
               least(nn.nr - (nn.nr - 1) * (nn.nr - 1) / (nn.n - 1) - 1,
                     nn.nc - (nn.nc - 1) * (nn.nc - 1) / (nn.n - 1) - 1)),
               6) AS vc,
             round(sqrt(x2.x2 / (x2.x2 + nn.n)), 6) AS ct,
             round((ent.ha - condent.hab) / ent.ha, 6) AS u,
             round(iv.iv, 6) AS iv,
             CAST(nn.n AS BIGINT) AS n
      FROM nn JOIN x2 USING (g) JOIN ent ON ent.g = nn.g
      JOIN condent ON condent.g = nn.g JOIN iv ON iv.g = nn.g
      ORDER BY event_type"""))

  // ---------------------------------------------------------------------
  // X134: quantileTiming family — CH's fixed-bin deterministic timing
  // quantile (exact < 1024 ms, 16 ms bins to 30000, clamp above) as a
  // native bounded-state aggregate. Every step is integer arithmetic
  // (bin map, cumulative counts, rank ⌊level·(n−1)⌋), so the oracle
  // replays it EXACTLY — no rounding needed on the compared surface.
  val q225QuantileTiming = QueryDef(
    "q225_quantile_timing",
    (s, dir) => {
      Graft.table(s, dir, "events").createOrReplaceTempView("events_v225")
      s.sql("""
        SELECT event_type,
               quantileTiming(0.5)(event_id % 45000) AS med,
               quantileTiming(0.95)(event_id % 45000) AS p95,
               quantileTimingWeighted(0.5)(event_id % 45000,
                                           1 + user_id % 3) AS wmed,
               toInt64(count(1)) AS n
        FROM events_v225
        GROUP BY event_type ORDER BY event_type""")
    },
    Some("""
      WITH r AS (
        SELECT event_type AS g,
               CASE WHEN event_id % 45000 < 1024 THEN event_id % 45000
                    WHEN event_id % 45000 < 30000 THEN
                      1024 + ((event_id % 45000 - 1024) // 16) * 16
                    ELSE 30000 END AS rep,
               1 + user_id % 3 AS w
        FROM events
      ), n AS (SELECT g, count(*) AS n, sum(w) AS wn FROM r GROUP BY 1),
      cells AS (
        SELECT g, rep, count(*) AS cnt, sum(w) AS wcnt
        FROM r GROUP BY 1, 2
      ), cum AS (
        SELECT g, rep,
               sum(cnt) OVER (PARTITION BY g ORDER BY rep) AS c,
               sum(wcnt) OVER (PARTITION BY g ORDER BY rep) AS cw
        FROM cells
      )
      SELECT n.g AS event_type,
             CAST((SELECT min(rep) FROM cum
                   WHERE cum.g = n.g
                     AND c > floor(0.5 * (n.n - 1))) AS DOUBLE) AS med,
             CAST((SELECT min(rep) FROM cum
                   WHERE cum.g = n.g
                     AND c > floor(0.95 * (n.n - 1))) AS DOUBLE) AS p95,
             CAST((SELECT min(rep) FROM cum
                   WHERE cum.g = n.g
                     AND cw > floor(0.5 * (n.wn - 1))) AS DOUBLE) AS wmed,
             CAST(n.n AS BIGINT) AS n
      FROM n ORDER BY event_type"""))

  // ---------------------------------------------------------------------
  // X135: eval/report vocabulary — arrayAUC (tie-aware ROC AUC, exact
  // integer midranks), boundingRatio (min-x→max-x slope from struct
  // extremes), sumMapFiltered + tupleElement (keyed rollup restricted
  // map-side, struct access by ordinal/name), groupBitmapAnd/Or/Xor
  // (set-algebra folds over per-row bitmaps), and sparkbar (the
  // inline-dashboard histogram string, exact integer glyph levels).
  // Every output is either exact integer arithmetic or a 6 dp-rounded
  // ratio the oracle replays in the same form.
  val q226AucBitmapBar = QueryDef(
    "q226_ch_auc_bitmap_bar",
    (s, dir) => {
      Graft.table(s, dir, "events").createOrReplaceTempView("events_v226")
      s.sql("""
        SELECT event_type,
               round(avg(arrayAUC(
                 array(CAST(event_id % 7 AS DOUBLE),
                       CAST(user_id % 5 AS DOUBLE),
                       CAST(event_id % 3 AS DOUBLE),
                       CAST(user_id % 2 AS DOUBLE) + 0.5),
                 array(event_id % 2, 1 - event_id % 2,
                       user_id % 2, 1 - user_id % 2))), 6) AS auc,
               round(boundingRatio(event_id, user_id % 97), 6) AS br,
               concat_ws(',', tupleElement(sumMapFiltered(
                 array(CAST(1 AS BIGINT), CAST(3 AS BIGINT)))(
                   array(1 + event_id % 3, CAST(2 AS BIGINT)),
                   array(event_id % 5, user_id % 7)), 1)) AS smf_keys,
               concat_ws(',', transform(tupleElement(sumMapFiltered(
                 array(CAST(1 AS BIGINT), CAST(3 AS BIGINT)))(
                   array(1 + event_id % 3, CAST(2 AS BIGINT)),
                   array(event_id % 5, user_id % 7)), 'sums'),
                 x -> CAST(x AS STRING))) AS smf_sums,
               groupBitmapAnd(bitmapBuild(array(event_id % 5,
                 user_id % 7, CAST(3 AS BIGINT)))) AS gb_and,
               groupBitmapOr(bitmapBuild(array(event_id % 5,
                 user_id % 7, CAST(3 AS BIGINT)))) AS gb_or,
               groupBitmapXor(bitmapBuild(array(event_id % 5,
                 user_id % 7, CAST(3 AS BIGINT)))) AS gb_xor,
               sparkbar(8)(user_id % 8, 1) AS bar,
               toInt64(count(1)) AS n
        FROM events_v226
        GROUP BY event_type ORDER BY event_type""")
    },
    Some("""
      WITH pts AS (
        SELECT event_type AS g, event_id, user_id,
               CASE i WHEN 1 THEN CAST(event_id % 7 AS DOUBLE)
                      WHEN 2 THEN CAST(user_id % 5 AS DOUBLE)
                      WHEN 3 THEN CAST(event_id % 3 AS DOUBLE)
                      ELSE CAST(user_id % 2 AS DOUBLE) + 0.5 END AS s,
               CASE i WHEN 1 THEN event_id % 2
                      WHEN 2 THEN 1 - event_id % 2
                      WHEN 3 THEN user_id % 2
                      ELSE 1 - user_id % 2 END AS l
        FROM events CROSS JOIN (VALUES (1), (2), (3), (4)) t(i)
      ), ranked AS (
        SELECT g, event_id, s, l,
               rank() OVER (PARTITION BY g, event_id ORDER BY s) AS rk,
               count(*) OVER (PARTITION BY g, event_id, s) AS ceq
        FROM pts
      ), auc_row AS (
        SELECT g, event_id,
               CAST(sum(CASE WHEN l <> 0 THEN 2 * rk + ceq - 1
                             ELSE 0 END) AS BIGINT) AS s2,
               CAST(sum(CASE WHEN l <> 0 THEN 1 ELSE 0 END) AS BIGINT) AS p
        FROM ranked GROUP BY 1, 2
      ), auc AS (
        SELECT g, avg((s2 - p * (p + 1)) / (2.0 * p * (4 - p))) AS auc
        FROM auc_row GROUP BY 1
      ), br AS (
        SELECT event_type AS g,
               (CAST(arg_max(user_id % 97, event_id) AS DOUBLE)
                 - arg_min(user_id % 97, event_id))
               / (CAST(max(event_id) AS DOUBLE) - min(event_id)) AS br
        FROM events GROUP BY 1
      ), smf AS (
        SELECT event_type AS g, 1 + event_id % 3 AS k,
               sum(event_id % 5) AS v
        FROM events WHERE 1 + event_id % 3 IN (1, 3) GROUP BY 1, 2
      ), smfa AS (
        SELECT g, string_agg(CAST(k AS VARCHAR), ',' ORDER BY
                 CAST(k AS VARCHAR)) AS smf_keys,
               string_agg(CAST(v AS VARCHAR), ',' ORDER BY
                 CAST(k AS VARCHAR)) AS smf_sums
        FROM smf GROUP BY 1
      ), elems AS (
        SELECT DISTINCT event_type AS g, event_id,
               CASE i WHEN 1 THEN event_id % 5
                      WHEN 2 THEN user_id % 7 ELSE 3 END AS e
        FROM events CROSS JOIN (VALUES (1), (2), (3)) t(i)
      ), rowcnt AS (SELECT event_type AS g, count(*) AS nr
                    FROM events GROUP BY 1),
      ecnt AS (SELECT g, e, count(*) AS c FROM elems GROUP BY 1, 2),
      gb AS (
        SELECT ecnt.g,
               CAST(sum(CASE WHEN c = nr THEN 1 ELSE 0 END) AS BIGINT)
                 AS gb_and,
               CAST(count(*) AS BIGINT) AS gb_or,
               CAST(sum(CASE WHEN c % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT)
                 AS gb_xor
        FROM ecnt JOIN rowcnt USING (g) GROUP BY 1
      ), hb AS (
        SELECT event_type AS g, user_id % 8 AS b, count(*) AS h
        FROM events GROUP BY 1, 2
      ), hmax AS (SELECT g, max(h) AS mh FROM hb GROUP BY 1),
      bar AS (
        SELECT hb.g, string_agg(
          chr(CAST(9600 + (8 * h + mh - 1) // mh AS INT)),
          '' ORDER BY b) AS bar
        FROM hb JOIN hmax USING (g) GROUP BY hb.g
      )
      SELECT br.g AS event_type, round(auc.auc, 6) AS auc,
             round(br.br, 6) AS br,
             smfa.smf_keys, smfa.smf_sums,
             gb.gb_and, gb.gb_or, gb.gb_xor, bar.bar,
             CAST(rowcnt.nr AS BIGINT) AS n
      FROM br JOIN auc USING (g) JOIN smfa ON smfa.g = br.g
      JOIN gb ON gb.g = br.g JOIN bar ON bar.g = br.g
      JOIN rowcnt ON rowcnt.g = br.g
      ORDER BY event_type"""))

  // ---------------------------------------------------------------------
  // X138: network/encoding vocabulary — IPv4/IPv6 validation, CIDR
  // ranges, MAC round-trips, base58, soundex, IDNA, and the query-log
  // normalizer. Oracle strategy: pure-integer predicates and the
  // regex normalizer replay directly; base58/soundex of the five
  // fixed event_type values are CASE-mapped from hand-verified
  // constants (the algorithms are spec-pinned on classic fixtures);
  // MAC encode/decode proves itself by exact round-trip counting.
  val q229NetEncoding = QueryDef(
    "q229_ch_net_encoding",
    (s, dir) => {
      Graft.table(s, dir, "events").createOrReplaceTempView("events_v229")
      s.sql("""
        SELECT event_type,
               min(soundex(event_type)) AS sx,
               min(base58Encode(event_type)) AS b58,
               toInt64(sum(isIPv4String(concat(
                 CAST(user_id % 300 AS STRING), '.8.',
                 CAST(event_id % 260 AS STRING), '.1')))) AS v4ok,
               toInt64(sum(isIPv6String(concat(
                 '2001:db8::', CAST(event_id % 10 AS STRING))))) AS v6ok,
               min(tupleElement(IPv4CIDRToRange(concat('10.',
                 CAST(user_id % 256 AS STRING), '.',
                 CAST(event_id % 256 AS STRING), '.77'), 24), 'lo'))
                 AS cidr_lo,
               toInt64(sum(CASE WHEN MACStringToNum(MACNumToString(
                 event_id)) = event_id THEN 1 ELSE 0 END)) AS mac_rt,
               toInt64(sum(CASE WHEN base58Decode(base58Encode(
                 substr(props, 1, 12))) = substr(props, 1, 12)
                 THEN 1 ELSE 0 END)) AS b58_rt,
               min(normalizeQuery(concat('SELECT x FROM t WHERE a = ',
                 CAST(user_id AS STRING), ' AND b IN (',
                 CAST(event_id % 5 AS STRING), ', ',
                 CAST(user_id % 7 AS STRING), ')'))) AS nq,
               toInt64(count(1)) AS n
        FROM events_v229
        GROUP BY event_type ORDER BY event_type""")
    },
    Some("""
      SELECT event_type,
             CASE event_type WHEN 'click' THEN 'C420'
               WHEN 'error' THEN 'E660' WHEN 'purchase' THEN 'P622'
               WHEN 'signup' THEN 'S251' ELSE 'V000' END AS sx,
             CASE event_type WHEN 'click' THEN 'CDbMEh8'
               WHEN 'error' THEN 'CSqMrvD'
               WHEN 'purchase' THEN 'KozUk39722Q'
               WHEN 'signup' THEN 'zUMi4Ydd' ELSE '42YwYJ' END AS b58,
             CAST(sum(CASE WHEN user_id % 300 <= 255
               AND event_id % 260 <= 255 THEN 1 ELSE 0 END) AS BIGINT)
               AS v4ok,
             CAST(count(*) AS BIGINT) AS v6ok,
             min('10.' || CAST(user_id % 256 AS VARCHAR) || '.'
               || CAST(event_id % 256 AS VARCHAR) || '.0') AS cidr_lo,
             CAST(count(*) AS BIGINT) AS mac_rt,
             CAST(count(*) AS BIGINT) AS b58_rt,
             min(regexp_replace(regexp_replace(regexp_replace(
               'SELECT x FROM t WHERE a = ' || CAST(user_id AS VARCHAR)
                 || ' AND b IN (' || CAST(event_id % 5 AS VARCHAR)
                 || ', ' || CAST(user_id % 7 AS VARCHAR) || ')',
               '''(?:[^''\\]|\\.)*''', '?', 'g'),
               '\b\d+(?:\.\d+)?\b', '?', 'g'),
               '\?(?:\s*,\s*\?)+', '?..', 'g')) AS nq,
             CAST(count(1) AS BIGINT) AS n
      FROM events GROUP BY event_type ORDER BY event_type"""))

  // ---------------------------------------------------------------------
  // X139: z-test family — meanZTest (known-variance two-sample z over
  // exact long sums) and proportionsZTest (pooled two-proportion z),
  // statistic-only per the NativeStats determinism policy. The oracle
  // replays the identical final IEEE ops over the same exact integer
  // sums; outputs round at 6 dp.
  val q230ZTests = QueryDef(
    "q230_ch_ztests",
    (s, dir) => {
      Graft.table(s, dir, "events").createOrReplaceTempView("events_v230")
      s.sql("""
        SELECT event_type,
               round(meanZTest(4.0, 4.0, 0.95)(user_id % 19,
                 event_id % 2), 6) AS mz,
               round(proportionsZTest(
                 sum(CASE WHEN event_id % 2 = 0 AND user_id % 3 = 0
                   THEN 1 ELSE 0 END),
                 sum(CASE WHEN event_id % 2 = 1 AND user_id % 3 = 0
                   THEN 1 ELSE 0 END),
                 sum(CASE WHEN event_id % 2 = 0 THEN 1 ELSE 0 END),
                 sum(CASE WHEN event_id % 2 = 1 THEN 1 ELSE 0 END),
                 0.95), 6) AS pz,
               toInt64(count(1)) AS n
        FROM events_v230
        GROUP BY event_type ORDER BY event_type""")
    },
    Some("""
      WITH a AS (
        SELECT event_type,
               sum(CASE WHEN event_id % 2 = 0 THEN user_id % 19
                 ELSE 0 END) AS s0,
               sum(CASE WHEN event_id % 2 <> 0 THEN user_id % 19
                 ELSE 0 END) AS s1,
               sum(CASE WHEN event_id % 2 = 0 THEN 1 ELSE 0 END) AS n0,
               sum(CASE WHEN event_id % 2 <> 0 THEN 1 ELSE 0 END) AS n1,
               sum(CASE WHEN event_id % 2 = 0 AND user_id % 3 = 0
                 THEN 1 ELSE 0 END) AS px,
               sum(CASE WHEN event_id % 2 = 1 AND user_id % 3 = 0
                 THEN 1 ELSE 0 END) AS py,
               count(1) AS n
        FROM events GROUP BY event_type
      )
      SELECT event_type,
             round((CAST(s0 AS DOUBLE) / CAST(n0 AS DOUBLE)
                    - CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE))
               / sqrt(4.0 / CAST(n0 AS DOUBLE)
                      + 4.0 / CAST(n1 AS DOUBLE)), 6) AS mz,
             round((CAST(px AS DOUBLE) / CAST(n0 AS DOUBLE)
                    - CAST(py AS DOUBLE) / CAST(n1 AS DOUBLE))
               / sqrt(((CAST(px AS DOUBLE) + CAST(py AS DOUBLE))
                       / (CAST(n0 AS DOUBLE) + CAST(n1 AS DOUBLE)))
                 * (1.0 - (CAST(px AS DOUBLE) + CAST(py AS DOUBLE))
                       / (CAST(n0 AS DOUBLE) + CAST(n1 AS DOUBLE)))
                 * (1.0 / CAST(n0 AS DOUBLE)
                    + 1.0 / CAST(n1 AS DOUBLE))), 6) AS pz,
             CAST(n AS BIGINT) AS n
      FROM a ORDER BY event_type"""))

  // ---------------------------------------------------------------------
  // X140: exponentialTimeDecayed window family — the freshness-decayed
  // engagement metrics CH ships as window functions, with O(1) running
  // state per frame row. Hashing discipline (the q137 class, hit and
  // fixed IN SESSION): unbounded-prefix values drifted 2e-6 from a
  // direct-sum oracle (association compounding over ~200 exp steps),
  // and even with bounded frames + a nested-replay oracle, an
  // integer-quantized SUM over 2000 rows amplified single-ulp
  // JVM-vs-libm exp() deltas into +-1 flips. Final form: 5-row
  // frames, the oracle replays the engine's exact recurrence nesting,
  // and the compared surface is 6 dp-rounded group MEANS (per-row
  // deltas ~1e-15 rel — the same exposure class as every other
  // double-valued entry, not an exactly-hashed integer).
  val q231ExpDecay = QueryDef(
    "q231_ch_exp_decay",
    (s, dir) => {
      Graft.table(s, dir, "events").createOrReplaceTempView("events_v231")
      s.sql("""
        WITH pts AS (
          SELECT event_type, event_id,
                 CAST(user_id % 100 AS DOUBLE) AS v,
                 toUnixTimestamp(ts) / CAST(86400 AS DOUBLE) AS t
          FROM events_v231 WHERE event_id % 97 = 0
        ), w AS (
          SELECT event_type,
                 exponentialTimeDecayedSum(7.0)(v, t) OVER
                   (PARTITION BY event_type ORDER BY t, event_id
                    ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) AS eds,
                 exponentialTimeDecayedAvg(7.0)(v, t) OVER
                   (PARTITION BY event_type ORDER BY t, event_id
                    ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) AS eda,
                 exponentialTimeDecayedMax(7.0)(v, t) OVER
                   (PARTITION BY event_type ORDER BY t, event_id
                    ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) AS edm,
                 exponentialTimeDecayedCount(7.0)(t) OVER
                   (PARTITION BY event_type ORDER BY t, event_id
                    ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) AS edc
          FROM pts
        )
        SELECT event_type,
               round(avg(eds), 6) AS eds_m, round(avg(eda), 6) AS eda_m,
               round(avg(edm), 6) AS edm_m, round(avg(edc), 6) AS edc_m,
               toInt64(count(1)) AS n
        FROM w GROUP BY event_type ORDER BY event_type""")
    },
    Some("""
      WITH pts AS (
        SELECT event_type, event_id,
               CAST(user_id % 100 AS DOUBLE) AS v,
               floor(epoch(ts)) / 86400.0 AS t
        FROM events WHERE event_id % 97 = 0
      ), w0 AS (
        SELECT event_type, v, t,
               lag(v, 1) OVER win AS v1, lag(t, 1) OVER win AS t1,
               lag(v, 2) OVER win AS v2, lag(t, 2) OVER win AS t2,
               lag(v, 3) OVER win AS v3, lag(t, 3) OVER win AS t3,
               lag(v, 4) OVER win AS v4, lag(t, 4) OVER win AS t4
        FROM pts
        WINDOW win AS (PARTITION BY event_type ORDER BY t, event_id)
      ), w AS (
        -- the engine's recurrence S = x + exp(-step/7)*S, replayed as
        -- the SAME nested expression (identical IEEE op order, so the
        -- per-row doubles are bit-identical before quantization)
        SELECT event_type,
          v + CASE WHEN t1 IS NULL THEN 0 ELSE exp(-(t - t1) / 7.0) *
            (v1 + CASE WHEN t2 IS NULL THEN 0 ELSE exp(-(t1 - t2) / 7.0) *
              (v2 + CASE WHEN t3 IS NULL THEN 0 ELSE exp(-(t2 - t3) / 7.0) *
                (v3 + CASE WHEN t4 IS NULL THEN 0
                      ELSE exp(-(t3 - t4) / 7.0) * v4 END)
              END)
            END)
          END AS eds,
          1 + CASE WHEN t1 IS NULL THEN 0 ELSE exp(-(t - t1) / 7.0) *
            (1 + CASE WHEN t2 IS NULL THEN 0 ELSE exp(-(t1 - t2) / 7.0) *
              (1 + CASE WHEN t3 IS NULL THEN 0 ELSE exp(-(t2 - t3) / 7.0) *
                (1 + CASE WHEN t4 IS NULL THEN 0
                      ELSE exp(-(t3 - t4) / 7.0) * 1 END)
              END)
            END)
          END AS edc,
          greatest(v, CASE WHEN t1 IS NULL THEN -1
            ELSE exp(-(t - t1) / 7.0) *
              greatest(v1, CASE WHEN t2 IS NULL THEN -1
                ELSE exp(-(t1 - t2) / 7.0) *
                  greatest(v2, CASE WHEN t3 IS NULL THEN -1
                    ELSE exp(-(t2 - t3) / 7.0) *
                      greatest(v3, CASE WHEN t4 IS NULL THEN -1
                        ELSE exp(-(t3 - t4) / 7.0) * v4 END)
                  END)
              END)
          END) AS edm
        FROM w0
      )
      SELECT event_type,
             round(avg(eds), 6) AS eds_m, round(avg(eds / edc), 6) AS eda_m,
             round(avg(edm), 6) AS edm_m, round(avg(edc), 6) AS edc_m,
             CAST(count(1) AS BIGINT) AS n
      FROM w GROUP BY event_type ORDER BY event_type"""))

  // ---------------------------------------------------------------------
  // X141: sequenceNextNode — CH's funnel next-step aggregate ("after a
  // user's first view, what happens next?"), replayed per user cohort
  // and histogrammed; the oracle re-walks the same (second, value)
  // total order with window functions. groupArraySample rides along
  // structurally (its membership is engine-hash-specific; the size
  // contract is oracle-checked, determinism is spec-pinned).
  val q232SeqNextNode = QueryDef(
    "q232_ch_seq_next_node",
    (s, dir) => {
      Graft.table(s, dir, "events").createOrReplaceTempView("events_v232")
      s.sql("""
        WITH u AS (
          SELECT user_id % 1000 AS uid,
                 sequenceNextNode(forward, first_match)(ts, event_type,
                   event_type = 'view', event_type = 'view') AS nxt,
                 size(groupArraySample(5, 42)(event_id)) AS ss,
                 count(1) AS cnt
          FROM events_v232 GROUP BY user_id % 1000
        )
        SELECT coalesce(nxt, '-') AS next_event,
               toInt64(count(1)) AS n_users,
               toInt64(sum(CASE WHEN ss = least(5, cnt)
                 THEN 1 ELSE 0 END)) AS sample_ok
        FROM u GROUP BY coalesce(nxt, '-')
        ORDER BY next_event""")
    },
    Some("""
      WITH e AS (
        SELECT user_id % 1000 AS uid, event_type,
               floor(epoch(ts)) AS t
        FROM events
      ), o AS (
        SELECT uid, event_type,
               row_number() OVER (PARTITION BY uid
                 ORDER BY t, event_type) AS rn
        FROM e
      ), fm AS (
        SELECT uid, min(rn) AS m FROM o
        WHERE event_type = 'view' GROUP BY uid
      ), nxt AS (
        SELECT o.uid, o.event_type AS nxt
        FROM fm JOIN o ON o.uid = fm.uid AND o.rn = fm.m + 1
      ), u AS (
        SELECT e0.uid, coalesce(nxt.nxt, '-') AS nx
        FROM (SELECT DISTINCT uid FROM e) e0
        LEFT JOIN nxt ON nxt.uid = e0.uid
      )
      SELECT nx AS next_event,
             CAST(count(1) AS BIGINT) AS n_users,
             CAST(count(1) AS BIGINT) AS sample_ok
      FROM u GROUP BY nx ORDER BY next_event"""))

  // ---------------------------------------------------------------------
  // X143: fuzzy-matching vocabulary — edit/Damerau distances (exact
  // integers), Jaro/Jaro-Winkler similarities and char-set Jaccard
  // (identical definitions to DuckDB's builtins, so the oracle calls
  // them directly; 6 dp on the averaged doubles), token-boundary
  // search (engine lookarounds ≡ oracle's RE2-safe padding trick),
  // and regex match counting.
  val q234FuzzyMatch = QueryDef(
    "q234_ch_fuzzy_match",
    (s, dir) => {
      Graft.table(s, dir, "events").createOrReplaceTempView("events_v234")
      s.sql("""
        SELECT event_type,
               toInt64(sum(editDistance(event_type,
                 substr(props, 1, 6)))) AS ed,
               toInt64(sum(damerauLevenshteinDistance(event_type,
                 substr(props, 1, 6)))) AS dl,
               round(avg(jaroSimilarity(event_type,
                 substr(props, 1, 6))), 6) AS js,
               round(avg(jaroWinklerSimilarity(event_type,
                 substr(props, 1, 6))), 6) AS jw,
               round(avg(stringJaccardIndex(event_type,
                 substr(props, 1, 6))), 6) AS sj,
               toInt64(sum(hasToken(props, 'a'))) AS ht,
               toInt64(sum(countMatches(props, '[0-9]+'))) AS cm,
               toInt64(count(1)) AS n
        FROM events_v234
        WHERE length(props) >= 6
        GROUP BY event_type ORDER BY event_type""")
    },
    Some("""
      SELECT event_type,
             CAST(sum(levenshtein(event_type, substr(props, 1, 6)))
               AS BIGINT) AS ed,
             CAST(sum(damerau_levenshtein(event_type,
               substr(props, 1, 6))) AS BIGINT) AS dl,
             round(avg(jaro_similarity(event_type,
               substr(props, 1, 6))), 6) AS js,
             round(avg(jaro_winkler_similarity(event_type,
               substr(props, 1, 6))), 6) AS jw,
             round(avg(jaccard(event_type, substr(props, 1, 6))), 6)
               AS sj,
             CAST(sum(CASE WHEN regexp_matches('#' || props || '#',
               '[^A-Za-z0-9_]a[^A-Za-z0-9_]') THEN 1 ELSE 0 END)
               AS BIGINT) AS ht,
             CAST(sum(len(regexp_extract_all(props, '[0-9]+')))
               AS BIGINT) AS cm,
             CAST(count(1) AS BIGINT) AS n
      FROM events WHERE length(props) >= 6
      GROUP BY event_type ORDER BY event_type"""))

  // ---------------------------------------------------------------------
  // X145: A/B-test planners + introspection/formatting sugar. The
  // planner outputs are CEILed to integers (a sample size is a count):
  // the Acklam inverse-normal's ~1e-9 error can never move an integer
  // ceiling, so the oracle's true-quantile constants agree exactly —
  // no fractional round-boundary to sit on.
  val q236PlannersTypes = QueryDef(
    "q236_ch_planners_types",
    (s, dir) => {
      Graft.table(s, dir, "events").createOrReplaceTempView("events_v236")
      s.sql("""
        SELECT event_type,
               toInt64(ceil(tupleElement(minSampleSizeConversion(
                 0.1, 0.02, 0.8, 0.05), 'minimum_sample_size')))
                 AS msc_n,
               toInt64(ceil(tupleElement(minSampleSizeContinuous(
                 100.0, 20.0, 0.05, 0.8, 0.05), 'minimum_sample_size')))
                 AS mst_n,
               round(tupleElement(minSampleSizeConversion(
                 0.1, 0.02, 0.8, 0.05), 'detect_range_upper'), 6)
                 AS msc_hi,
               min(toTypeName(event_id)) AS tn_id,
               min(toTypeName(props)) AS tn_props,
               min(formatReadableTimeDelta(event_id % 200000)) AS frt_min,
               max(formatReadableTimeDelta(event_id % 200000)) AS frt_max,
               toInt64(count(1)) AS n
        FROM events_v236
        GROUP BY event_type ORDER BY event_type""")
    },
    Some("""
      WITH z AS (SELECT 1.9599639845400545 AS za,
                        0.8416212335729143 AS zb),
      frt AS (
        SELECT event_type, event_id % 200000 AS s FROM events
      ), frts AS (
        SELECT event_type,
               CASE WHEN s <= 0 THEN '0 seconds' ELSE concat_ws(', ',
                 CASE WHEN s // 86400 > 0 THEN
                   CAST(s // 86400 AS VARCHAR) || ' day' ||
                   CASE WHEN s // 86400 > 1 THEN 's' ELSE '' END END,
                 CASE WHEN (s % 86400) // 3600 > 0 THEN
                   CAST((s % 86400) // 3600 AS VARCHAR) || ' hour' ||
                   CASE WHEN (s % 86400) // 3600 > 1 THEN 's' ELSE '' END
                   END,
                 CASE WHEN (s % 3600) // 60 > 0 THEN
                   CAST((s % 3600) // 60 AS VARCHAR) || ' minute' ||
                   CASE WHEN (s % 3600) // 60 > 1 THEN 's' ELSE '' END
                   END,
                 CASE WHEN s % 60 > 0 THEN
                   CAST(s % 60 AS VARCHAR) || ' second' ||
                   CASE WHEN s % 60 > 1 THEN 's' ELSE '' END END)
               END AS f
        FROM frt
      )
      SELECT frts.event_type,
             CAST(ceil(pow((SELECT za FROM z) * sqrt(2 * 0.11 * 0.89)
                 + (SELECT zb FROM z) * sqrt(0.1 * 0.9 + 0.12 * 0.88),
                 2) / (0.02 * 0.02)) AS BIGINT) AS msc_n,
             CAST(ceil(2 * pow((SELECT za FROM z) + (SELECT zb FROM z),
                 2) * 400.0 / pow(0.05 * 100.0, 2)) AS BIGINT) AS mst_n,
             round(0.1 + 0.02, 6) AS msc_hi,
             'Int64' AS tn_id, 'String' AS tn_props,
             min(f) AS frt_min, max(f) AS frt_max,
             CAST(count(1) AS BIGINT) AS n
      FROM frts GROUP BY frts.event_type ORDER BY event_type"""))

  // ---------------------------------------------------------------------
  // X148: map/array/JSON sugar — mapFilter/mapUpdate/mapPopulateSeries,
  // arrayFill/arrayReverseFill (root-HOF ArrayAggregate folds),
  // array{First,Last}OrNull, splitByNonAlpha, sorted groupConcat,
  // toJSONString, JSONExtractKeysAndValues. The oracle never needs map
  // functions: every map in the entry has a KNOWN construction shape,
  // so serializations and sizes reduce to modular arithmetic.
  val q239MapArraySugar = QueryDef(
    "q239_ch_map_array_sugar",
    (s, dir) => {
      Graft.table(s, dir, "events").createOrReplaceTempView("events_v239")
      s.sql("""
        WITH d AS (SELECT DISTINCT event_type,
                     CAST(user_id % 3 AS STRING) AS res
                   FROM events_v239)
        SELECT e.event_type,
               min(concat_ws(',', transform(map_entries(
                 mapUpdate(map('a', event_id % 5, 'b', user_id % 7),
                           map('b', CAST(1 AS BIGINT),
                               'c', CAST(2 AS BIGINT)))),
                 p -> concat(p.key, ':', CAST(p.value AS STRING)))))
                 AS mu_min,
               toInt64(sum(CASE WHEN size(map_keys(mapFilter(
                 (k, v) -> v > 2, map('x', event_id % 5)))) = 0
                 THEN 1 ELSE 0 END)) AS mf_empty,
               toInt64(sum(size(map_keys(mapPopulateSeries(
                 map(CAST(1 AS BIGINT), CAST(10 AS BIGINT),
                     event_id % 3 + 2, CAST(40 AS BIGINT)))))))
                 AS mp_keys,
               toInt64(sumArray(arrayFill(x -> x > 0,
                 array(CAST(0 AS BIGINT), event_id % 5 + 1,
                       CAST(0 AS BIGINT))))) AS af_sum,
               toInt64(sumArray(arrayReverseFill(x -> x > 0,
                 array(CAST(0 AS BIGINT), event_id % 5 + 1,
                       CAST(0 AS BIGINT))))) AS arf_sum,
               toInt64(sum(coalesce(arrayFirstOrNull(x -> x > 3,
                 array(event_id % 5, user_id % 7)), 0))) AS afo_sum,
               toInt64(sum(size(splitByNonAlpha(props)))) AS sna,
               min(gc.g) AS gconcat,
               min(toJSONString(named_struct('t', e.event_type))) AS js,
               min(concat_ws(',', transform(JSONExtractKeysAndValues(
                 concat('{"k": "', CAST(event_id % 2 AS STRING), '"}')),
                 p -> concat(p.key, '=', p.value)))) AS jkv,
               toInt64(count(1)) AS n
        FROM events_v239 e
        JOIN (SELECT event_type, groupConcat('-')(res) AS g
              FROM d GROUP BY event_type) gc
          ON gc.event_type = e.event_type
        GROUP BY e.event_type ORDER BY e.event_type""")
    },
    Some("""
      SELECT event_type,
             min('a:' || CAST(event_id % 5 AS VARCHAR) || ',b:1,c:2')
               AS mu_min,
             CAST(sum(CASE WHEN event_id % 5 <= 2 THEN 1 ELSE 0 END)
               AS BIGINT) AS mf_empty,
             CAST(sum(event_id % 3 + 2) AS BIGINT) AS mp_keys,
             CAST(sum(2 * (event_id % 5 + 1)) AS BIGINT) AS af_sum,
             CAST(sum(2 * (event_id % 5 + 1)) AS BIGINT) AS arf_sum,
             CAST(sum(CASE WHEN event_id % 5 > 3 THEN event_id % 5
               WHEN user_id % 7 > 3 THEN user_id % 7 ELSE 0 END)
               AS BIGINT) AS afo_sum,
             CAST(sum(len([x for x in regexp_split_to_array(props,
               '[^A-Za-z0-9]+') if x <> ''])) AS BIGINT) AS sna,
             '0-1-2' AS gconcat,
             '{"t":"' || event_type || '"}' AS js,
             min('k=' || CAST(event_id % 2 AS VARCHAR)) AS jkv,
             CAST(count(1) AS BIGINT) AS n
      FROM events GROUP BY event_type ORDER BY event_type"""))

  // ---------------------------------------------------------------------
  // X154: theta-sketch set algebra — uniqThetaState (the raw KMV k-min
  // array, MD5-48 so the oracle can rebuild it) and the union/
  // intersect/not estimators over two states (θ = min of the sides'
  // k-th minima, count·2^48/θ in exact integer arithmetic). The
  // mergeable-sketch answer to "how many users did BOTH cohorts
  // touch" at 100 TB — no distinct-set shuffle anywhere.
  val q243ThetaSetAlgebra = QueryDef(
    "q243_theta_set_algebra",
    (s, dir) => {
      Graft.table(s, dir, "events").createOrReplaceTempView("events_v243")
      s.sql("""
        WITH a AS (SELECT uniqThetaState(256)(toString(user_id)) AS sa
                   FROM events_v243 WHERE event_type = 'click'),
             b AS (SELECT uniqThetaState(256)(toString(user_id)) AS sb
                   FROM events_v243 WHERE event_type = 'view')
        SELECT uniqThetaUnion(sa, sb, 256) AS u_est,
               uniqThetaIntersect(sa, sb, 256) AS i_est,
               uniqThetaNot(sa, sb, 256) AS n_est,
               toInt64(size(sa)) AS ka, toInt64(size(sb)) AS kb
        FROM a CROSS JOIN b""")
    },
    Some("""
      WITH ha AS (
        SELECT DISTINCT CAST('0x' ||
          substring(md5(CAST(user_id AS VARCHAR)), 1, 12) AS BIGINT) AS h
        FROM events WHERE event_type = 'click'
      ), hb AS (
        SELECT DISTINCT CAST('0x' ||
          substring(md5(CAST(user_id AS VARCHAR)), 1, 12) AS BIGINT) AS h
        FROM events WHERE event_type = 'view'
      ), sa AS (SELECT h FROM (SELECT h, row_number() OVER (ORDER BY h)
                  AS rk FROM ha) WHERE rk <= 256),
      sb AS (SELECT h FROM (SELECT h, row_number() OVER (ORDER BY h)
               AS rk FROM hb) WHERE rk <= 256),
      th AS (
        SELECT least(
          CASE WHEN (SELECT count(*) FROM ha) < 256
            THEN 281474976710656 ELSE (SELECT max(h) FROM sa) END,
          CASE WHEN (SELECT count(*) FROM hb) < 256
            THEN 281474976710656 ELSE (SELECT max(h) FROM sb) END) AS t
      ), cnts AS (
        SELECT
          (SELECT count(*) FROM (SELECT h FROM sa UNION
             SELECT h FROM sb) u WHERE u.h < (SELECT t FROM th)) AS uc,
          (SELECT count(*) FROM sa WHERE h IN (SELECT h FROM sb)
             AND h < (SELECT t FROM th)) AS ic,
          (SELECT count(*) FROM sa WHERE h NOT IN (SELECT h FROM sb)
             AND h < (SELECT t FROM th)) AS nc
      )
      SELECT
        CASE WHEN (SELECT t FROM th) = 281474976710656 THEN uc
          ELSE (uc * 281474976710656) // (SELECT t FROM th) END AS u_est,
        CASE WHEN (SELECT t FROM th) = 281474976710656 THEN ic
          ELSE (ic * 281474976710656) // (SELECT t FROM th) END AS i_est,
        CASE WHEN (SELECT t FROM th) = 281474976710656 THEN nc
          ELSE (nc * 281474976710656) // (SELECT t FROM th) END AS n_est,
        CAST(least(256, (SELECT count(*) FROM ha)) AS BIGINT) AS ka,
        CAST(least(256, (SELECT count(*) FROM hb)) AS BIGINT) AS kb
      FROM cnts"""))

  // ---------------------------------------------------------------------
  // X153 promotion (round 10, verdict ask #5): keyed arraySort /
  // arrayReverseSort / arrayPartialSort were spec-pinned only; the
  // DuckDB replay is list_sort over {key, value} struct pairs (struct
  // ordering is field-lexicographic, so the key leads) — injective
  // keys by construction, so the missing tie-break can't show.
  val q244KeyedArraySort = QueryDef(
    "q244_keyed_array_sort",
    (s, dir) => {
      Graft.table(s, dir, "events").createOrReplaceTempView("events_v244")
      s.sql("""
        SELECT event_type,
               min(concat_ws(',', arrayMap(x -> toString(x),
                 arraySort(x -> (x * 7) % 13,
                   sequence(CAST(1 AS BIGINT), user_id % 6 + 1)))))
                 AS ks_min,
               uniqExact(concat_ws(',', arrayMap(x -> toString(x),
                 arrayReverseSort(x -> (x * 7) % 13,
                   sequence(CAST(1 AS BIGINT), user_id % 6 + 1)))))
                 AS krs_u,
               min(concat_ws(',', arraySort(x -> length(x),
                 array(concat('aa', toString(event_id % 3)), 'c',
                       concat('b', toString(user_id % 2)))))) AS kls_min,
               min(concat_ws(',', arrayMap(x -> toString(x),
                 arrayPartialSort(2, array(user_id % 6 + 3,
                   user_id % 6 + 1, CAST(2 AS BIGINT)))))) AS ps_min,
               toInt64(count(1)) AS n
        FROM events_v244 GROUP BY event_type ORDER BY event_type""")
    },
    Some("""
      SELECT event_type,
             min(array_to_string(list_transform(list_transform(list_sort(
               [{'k': (x*7)%13, 'v': x}
                for x in generate_series(1, user_id % 6 + 1)]),
               s -> s.v), x -> CAST(x AS VARCHAR)), ',')) AS ks_min,
             CAST(count(DISTINCT array_to_string(list_transform(
               list_transform(list_sort(
                 [{'k': (x*7)%13, 'v': x}
                  for x in generate_series(1, user_id % 6 + 1)], 'DESC'),
                 s -> s.v), x -> CAST(x AS VARCHAR)), ',')) AS BIGINT)
               AS krs_u,
             min(array_to_string(list_transform(list_sort(
               [{'k': len(x), 'v': x}
                for x in ['aa' || CAST(event_id % 3 AS VARCHAR), 'c',
                          'b' || CAST(user_id % 2 AS VARCHAR)]]),
               s -> s.v), ',')) AS kls_min,
             min(array_to_string(list_transform(list_sort(
               [user_id % 6 + 3, user_id % 6 + 1, 2]),
               x -> CAST(x AS VARCHAR)), ',')) AS ps_min,
             CAST(count(1) AS BIGINT) AS n
      FROM events GROUP BY event_type ORDER BY event_type"""))

  // ---------------------------------------------------------------------
  // X149 promotion (round 10, verdict ask #5): the hash VALUES stay
  // engine-defined (not SQL-replayable, as CH's aren't), but the
  // family's structural contracts ARE oracle rows now: determinism
  // (same text -> same sketch, across all partitions), the minhash
  // h1 <= h2 slot bound, and simhash discrimination (>= 90% of
  // distinct texts get distinct sketches — deterministic on the
  // pinned data, verified at both SFs).
  val q245HashSketchContracts = QueryDef(
    "q245_hash_sketch_contracts",
    (s, dir) => {
      Graft.table(s, dir, "documents")
        .createOrReplaceTempView("docs_v245")
      s.sql("""
        WITH sk AS (
          SELECT doc_id, text,
                 wordShingleSimHash(text) AS ss,
                 ngramSimHash(substring(text, 1, 50)) AS ns,
                 wordShingleMinHash(text) AS wm,
                 ngramMinHash(substring(text, 1, 50)) AS nm
          FROM docs_v245
        ), g AS (
          SELECT text, uniqExact(ss) AS uss, uniqExact(ns) AS uns,
                 uniqExact(concat(toString(wm.h1), ':',
                                  toString(wm.h2))) AS uwm,
                 uniqExact(concat(toString(nm.h1), ':',
                                  toString(nm.h2))) AS unm
          FROM sk GROUP BY text
        )
        SELECT
          (SELECT toInt64(count(1)) FROM sk) AS n,
          (SELECT toInt64(count(1)) FROM g) AS nt,
          (SELECT toInt64(sum(CASE WHEN uss > 1 OR uns > 1
             OR uwm > 1 OR unm > 1 THEN 1 ELSE 0 END)) FROM g)
            AS mismatch_groups,
          (SELECT toInt64(sum(CASE WHEN wm.h1 <= wm.h2
             AND nm.h1 <= nm.h2 THEN 0 ELSE 1 END)) FROM sk)
            AS bound_violations,
          (SELECT uniqExact(ss) >= 0.9 * uniqExact(text) FROM sk)
            AS ss_discriminates""")
    },
    Some("""
      SELECT CAST(count(1) AS BIGINT) AS n,
             CAST(count(DISTINCT text) AS BIGINT) AS nt,
             CAST(0 AS BIGINT) AS mismatch_groups,
             CAST(0 AS BIGINT) AS bound_violations,
             true AS ss_discriminates
      FROM documents"""))

  // ---------------------------------------------------------------------
  // Round-10 stretch (verdict ask #8): `LIMIT n WITH TIES` composed
  // with `ANY LEFT JOIN` in ONE statement — the two marker rewrites
  // (TotalsParser boundary filter, ChClauses right-side trim) run on
  // the same plan; this entry pins that the rules don't fight (the
  // known rule-ordering risk class in ChDialect). The ANY match is
  // the engine's deterministic minimum-right-row pick (q130's
  // contract); the tie axis `grp` has only 5 values, so the boundary
  // filter genuinely expands past row 7.
  val q246TiesAnyJoin = QueryDef(
    "q246_ties_any_join",
    (s, dir) => {
      import org.apache.spark.sql.functions.col
      Graft.table(s, dir, "events").createOrReplaceTempView("events_v246")
      s.sql("""
        SELECT u.user_id, e.event_id, e.event_type,
               toInt64(e.event_id % 5) AS grp
        FROM (SELECT DISTINCT user_id FROM events_v246) u
        ANY LEFT JOIN events_v246 e ON u.user_id = e.user_id
        ORDER BY grp DESC
        LIMIT 7 WITH TIES""")
        .orderBy(col("grp").desc, col("user_id"))
    },
    Some("""
      WITH u AS (SELECT DISTINCT user_id FROM events),
      f AS (
        SELECT user_id, event_id, event_type,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY event_id) AS rn
        FROM events
      ), j AS (
        SELECT u.user_id, f.event_id, f.event_type,
               CAST(f.event_id % 5 AS BIGINT) AS grp
        FROM u LEFT JOIN f ON u.user_id = f.user_id AND f.rn = 1
      ), m AS (
        SELECT min(grp) AS b
        FROM (SELECT grp FROM j ORDER BY grp DESC LIMIT 7)
      )
      SELECT j.user_id, j.event_id, j.event_type, j.grp
      FROM j, m WHERE j.grp >= m.b
      ORDER BY grp DESC, user_id"""))

  // ---------------------------------------------------------------------
  // Round-10 dialect fill (X155): studentTTest (pooled-variance t over
  // exact long Σx/Σx² folds, IEEE finals mirrored by the oracle),
  // arrayRotate (left rotation, pmod), avgMap (exact sum+count folds,
  // final per-key division), mapApply (entry-rewriting map HOF),
  // intExp2/intExp10 (exact shift/lookup, never pow()'s rounding),
  // quantileGK (Greenwald–Khanna == Spark approx_percentile; value is
  // sketch-defined, so the compared surface is the BRACKET between
  // exact quantiles at level ∓ 4/accuracy, not the value).
  val q247DialectRound10 = QueryDef(
    "q247_ch_dialect_round10",
    (s, dir) => {
      Graft.table(s, dir, "events").createOrReplaceTempView("events_v247")
      s.sql("""
        SELECT event_type,
               round(studentTTest(user_id % 97, event_id % 2), 6) AS tt,
               min(concat_ws(',', arrayMap(x -> toString(x),
                 arrayRotate(sequence(CAST(1 AS BIGINT), user_id % 4 + 2),
                   event_id % 7)))) AS rot_min,
               round(arrayElement(
                 avgMap(array('a', 'b'),
                   array(user_id % 5, event_id % 7)).avgs, 1), 6) AS am_a,
               round(arrayElement(
                 avgMap(array('a', 'b'),
                   array(user_id % 5, event_id % 7)).avgs, 2), 6) AS am_b,
               toInt64(sum(element_at(mapApply(
                 (k, v) -> (concat(k, '!'), v * 2),
                 map('x', CAST(user_id % 3 AS BIGINT))), 'x!'))) AS ma,
               toInt64(sum(intExp2(user_id % 20))) AS e2,
               toInt64(sum(intExp10(user_id % 5))) AS e10,
               quantileGK(100, 0.5)(user_id % 1000)
                 BETWEEN quantileExact(0.46)(user_id % 1000)
                 AND quantileExact(0.54)(user_id % 1000) AS gk_ok,
               toInt64(count(1)) AS n
        FROM events_v247 GROUP BY event_type ORDER BY event_type""")
    },
    Some("""
      SELECT event_type,
             round((sum(CASE WHEN event_id % 2 = 0
                 THEN user_id % 97 ELSE 0 END)::DOUBLE
               / sum(CASE WHEN event_id % 2 = 0 THEN 1 ELSE 0 END)::DOUBLE
               - sum(CASE WHEN event_id % 2 <> 0
                   THEN user_id % 97 ELSE 0 END)::DOUBLE
                 / sum(CASE WHEN event_id % 2 <> 0 THEN 1 ELSE 0 END)::DOUBLE)
               / sqrt(
                 ((sum(CASE WHEN event_id % 2 = 0
                     THEN (user_id % 97) * (user_id % 97) ELSE 0 END)::DOUBLE
                   - sum(CASE WHEN event_id % 2 = 0
                       THEN user_id % 97 ELSE 0 END)::DOUBLE
                     * sum(CASE WHEN event_id % 2 = 0
                         THEN user_id % 97 ELSE 0 END)::DOUBLE
                     / sum(CASE WHEN event_id % 2 = 0
                         THEN 1 ELSE 0 END)::DOUBLE)
                  + (sum(CASE WHEN event_id % 2 <> 0
                      THEN (user_id % 97) * (user_id % 97) ELSE 0 END)::DOUBLE
                   - sum(CASE WHEN event_id % 2 <> 0
                       THEN user_id % 97 ELSE 0 END)::DOUBLE
                     * sum(CASE WHEN event_id % 2 <> 0
                         THEN user_id % 97 ELSE 0 END)::DOUBLE
                     / sum(CASE WHEN event_id % 2 <> 0
                         THEN 1 ELSE 0 END)::DOUBLE))
                 / (count(1)::DOUBLE - 2)
                 * (1.0 / sum(CASE WHEN event_id % 2 = 0
                     THEN 1 ELSE 0 END)::DOUBLE
                    + 1.0 / sum(CASE WHEN event_id % 2 <> 0
                        THEN 1 ELSE 0 END)::DOUBLE)), 6) AS tt,
             min((SELECT array_to_string(
               [CAST(l[((i - 1 + k) % len(l)) + 1] AS VARCHAR)
                for i in generate_series(1, len(l))], ',')
               FROM (SELECT generate_series(1, user_id % 4 + 2) AS l,
                            event_id % 7 AS k))) AS rot_min,
             round(avg(user_id % 5), 6) AS am_a,
             round(avg(event_id % 7), 6) AS am_b,
             CAST(sum(2 * (user_id % 3)) AS BIGINT) AS ma,
             CAST(sum(1 << (user_id % 20)) AS BIGINT) AS e2,
             CAST(sum(CAST(pow(10, user_id % 5) AS BIGINT)) AS BIGINT)
               AS e10,
             true AS gk_ok,
             CAST(count(1) AS BIGINT) AS n
      FROM events GROUP BY event_type ORDER BY event_type"""))

  // ---------------------------------------------------------------------
  // X159: HyperLogLog (uniqHLL12/uniqCombined) — the fixed-4KB
  // mergeable distinct-count state (theta/KMV keeps k hashes; HLL
  // keeps max-rank registers — the classic trade at 100 TB when
  // sketches themselves are numerous). The oracle REBUILDS all 4096
  // registers from MD5-48 and replays S (exact integer — Σ 2^(−M)
  // scaled by 2^37 so no float summation order exists), the
  // zero-register count, and the raw estimate; the linear-counting
  // corrected estimate is ln-based and bracket-compared per the
  // transcendental policy.
  val q251Hll = QueryDef(
    "q251_hll_registers",
    (s, dir) => {
      Graft.table(s, dir, "events").createOrReplaceTempView("events_v251")
      s.sql("""
        SELECT event_type,
               uniqHLL12State(toString(user_id)).s AS hs,
               uniqHLL12State(toString(user_id)).zeros AS hz,
               uniqHLL12State(toString(user_id)).raw AS hraw,
               uniqExact(user_id) AS exact,
               abs(uniqHLL12(toString(user_id)) - uniqExact(user_id))
                 <= greatest(CAST(0.05 * uniqExact(user_id) AS BIGINT),
                             CAST(10 AS BIGINT)) AS hll_ok,
               toInt64(count(1)) AS n
        FROM events_v251 GROUP BY event_type ORDER BY event_type""")
    },
    Some("""
      WITH v AS (
        SELECT DISTINCT event_type, CAST(user_id AS VARCHAR) AS sv
        FROM events
      ), h AS (
        SELECT event_type,
               CAST('0x' || substring(md5(sv), 1, 12) AS BIGINT) AS hh
        FROM v
      ), r AS (
        SELECT event_type, hh // 68719476736 AS bucket,
               hh % 68719476736 AS rem
        FROM h
      ), rk AS (
        SELECT event_type, bucket,
               CASE WHEN rem = 0 THEN 37
                    ELSE 37 - len(bin(rem)) END AS rnk
        FROM r
      ), mm AS (
        SELECT event_type, bucket, max(rnk) AS mj
        FROM rk GROUP BY 1, 2
      ), st AS (
        SELECT event_type,
               CAST(sum(1::BIGINT << (37 - mj))
                 + (4096 - count(*)) * 137438953472 AS BIGINT) AS hs,
               CAST(4096 - count(*) AS BIGINT) AS hz
        FROM mm GROUP BY 1
      ), ex AS (
        SELECT event_type, CAST(count(*) AS BIGINT) AS exact
        FROM v GROUP BY 1
      ), cnt AS (
        SELECT event_type, CAST(count(1) AS BIGINT) AS n
        FROM events GROUP BY 1
      )
      SELECT st.event_type, st.hs, st.hz,
             CAST(floor(0.7213 / (1 + 1.079 / 4096) * 16777216
               * 137438953472 / st.hs) AS BIGINT) AS hraw,
             ex.exact, true AS hll_ok, cnt.n
      FROM st
      JOIN ex ON ex.event_type = st.event_type
      JOIN cnt ON cnt.event_type = st.event_type
      ORDER BY st.event_type"""))

  // ---------------------------------------------------------------------
  // X160: round-10 dialect fill #2 — arrayDotProduct (native dot
  // kernel; compared via an exact-half-integer surface so no float
  // sum order exists), arrayUniq, arrayLastIndex (ONE root
  // ArrayAggregate), extractAllGroups (group count read from the
  // literal pattern), bit/char hamming, editDistanceUTF8, sumCount,
  // countDistinct (uniqExact alias), quantileInterpolatedWeighted
  // (integer weights are repetitions == percentile(x, q, w)), and
  // arrayZipUnaligned (NULL-padded to the longest input).
  val q252DialectRound10b = QueryDef(
    "q252_ch_dialect_round10b",
    (s, dir) => {
      Graft.table(s, dir, "events").createOrReplaceTempView("events_v252")
      s.sql("""
        SELECT event_type,
               toInt64(sum(CAST(arrayDotProduct(
                 array(CAST(user_id % 5 AS DOUBLE), 1.5D),
                 array(2.0D, CAST(event_id % 3 AS DOUBLE))) * 2
                 AS BIGINT))) AS adp2,
               toInt64(sum(arrayUniq(array(user_id % 3, event_id % 3,
                 CAST(1 AS BIGINT))))) AS au,
               toInt64(sum(arrayLastIndex(x -> x % 2 = 0,
                 sequence(CAST(1 AS BIGINT), user_id % 6 + 1)))) AS ali,
               min(concat_ws('|',
                 try_element_at(extractAllGroups(props,
                   '"([a-z]+)": ([0-9]+)'), 1))) AS eag,
               toInt64(sum(bitHammingDistance(user_id, event_id)))
                 AS bhd,
               toInt64(sum(byteHammingDistance(toString(user_id % 100),
                 toString(event_id % 100)))) AS chd,
               toInt64(sum(editDistanceUTF8(toString(user_id % 20),
                 toString(event_id % 20)))) AS ed,
               sumCount(user_id % 7).sum AS scs,
               sumCount(user_id % 7).count AS scc,
               countDistinct(user_id % 50) AS cd,
               round(quantileInterpolatedWeighted(0.5)(user_id % 100,
                 event_id % 3 + 1), 6) AS qiw,
               min(concat_ws(',', arrayMap(t ->
                 concat(coalesce(toString(t.`1`), 'N'), ':',
                        coalesce(t.`2`, 'N')),
                 arrayZipUnaligned(sequence(CAST(1 AS BIGINT),
                   user_id % 3 + 1), array('a', 'b'))))) AS azu,
               toInt64(count(1)) AS n
        FROM events_v252 GROUP BY event_type ORDER BY event_type""")
    },
    Some("""
      WITH qx AS (
        SELECT event_type, round(quantile_cont(x, 0.5), 6) AS qiw
        FROM (SELECT event_type, unnest([user_id % 100 + 0*i
                for i in generate_series(1, event_id % 3 + 1)]) AS x
              FROM events)
        GROUP BY 1
      ), base AS (
        SELECT event_type,
               CAST(sum(4 * (user_id % 5) + 3 * (event_id % 3))
                 AS BIGINT) AS adp2,
               CAST(sum(len(list_distinct(
                 [user_id % 3, event_id % 3, 1]))) AS BIGINT) AS au,
               CAST(sum((user_id % 6 + 1) - (user_id % 6 + 1) % 2)
                 AS BIGINT) AS ali,
               min(regexp_extract(props, '"([a-z]+)": ([0-9]+)', 1)
                 || '|' ||
                 regexp_extract(props, '"([a-z]+)": ([0-9]+)', 2))
                 AS eag,
               CAST(sum(bit_count(xor(user_id, event_id))) AS BIGINT)
                 AS bhd,
               CAST(sum((SELECT len([i FOR i IN generate_series(1,
                   least(len(a), len(b)))
                   IF substring(a, i, 1) <> substring(b, i, 1)])
                 + abs(len(a) - len(b))
                 FROM (SELECT CAST(user_id % 100 AS VARCHAR) AS a,
                              CAST(event_id % 100 AS VARCHAR) AS b)))
                 AS BIGINT) AS chd,
               CAST(sum(levenshtein(CAST(user_id % 20 AS VARCHAR),
                 CAST(event_id % 20 AS VARCHAR))) AS BIGINT) AS ed,
               CAST(sum(user_id % 7) AS BIGINT) AS scs,
               CAST(count(user_id % 7) AS BIGINT) AS scc,
               CAST(count(DISTINCT user_id % 50) AS BIGINT) AS cd,
               min(CASE WHEN user_id % 3 = 0 THEN '1:a,N:b'
                        WHEN user_id % 3 = 1 THEN '1:a,2:b'
                        ELSE '1:a,2:b,3:N' END) AS azu,
               CAST(count(1) AS BIGINT) AS n
        FROM events GROUP BY event_type
      )
      SELECT base.event_type, adp2, au, ali, eag, bhd, chd, ed,
             scs, scc, cd, qx.qiw, azu, n
      FROM base JOIN qx ON qx.event_type = base.event_type
      ORDER BY base.event_type"""))

  // ---------------------------------------------------------------------
  // X165: the If-combinators on argMax/argMin/anyLast plus
  // groupArrayInsertAt (deterministic min-per-slot refinement of
  // CH's block-order first-wins; gaps fill with the type default).
  val q256IfCombinators = QueryDef(
    "q256_ch_if_combinators",
    (s, dir) => {
      Graft.table(s, dir, "events").createOrReplaceTempView("events_v256")
      s.sql("""
        SELECT event_type,
               toInt64(argMaxIf(user_id % 100, event_id,
                 event_id % 7 = 3)) AS amx,
               toInt64(argMinIf(user_id % 100, event_id,
                 event_id % 7 = 3)) AS amn,
               toInt64(anyLastIf(user_id % 50, event_id % 11 = 5)) AS alf,
               argMaxIf(user_id, event_id, event_id < 0) AS amx_none,
               concat_ws(',', arrayMap(x -> toString(x),
                 groupArrayInsertAt(user_id % 100, user_id % 8)))
                 AS gai,
               toInt64(count(1)) AS n
        FROM events_v256 GROUP BY event_type ORDER BY event_type""")
    },
    Some("""
      WITH ga AS (
        SELECT event_type, user_id % 8 AS p, min(user_id % 100) AS v
        FROM events GROUP BY 1, 2
      ), gas AS (
        SELECT event_type,
               string_agg(CAST(v AS VARCHAR), ',' ORDER BY p) AS g
        FROM ga GROUP BY 1
      )
      SELECT e.event_type,
             CAST(arg_max(user_id % 100, event_id)
               FILTER (WHERE event_id % 7 = 3) AS BIGINT) AS amx,
             CAST(arg_min(user_id % 100, event_id)
               FILTER (WHERE event_id % 7 = 3) AS BIGINT) AS amn,
             CAST(max(user_id % 50)
               FILTER (WHERE event_id % 11 = 5) AS BIGINT) AS alf,
             CAST(arg_max(user_id, event_id)
               FILTER (WHERE event_id < 0) AS BIGINT) AS amx_none,
             min(gas.g) AS gai,
             CAST(count(1) AS BIGINT) AS n
      FROM events e JOIN gas ON gas.event_type = e.event_type
      GROUP BY e.event_type ORDER BY e.event_type"""))

  // ---------------------------------------------------------------------
  // X170: the CH `QUALIFY` clause — filter on window results after
  // windows evaluate. Structural parser rewrite (synthetic predicate
  // column + EXCEPT-wrap, ORDER/LIMIT tail stays outer); DuckDB
  // ships QUALIFY natively, so the oracle is the SAME clause
  // verbatim — the strongest replay form available.
  val q261Qualify = QueryDef(
    "q261_ch_qualify",
    (s, dir) => {
      Graft.table(s, dir, "events").createOrReplaceTempView("events_v261")
      s.sql("""
        SELECT event_type, user_id, toInt64(count(1)) AS cnt,
               toInt64(row_number() OVER (PARTITION BY event_type
                 ORDER BY count(1) DESC, user_id)) AS rn
        FROM events_v261
        GROUP BY event_type, user_id
        QUALIFY rn <= 3
        ORDER BY event_type, rn""")
    },
    Some("""
      SELECT event_type, user_id, CAST(count(1) AS BIGINT) AS cnt,
             CAST(row_number() OVER (PARTITION BY event_type
               ORDER BY count(1) DESC, user_id) AS BIGINT) AS rn
      FROM events
      GROUP BY event_type, user_id
      QUALIFY rn <= 3
      ORDER BY event_type, rn"""))

  // ---------------------------------------------------------------------
  // X171: `system.columns` introspection — the runbook's other half
  // next to system.tables/parts/projections ("what type is that
  // column again"), with types in CH SPELLING so reference queries
  // read unchanged. Driver-sized: schema from the parquet footer,
  // never a data scan.
  val q262SystemColumns = QueryDef(
    "q262_ch_system_columns",
    (s, dir) => {
      import graft.sources.{Binding, Catalog}
      Catalog.register(s,
        Binding("q262_events", s"$dir/events.parquet"),
        Binding("q262_docs", s"$dir/documents.parquet"))
      s.sql("""
        SELECT `table`, name, toInt64(position) AS position, type
        FROM system.columns
        WHERE `table` LIKE 'q262_%' ORDER BY `table`, position""")
    },
    Some("""
      SELECT * FROM (VALUES
        ('q262_docs', 'doc_id', 1, 'Int64'),
        ('q262_docs', 'text', 2, 'String'),
        ('q262_docs', 'lang', 3, 'String'),
        ('q262_docs', 'source', 4, 'String'),
        ('q262_docs', 'n_chars', 5, 'Int64'),
        ('q262_events', 'event_id', 1, 'Int64'),
        ('q262_events', 'ts', 2, 'DateTime64(6)'),
        ('q262_events', 'user_id', 3, 'Int64'),
        ('q262_events', 'event_type', 4, 'String'),
        ('q262_events', 'value', 5, 'Float64'),
        ('q262_events', 'props', 6, 'String'))
        AS t("table", name, position, type)
      ORDER BY "table", position"""))

  // ---------------------------------------------------------------------
  // X174: round-11 dialect fill #3 — bin (full-width 64-bit two's
  // complement; Spark's and DuckDB's bin() agree on negatives, one
  // lpad unifies widths), mortonEncode/mortonDecode (the Z-order
  // interleave — disjoint-bit OR of literal shifts, replayed as the
  // same shifts in a DuckDB list comprehension; roundtrip pins decode),
  // greatCircleAngle (haversine central angle in degrees — q137's
  // green gc discipline: +0.5 grid, +0.001 nudge, floor at a coarse
  // grain, exact-integer sum), tryBase64Decode ('' on malformed, the
  // try* contract), regexpQuoteMeta, multiSearchAnyCaseInsensitive,
  // and simpleJSONExtractRaw (naive RAW scalar scan — one RE2-safe
  // regexp, byte-replayable).
  val q264DialectRound11 = QueryDef(
    "q264_ch_dialect_round11",
    (s, dir) => {
      Graft.table(s, dir, "events").createOrReplaceTempView("events_v264")
      s.sql("""
        SELECT event_type,
               min(bin(user_id % 9 - 4)) AS bn,
               toInt64(sum(mortonEncode(user_id % 1024,
                 event_id % 1024))) AS me,
               toInt64(sum(mortonDecode(2, mortonEncode(user_id % 1024,
                 event_id % 1024)).a)) AS mda,
               toInt64(sum(mortonDecode(2, mortonEncode(user_id % 1024,
                 event_id % 1024)).b)) AS mdb,
               toInt64(sum(floor(greatCircleAngle(
                 CAST(event_id % 90 AS DOUBLE) + 0.5,
                 CAST(user_id % 45 AS DOUBLE) + 0.5,
                 CAST(event_id % 79 AS DOUBLE) + 0.5,
                 CAST(user_id % 53 AS DOUBLE) + 0.5) * 100
                 + 0.001))) AS gca,
               max(tryBase64Decode(CASE WHEN user_id % 2 = 0
                 THEN base64Encode(toString(event_id % 100))
                 ELSE '%%%' END)) AS tb64,
               toInt64(sum(CASE WHEN tryBase64Decode(
                 CASE WHEN user_id % 2 = 0
                   THEN base64Encode(toString(event_id % 100))
                   ELSE '%%%' END) = '' THEN 1 ELSE 0 END)) AS tb64e,
               min(regexpQuoteMeta(concat('p', toString(user_id % 5),
                 '.*+?[x]'))) AS rqm,
               toInt64(sum(multiSearchAnyCaseInsensitive(event_type,
                 array('IEW', 'LICK', 'RRor')))) AS msa,
               min(simpleJSONExtractRaw(props, 'k')) AS sjr,
               toInt64(count(1)) AS n
        FROM events_v264 GROUP BY event_type ORDER BY event_type""")
    },
    Some("""
      SELECT event_type,
             min(lpad(bin(CAST(user_id % 9 - 4 AS BIGINT)), 64, '0'))
               AS bn,
             CAST(sum(list_sum([
               ((((user_id % 1024) >> i) & 1) << (2*i))
               + ((((event_id % 1024) >> i) & 1) << ((2*i) + 1))
               for i in generate_series(0, 9)])) AS BIGINT) AS me,
             CAST(sum(user_id % 1024) AS BIGINT) AS mda,
             CAST(sum(event_id % 1024) AS BIGINT) AS mdb,
             CAST(sum(floor(degrees(2 * asin(sqrt(
               pow(sin((radians(CAST(user_id % 53 AS DOUBLE) + 0.5)
                 - radians(CAST(user_id % 45 AS DOUBLE) + 0.5)) / 2), 2)
               + cos(radians(CAST(user_id % 45 AS DOUBLE) + 0.5))
               * cos(radians(CAST(user_id % 53 AS DOUBLE) + 0.5))
               * pow(sin((radians(CAST(event_id % 79 AS DOUBLE) + 0.5)
                 - radians(CAST(event_id % 90 AS DOUBLE) + 0.5)) / 2), 2)
               ))) * 100 + 0.001)) AS BIGINT) AS gca,
             max(CASE WHEN user_id % 2 = 0
               THEN CAST(event_id % 100 AS VARCHAR) ELSE '' END) AS tb64,
             CAST(sum(CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END)
               AS BIGINT) AS tb64e,
             min('p' || CAST(user_id % 5 AS VARCHAR)
               || '\.\*\+\?\[x\]') AS rqm,
             CAST(sum(CASE WHEN event_type IN ('view', 'click', 'error')
               THEN 1 ELSE 0 END) AS BIGINT) AS msa,
             min(regexp_extract(props,
               '"k"\s*:\s*("(?:[^"\\]|\\.)*"|-?[0-9][0-9.eE+-]*|true|false|null)',
               1)) AS sjr,
             CAST(count(1) AS BIGINT) AS n
      FROM events GROUP BY event_type ORDER BY event_type"""))

  // ---------------------------------------------------------------------
  // X176: quantileTDigest / quantilesTDigest — the tail-accurate
  // quantile sketch completing the family (GK = uniform rank error,
  // timing = fixed bins, t-digest = k1 tail concentration). Estimates
  // are merge-order-defined (in CH too), so the compared cells are
  // BRACKET booleans against exact quantiles at level ∓ 0.02 rank
  // (the theta/HLL convention) plus exact count/min/max; the oracle
  // replays the exact sides and expects every bracket to hold — with
  // δ = 100 the k1 bound keeps the digest's rank error an order of
  // magnitude inside the band under any merge order.
  val q266TDigest = QueryDef(
    "q266_ch_tdigest",
    (s, dir) => {
      Graft.table(s, dir, "events").createOrReplaceTempView("events_v266")
      s.sql("""
        SELECT event_type,
               toInt64(count(1)) AS n,
               toInt64(min(user_id)) AS mn,
               toInt64(max(user_id)) AS mx,
               CASE WHEN quantileTDigest(0.5)(CAST(user_id AS DOUBLE))
                 BETWEEN percentile(user_id, 0.48)
                     AND percentile(user_id, 0.52)
                 THEN 1 ELSE 0 END AS ok50,
               CASE WHEN quantileTDigest(0.95)(CAST(user_id AS DOUBLE))
                 BETWEEN percentile(user_id, 0.93)
                     AND percentile(user_id, 0.97)
                 THEN 1 ELSE 0 END AS ok95,
               CASE WHEN quantileTDigest(0.99)(CAST(user_id AS DOUBLE))
                 BETWEEN percentile(user_id, 0.97)
                     AND CAST(max(user_id) AS DOUBLE)
                 THEN 1 ELSE 0 END AS ok99,
               CASE WHEN element_at(quantilesTDigest(0.25, 0.5, 0.75)(
                   CAST(user_id AS DOUBLE)), 1)
                 <= element_at(quantilesTDigest(0.25, 0.5, 0.75)(
                   CAST(user_id AS DOUBLE)), 2)
                 AND element_at(quantilesTDigest(0.25, 0.5, 0.75)(
                   CAST(user_id AS DOUBLE)), 2)
                 <= element_at(quantilesTDigest(0.25, 0.5, 0.75)(
                   CAST(user_id AS DOUBLE)), 3)
                 THEN 1 ELSE 0 END AS mono
        FROM events_v266 GROUP BY event_type ORDER BY event_type""")
    },
    Some("""
      SELECT event_type, CAST(count(1) AS BIGINT) AS n,
             CAST(min(user_id) AS BIGINT) AS mn,
             CAST(max(user_id) AS BIGINT) AS mx,
             1 AS ok50, 1 AS ok95, 1 AS ok99, 1 AS mono
      FROM events GROUP BY event_type ORDER BY event_type"""))

  // ---------------------------------------------------------------------
  // X177: corrMatrix — the n×n Pearson matrix from EXACT integer
  // moment sums (count, Σx, Σx², Σxy fold as longs; the only IEEE ops
  // are the final two sqrts and one divide, spelled identically in
  // the oracle → bit-identical cells, rounded 6 dp on both sides).
  // The diagonal is exactly 1.0 (x/x with x > 0), pinned as a boolean.
  val q267CorrMatrix = QueryDef(
    "q267_ch_corr_matrix",
    (s, dir) => {
      Graft.table(s, dir, "events").createOrReplaceTempView("events_v267")
      s.sql("""
        SELECT event_type,
               round(element_at(element_at(m, 1), 2), 6) AS c12,
               round(element_at(element_at(m, 1), 3), 6) AS c13,
               round(element_at(element_at(m, 2), 3), 6) AS c23,
               CASE WHEN element_at(element_at(m, 1), 1) = 1.0D
                     AND element_at(element_at(m, 2), 2) = 1.0D
                     AND element_at(element_at(m, 3), 3) = 1.0D
                    THEN 1 ELSE 0 END AS diag,
               n
        FROM (
          SELECT event_type,
                 corrMatrix(user_id % 97, event_id % 89,
                   (user_id + event_id) % 83) AS m,
                 toInt64(count(1)) AS n
          FROM events_v267 GROUP BY event_type)
        ORDER BY event_type""")
    },
    Some("""
      WITH x AS (
        SELECT event_type, user_id % 97 AS x1, event_id % 89 AS x2,
               (user_id + event_id) % 83 AS x3
        FROM events
      ), s AS (
        SELECT event_type, CAST(count(1) AS BIGINT) AS n,
               CAST(sum(x1) AS BIGINT) AS s1,
               CAST(sum(x2) AS BIGINT) AS s2,
               CAST(sum(x3) AS BIGINT) AS s3,
               CAST(sum(x1*x1) AS BIGINT) AS q1,
               CAST(sum(x2*x2) AS BIGINT) AS q2,
               CAST(sum(x3*x3) AS BIGINT) AS q3,
               CAST(sum(x1*x2) AS BIGINT) AS p12,
               CAST(sum(x1*x3) AS BIGINT) AS p13,
               CAST(sum(x2*x3) AS BIGINT) AS p23
        FROM x GROUP BY 1)
      SELECT event_type,
             round(CAST(n*p12 - s1*s2 AS DOUBLE)
               / (sqrt(CAST(n*q1 - s1*s1 AS DOUBLE))
                  * sqrt(CAST(n*q2 - s2*s2 AS DOUBLE))), 6) AS c12,
             round(CAST(n*p13 - s1*s3 AS DOUBLE)
               / (sqrt(CAST(n*q1 - s1*s1 AS DOUBLE))
                  * sqrt(CAST(n*q3 - s3*s3 AS DOUBLE))), 6) AS c13,
             round(CAST(n*p23 - s2*s3 AS DOUBLE)
               / (sqrt(CAST(n*q2 - s2*s2 AS DOUBLE))
                  * sqrt(CAST(n*q3 - s3*s3 AS DOUBLE))), 6) AS c23,
             1 AS diag, n
      FROM s ORDER BY event_type"""))

  // ---------------------------------------------------------------------
  // X178: windowFunnel strict modes (strict_order / strict_dedup /
  // strict_increase) — the funnel-level histogram under all four mode
  // configurations at once. The oracle extends q78's PROVEN window
  // cascade one leg per mode: strict_order filters every stage by the
  // "no intruder strictly before" prefix flag; strict_dedup finds the
  // first chain-killing row against the default-evolved prefix state
  // (before the first kill the two evolutions coincide, so the
  // circularity is benign) and scores only rows before it;
  // strict_increase adds the strictly-greater-than-previous-advance
  // timestamp predicates (w1 doubles as level-1's event time; the
  // latest advance's chain start is the prefix max because chain
  // starts are non-decreasing in event order). A list_reduce struct
  // fold was tried first and is UNSTABLE in DuckDB 1.0 (same query,
  // different projections, different fold results) — cascades only.
  // The tie policy (events sort by (ts, c0, c1, c2); a chain-killing
  // event never also advances) is part of the replayed definition.
  val q268FunnelModes = QueryDef(
    "q268_funnel_modes",
    (s, dir) => {
      Graft.table(s, dir, "events").createOrReplaceTempView("events_v268")
      s.sql("""
        WITH u AS (
          SELECT user_id,
            windowFunnel(7200)(ts, event_type = 'view',
              event_type = 'click', event_type = 'purchase') AS l_def,
            windowFunnel(7200, 'strict_order')(ts, event_type = 'view',
              event_type = 'click', event_type = 'purchase') AS l_ord,
            windowFunnel(7200, 'strict_dedup')(ts, event_type = 'view',
              event_type = 'click', event_type = 'purchase') AS l_ded,
            windowFunnel(7200, 'strict_increase')(ts,
              event_type = 'view', event_type = 'click',
              event_type = 'purchase') AS l_inc
          FROM events_v268 GROUP BY user_id)
        SELECT mode, lvl, toInt64(count(1)) AS n FROM (
          SELECT 'default' AS mode, toInt64(l_def) AS lvl FROM u
          UNION ALL SELECT 'order', toInt64(l_ord) FROM u
          UNION ALL SELECT 'dedup', toInt64(l_ded) FROM u
          UNION ALL SELECT 'increase', toInt64(l_inc) FROM u)
        GROUP BY mode, lvl ORDER BY mode, lvl""")
    },
    Some("""
      WITH e AS (
        SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS t,
               coalesce(event_type = 'view', false) AS c0,
               coalesce(event_type = 'click', false) AS c1,
               coalesce(event_type = 'purchase', false) AS c2
        FROM events
      ), e2 AS (
        SELECT *, row_number() OVER po AS rn,
          coalesce(bool_or(NOT (c0 OR c1 OR c2)) OVER pw, false) AS blk
        FROM e
        WINDOW po AS (PARTITION BY user_id ORDER BY t, c0, c1, c2),
               pw AS (PARTITION BY user_id ORDER BY t, c0, c1, c2
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
      ), a AS (
        SELECT *,
          max(CASE WHEN c0 THEN t END) OVER pw AS w1,
          max(CASE WHEN c0 AND NOT blk THEN t END) OVER pw AS w1o
        FROM e2
        WINDOW pw AS (PARTITION BY user_id ORDER BY t, c0, c1, c2
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
      ), b AS (
        SELECT *,
          CASE WHEN c1 AND w1 IS NOT NULL AND t <= w1 + 7200 THEN w1 END AS p1,
          CASE WHEN c1 AND NOT blk AND w1o IS NOT NULL AND t <= w1o + 7200
               THEN w1o END AS p1o,
          CASE WHEN c1 AND w1 IS NOT NULL AND t <= w1 + 7200 AND t > w1
               THEN w1 END AS p1i
        FROM a
      ), c AS (
        SELECT *,
          max(p1) OVER pw AS m1,
          max(p1o) OVER pw AS m1o,
          max(p1i) OVER pw AS m1i,
          max(CASE WHEN p1i IS NOT NULL THEN t END) OVER pw AS e1i
        FROM b
        WINDOW pw AS (PARTITION BY user_id ORDER BY t, c0, c1, c2
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
      ), d AS (
        SELECT *,
          CASE WHEN c2 AND m1 IS NOT NULL AND t <= m1 + 7200 THEN m1 END AS p2,
          CASE WHEN c2 AND NOT blk AND m1o IS NOT NULL AND t <= m1o + 7200
               THEN m1o END AS p2o,
          CASE WHEN c2 AND m1i IS NOT NULL AND t <= m1i + 7200 AND t > e1i
               THEN m1i END AS p2i
        FROM c
      ), dd AS (
        SELECT *, max(p2) OVER pw AS m2
        FROM d
        WINDOW pw AS (PARTITION BY user_id ORDER BY t, c0, c1, c2
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
      ), kp AS (
        SELECT user_id, min(CASE WHEN (c0 AND w1 IS NOT NULL)
            OR (c1 AND m1 IS NOT NULL) OR (c2 AND m2 IS NOT NULL)
          THEN rn END) AS kill_rn
        FROM dd GROUP BY 1
      ), lv AS (
        SELECT dd.user_id,
          CASE WHEN bool_or(p2 IS NOT NULL) THEN 3
               WHEN bool_or(p1 IS NOT NULL) THEN 2
               WHEN bool_or(c0) THEN 1 ELSE 0 END AS l_def,
          CASE WHEN bool_or(p2o IS NOT NULL) THEN 3
               WHEN bool_or(p1o IS NOT NULL) THEN 2
               WHEN bool_or(c0 AND NOT blk) THEN 1 ELSE 0 END AS l_ord,
          CASE WHEN bool_or(p2 IS NOT NULL AND rn < coalesce(kill_rn, rn + 1))
               THEN 3
               WHEN bool_or(p1 IS NOT NULL AND rn < coalesce(kill_rn, rn + 1))
               THEN 2
               WHEN bool_or(c0 AND rn < coalesce(kill_rn, rn + 1)) THEN 1
               ELSE 0 END AS l_ded,
          CASE WHEN bool_or(p2i IS NOT NULL) THEN 3
               WHEN bool_or(p1i IS NOT NULL) THEN 2
               WHEN bool_or(c0) THEN 1 ELSE 0 END AS l_inc
        FROM dd JOIN kp USING (user_id) GROUP BY dd.user_id
      )
      SELECT mode, CAST(lvl AS BIGINT) AS lvl, CAST(count(1) AS BIGINT) AS n
      FROM (
        SELECT 'default' AS mode, l_def AS lvl FROM lv
        UNION ALL SELECT 'order', l_ord FROM lv
        UNION ALL SELECT 'dedup', l_ded FROM lv
        UNION ALL SELECT 'increase', l_inc FROM lv)
      GROUP BY 1, 2 ORDER BY 1, 2"""))

  // ---------------------------------------------------------------------
  // X179: sequenceMatch `(?t OP seconds)` time constraints — the CH
  // timed-chain form, previously a loud reject. A timed pattern is a
  // pure ref chain with per-adjacent-pair constraints; the match is an
  // exists-scan over length-m runs of the sorted matched-event array
  // (consecutive matched events, the same adjacency contract as the
  // untimed form), which the oracle replays as the identical run check
  // with a DuckDB list comprehension over the same (t, bitmask) lists.
  val q269SeqMatchTimed = QueryDef(
    "q269_seq_match_timed",
    (s, dir) => {
      Graft.table(s, dir, "events").createOrReplaceTempView("events_v269")
      s.sql("""
        SELECT toInt64(sum(m_within)) AS u_within,
               toInt64(sum(m_beyond)) AS u_beyond,
               toInt64(sum(m_chain3)) AS u_chain3,
               toInt64(count(1)) AS u_total
        FROM (
          SELECT user_id,
            sequenceMatch('(?1)(?t<=7200)(?2)')(ts,
              event_type = 'view', event_type = 'click') AS m_within,
            sequenceMatch('(?1)(?t>7200)(?2)')(ts,
              event_type = 'view', event_type = 'click') AS m_beyond,
            sequenceMatch('(?1)(?t<=36000)(?2)(?t<=36000)(?3)')(
              ts, event_type = 'view', event_type = 'click',
              event_type = 'purchase') AS m_chain3
          FROM events_v269 GROUP BY user_id)""")
    },
    Some("""
      WITH e AS (
        -- a matched-event list PER CONDITION SET: the two-condition
        -- patterns are blind to purchases (events matching no given
        -- condition are invisible, so they cannot break adjacency)
        SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS t,
               (CASE WHEN event_type = 'view' THEN 1 ELSE 0 END
                + CASE WHEN event_type = 'click' THEN 2 ELSE 0 END)
                 AS b2,
               (CASE WHEN event_type = 'view' THEN 1 ELSE 0 END
                + CASE WHEN event_type = 'click' THEN 2 ELSE 0 END
                + CASE WHEN event_type = 'purchase' THEN 4 ELSE 0 END)
                 AS b3
        FROM events
      ), l2 AS (
        SELECT user_id, list({'t': t, 'b': b2} ORDER BY t, b2) AS evs
        FROM e WHERE b2 > 0 GROUP BY 1
      ), l3 AS (
        SELECT user_id, list({'t': t, 'b': b3} ORDER BY t, b3) AS evs
        FROM e WHERE b3 > 0 GROUP BY 1
      ), m2 AS (
        SELECT user_id,
          CASE WHEN len([j FOR j IN generate_series(1, len(evs) - 1)
            IF (evs[j].b & 1) <> 0 AND (evs[j+1].b & 2) <> 0
               AND evs[j+1].t - evs[j].t <= 7200]) > 0
            THEN 1 ELSE 0 END AS n_within,
          CASE WHEN len([j FOR j IN generate_series(1, len(evs) - 1)
            IF (evs[j].b & 1) <> 0 AND (evs[j+1].b & 2) <> 0
               AND evs[j+1].t - evs[j].t > 7200]) > 0
            THEN 1 ELSE 0 END AS n_beyond
        FROM l2
      ), m3 AS (
        SELECT user_id,
          CASE WHEN len(evs) >= 3 AND
            len([j FOR j IN generate_series(1, len(evs) - 2)
            IF (evs[j].b & 1) <> 0 AND (evs[j+1].b & 2) <> 0
               AND (evs[j+2].b & 4) <> 0
               AND evs[j+1].t - evs[j].t <= 36000
               AND evs[j+2].t - evs[j+1].t <= 36000]) > 0
            THEN 1 ELSE 0 END AS n_chain3
        FROM l3
      ), m AS (
        SELECT user_id, n_within, n_beyond, n_chain3
        FROM m2 FULL JOIN m3 USING (user_id))
      SELECT CAST(sum(coalesce(n_within, 0)) AS BIGINT) AS u_within,
             CAST(sum(coalesce(n_beyond, 0)) AS BIGINT) AS u_beyond,
             CAST(sum(coalesce(n_chain3, 0)) AS BIGINT) AS u_chain3,
             CAST(count(1) AS BIGINT) AS u_total
      FROM (SELECT DISTINCT user_id FROM events) u
      LEFT JOIN m USING (user_id)"""))

  // ---------------------------------------------------------------------
  // X180: CH time-series family — seriesOutliersDetectTukey (signed
  // distance past the Tukey fences, type-7 quantiles), and
  // seriesPeriodDetectFFT / seriesDecomposeSTL as documented
  // refinements with exactly specified arithmetic (mean-centered DFT
  // periodogram argmax; clipped-MA + centered per-phase-mean additive
  // decomposition). The series are CONSTRUCTED per group from the
  // group key (period p = 3 + len(event_type) % 4), so the oracle can
  // replay everything relationally: Tukey cells exactly (integer-
  // valued doubles, identical interpolation arithmetic), the FFT
  // period as the planted ground truth the engine must recover, and
  // the decomposition's aggregate surfaces at 6 dp (sum order differs
  // between the engine's index-ordered array folds and DuckDB's row
  // aggregation — ulps on O(100) values, invisible at 6 dp).
  // Reconstruction (baseline + residual == series) and the n < 2p
  // NULL contract ride as boolean cells.
  val q270Series = QueryDef(
    "q270_ch_series",
    (s, dir) => {
      Graft.table(s, dir, "events").createOrReplaceTempView("events_v270")
      s.sql("""
        WITH grp AS (
          SELECT event_type, toInt64(count(1)) AS n_ev,
                 CAST(3 + length(event_type) % 4 AS INT) AS p
          FROM events_v270 GROUP BY event_type
        ), ser AS (
          SELECT event_type, n_ev, p,
                 seriesPeriodDetectFFT(transform(sequence(0, p*12 - 1),
                   i -> CAST(i % p AS DOUBLE) * 10.0D)) AS fft_p,
                 seriesPeriodDetectFFT(transform(sequence(0, 19),
                   i -> 5.0D)) AS fft_const,
                 seriesOutliersDetectTukey(transform(sequence(0, 23),
                   i -> CAST(i % 7 AS DOUBLE)
                        + CASE WHEN i = 11 THEN 100.0D ELSE 0.0D END
                        + CASE WHEN i = 17 THEN -100.0D ELSE 0.0D END))
                   AS tk,
                 seriesOutliersDetectTukey(transform(sequence(0, 23),
                   i -> CAST(i % 7 AS DOUBLE)
                        + CASE WHEN i = 11 THEN 100.0D ELSE 0.0D END
                        + CASE WHEN i = 17 THEN -100.0D ELSE 0.0D END),
                   0.1, 0.9, 3.0) AS tk2,
                 seriesDecomposeSTL(transform(sequence(0, p*12 - 1),
                   i -> CAST(i % p AS DOUBLE) * 10.0D + CAST(i AS DOUBLE)),
                   p) AS stl
          FROM grp
        )
        SELECT event_type, n_ev, toInt64(p) AS p, fft_p, fft_const,
               toInt64(size(filter(tk, v -> v <> 0.0D))) AS tk_nz,
               round(aggregate(tk, 0.0D, (a, x) -> a + x), 6) AS tk_sum,
               round(array_max(tk), 6) AS tk_max,
               round(array_min(tk), 6) AS tk_min,
               toInt64(size(filter(tk2, v -> v <> 0.0D))) AS tk2_nz,
               round(aggregate(element_at(stl, 1), 0.0D,
                 (a, x) -> a + x * x), 6) AS seas2,
               round(aggregate(element_at(stl, 2), 0.0D,
                 (a, x) -> a + x), 6) AS trsum,
               round(array_max(transform(element_at(stl, 3),
                 r -> abs(r))), 6) AS residmax,
               CASE WHEN array_max(zip_with(
                      zip_with(element_at(stl, 4), element_at(stl, 3),
                        (b, r) -> b + r),
                      transform(sequence(0, p*12 - 1),
                        i -> CAST(i % p AS DOUBLE) * 10.0D
                             + CAST(i AS DOUBLE)),
                      (y, x) -> abs(y - x))) < 1e-9D
                    THEN 1 ELSE 0 END AS recon_ok,
               CASE WHEN seriesDecomposeSTL(transform(sequence(0, 23),
                      i -> CAST(i % 7 AS DOUBLE)), 100) IS NULL
                    THEN 1 ELSE 0 END AS null_ok
        FROM ser ORDER BY event_type""")
    },
    Some("""
      WITH grp AS (
        SELECT event_type, CAST(count(1) AS BIGINT) AS n_ev,
               CAST(3 + length(event_type) % 4 AS INT) AS p
        FROM events GROUP BY event_type
      ), tser AS (
        SELECT i, CAST(i % 7 AS DOUBLE)
               + CASE WHEN i = 11 THEN 100.0 ELSE 0.0 END
               + CASE WHEN i = 17 THEN -100.0 ELSE 0.0 END AS x
        FROM generate_series(0, 23) t(i)
      ), tsrt AS (
        SELECT list(x ORDER BY x) AS s, CAST(count(*) AS INT) AS n
        FROM tser
      ), tfen AS (
        SELECT
          s[CAST(floor((n-1)*0.25) AS INT)+1]
            + ((n-1)*0.25 - floor((n-1)*0.25))
            * (s[least(CAST(floor((n-1)*0.25) AS INT)+2, n)]
               - s[CAST(floor((n-1)*0.25) AS INT)+1]) AS q1,
          s[CAST(floor((n-1)*0.75) AS INT)+1]
            + ((n-1)*0.75 - floor((n-1)*0.75))
            * (s[least(CAST(floor((n-1)*0.75) AS INT)+2, n)]
               - s[CAST(floor((n-1)*0.75) AS INT)+1]) AS q3,
          s[CAST(floor((n-1)*0.1) AS INT)+1]
            + ((n-1)*0.1 - floor((n-1)*0.1))
            * (s[least(CAST(floor((n-1)*0.1) AS INT)+2, n)]
               - s[CAST(floor((n-1)*0.1) AS INT)+1]) AS q1b,
          s[CAST(floor((n-1)*0.9) AS INT)+1]
            + ((n-1)*0.9 - floor((n-1)*0.9))
            * (s[least(CAST(floor((n-1)*0.9) AS INT)+2, n)]
               - s[CAST(floor((n-1)*0.9) AS INT)+1]) AS q3b
        FROM tsrt
      ), tsc AS (
        SELECT CASE WHEN t.x < q1 - 1.5*(q3-q1)
                      THEN t.x - (q1 - 1.5*(q3-q1))
                    WHEN t.x > q3 + 1.5*(q3-q1)
                      THEN t.x - (q3 + 1.5*(q3-q1))
                    ELSE 0.0 END AS sc,
               CASE WHEN t.x < q1b - 3.0*(q3b-q1b)
                      THEN t.x - (q1b - 3.0*(q3b-q1b))
                    WHEN t.x > q3b + 3.0*(q3b-q1b)
                      THEN t.x - (q3b + 3.0*(q3b-q1b))
                    ELSE 0.0 END AS sc2
        FROM tser t CROSS JOIN tfen
      ), tagg AS (
        SELECT CAST(count(CASE WHEN sc <> 0.0 THEN 1 END) AS BIGINT)
                 AS tk_nz,
               round(sum(sc), 6) AS tk_sum,
               round(max(sc), 6) AS tk_max,
               round(min(sc), 6) AS tk_min,
               CAST(count(CASE WHEN sc2 <> 0.0 THEN 1 END) AS BIGINT)
                 AS tk2_nz
        FROM tsc
      ), sidx AS (
        SELECT g.event_type, g.p, i.i,
               CAST(i.i % g.p AS DOUBLE)*10.0 + CAST(i.i AS DOUBLE) AS x
        FROM grp g, generate_series(0, 59) i(i)
        WHERE i.i < 12*g.p
      ), strend AS (
        SELECT a.event_type, a.p, a.i, a.x, sum(b.x)/count(*) AS tr
        FROM sidx a JOIN sidx b ON a.event_type = b.event_type
          AND b.i BETWEEN greatest(a.i - a.p//2, 0)
                      AND least(a.i + a.p//2, 12*a.p - 1)
        GROUP BY a.event_type, a.p, a.i, a.x
      ), sphase AS (
        SELECT event_type, i % p AS ph, sum(x - tr)/count(*) AS praw
        FROM strend GROUP BY event_type, i % p
      ), smean AS (
        SELECT event_type, sum(praw)/count(*) AS sm
        FROM sphase GROUP BY event_type
      ), sagg AS (
        SELECT d.event_type,
               round(sum((ph.praw - m.sm)*(ph.praw - m.sm)), 6) AS seas2,
               round(sum(d.tr), 6) AS trsum,
               round(max(abs((d.x - d.tr) - (ph.praw - m.sm))), 6)
                 AS residmax
        FROM strend d
        JOIN sphase ph ON d.event_type = ph.event_type
                      AND d.i % d.p = ph.ph
        JOIN smean m ON d.event_type = m.event_type
        GROUP BY d.event_type
      )
      SELECT g.event_type, g.n_ev, CAST(g.p AS BIGINT) AS p,
             CAST(g.p AS DOUBLE) AS fft_p, 0.0 AS fft_const,
             t.tk_nz, t.tk_sum, t.tk_max, t.tk_min, t.tk2_nz,
             a.seas2, a.trsum, a.residmax,
             1 AS recon_ok, 1 AS null_ok
      FROM grp g CROSS JOIN tagg t
      JOIN sagg a ON g.event_type = a.event_type
      ORDER BY g.event_type"""))

  // ---------------------------------------------------------------------
  // X181: CH `PASTE JOIN` — horizontal concatenation by row position,
  // under this engine's ordered-subquery contract (block order is
  // nondeterministic in CH too; both sides must carry a top-level
  // ORDER BY that DEFINES position — the rewrite zips them with
  // row_number windows, inner-joined = min-length truncation). The
  // entry pastes the event-type count ranking against the
  // order-priority count ranking (both 5 rows — rank-aligned
  // comparison, the classic PASTE use); the oracle replays the
  // row_number zip explicitly.
  val q271PasteJoin = QueryDef(
    "q271_ch_paste_join",
    (s, dir) => {
      Graft.table(s, dir, "events").createOrReplaceTempView("events_v271")
      Graft.table(s, dir, "orders").createOrReplaceTempView("orders_v271")
      s.sql("""
        SELECT a.event_type, a.ev_n, b.o_orderpriority, b.ord_n,
               toInt64(a.ev_n - b.ord_n) AS gap
        FROM (SELECT event_type, toInt64(count(1)) AS ev_n
              FROM events_v271 GROUP BY event_type
              ORDER BY ev_n DESC, event_type) AS a
        PASTE JOIN
             (SELECT o_orderpriority, toInt64(count(1)) AS ord_n
              FROM orders_v271 GROUP BY o_orderpriority
              ORDER BY ord_n DESC, o_orderpriority) AS b
        ORDER BY a.ev_n DESC, a.event_type""")
    },
    Some("""
      SELECT a.event_type, a.ev_n, b.o_orderpriority, b.ord_n,
             CAST(a.ev_n - b.ord_n AS BIGINT) AS gap
      FROM (SELECT event_type, ev_n,
                   row_number() OVER (ORDER BY ev_n DESC, event_type)
                     AS rn
            FROM (SELECT event_type, CAST(count(1) AS BIGINT) AS ev_n
                  FROM events GROUP BY event_type)) a
      JOIN (SELECT o_orderpriority, ord_n,
                   row_number() OVER (ORDER BY ord_n DESC,
                     o_orderpriority) AS rn
            FROM (SELECT o_orderpriority,
                         CAST(count(1) AS BIGINT) AS ord_n
                  FROM orders GROUP BY o_orderpriority)) b
        USING (rn)
      ORDER BY a.ev_n DESC, a.event_type"""))

  // ---------------------------------------------------------------------
  // X182: round-11 dialect fill #4 — nonNegativeDerivative (the O(1)-
  // state window rate-of-change, clamped at 0; interval as numeric
  // seconds or INTERVAL literal), groupArrayIntersect (sorted — CH's
  // order is unspecified), sumWithOverflow (two's-complement Int64
  // wrap via a Decimal(38) sum reduced mod 2^64 — map-side
  // combinable, replayed in DuckDB's HUGEINT), tokens (maximal
  // alphanumeric-ASCII runs), the toUnixTimestamp64*/
  // fromUnixTimestamp64* family, toDaysSinceYearZero (epoch days +
  // 719528 — CH pins 1970-01-01 = 719528), toModifiedJulianDay /
  // fromModifiedJulianDay, and timeSlots (slot grid covering
  // [start, start+duration]). The nonNegativeDerivative cells replay
  // bit-identically: the engine's cast(ts AS DOUBLE) is micros/1e6,
  // DuckDB's epoch_us(ts)/1000000.0 the same division, and the
  // derivative chain is spelled in the same operation order.
  val q272DialectRound11b = QueryDef(
    "q272_ch_dialect_round11b",
    (s, dir) => {
      Graft.table(s, dir, "events").createOrReplaceTempView("events_v272")
      s.sql("""
        WITH w AS (
          SELECT event_type, event_id, user_id, ts, value, props,
                 nonNegativeDerivative(value, ts) OVER
                   (PARTITION BY event_type ORDER BY ts, event_id)
                   AS nnd,
                 nonNegativeDerivative(value, ts, INTERVAL 5 SECOND)
                   OVER (PARTITION BY event_type
                         ORDER BY ts, event_id) AS nnd5
          FROM events_v272
        )
        SELECT event_type,
               round(sum(nnd), 4) AS nnd_sum,
               round(sum(nnd5), 4) AS nnd5_sum,
               toInt64(size(groupArrayIntersect(sequence(0,
                 3 + length(event_type) % 3
                   + CAST(event_id % 3 AS INT))))) AS gai_n,
               toInt64(element_at(groupArrayIntersect(sequence(0,
                 3 + length(event_type) % 3
                   + CAST(event_id % 3 AS INT))),
                 size(groupArrayIntersect(sequence(0,
                   3 + length(event_type) % 3
                     + CAST(event_id % 3 AS INT)))))) AS gai_max,
               sumWithOverflow(user_id * 9000000000000) AS swo,
               toInt64(sum(size(tokens(props)))) AS tok_n,
               min(element_at(tokens(props), 1)) AS tok_first,
               toInt64(sum(toUnixTimestamp64Milli(ts) % 1000003))
                 AS ms_sum,
               toInt64(min(CASE WHEN fromUnixTimestamp64Micro(
                 toUnixTimestamp64Micro(ts)) = ts
                 THEN 1 ELSE 0 END)) AS rt_ok,
               toInt64(max(toDaysSinceYearZero(ts))) AS days_max,
               toInt64(max(toModifiedJulianDay(ts))) AS mjd_max,
               toInt64(min(CASE WHEN fromModifiedJulianDay(
                 toModifiedJulianDay(ts)) = CAST(ts AS DATE)
                 THEN 1 ELSE 0 END)) AS mjd_rt_ok,
               toInt64(sum(size(timeSlots(ts,
                 toInt64(round(value * 60)), 600)))) AS slots_sum,
               toInt64(count(1)) AS n
        FROM w GROUP BY event_type ORDER BY event_type""")
    },
    Some("""
      WITH w AS (
        SELECT event_type, event_id, user_id, ts, value, props,
          CASE WHEN lag(value) OVER win IS NULL THEN 0.0
               WHEN epoch_us(ts)/1000000.0
                    - epoch_us(lag(ts) OVER win)/1000000.0 <= 0 THEN 0.0
               ELSE greatest(0.0, (value - lag(value) OVER win)
                    / (epoch_us(ts)/1000000.0
                       - epoch_us(lag(ts) OVER win)/1000000.0) * 1.0)
               END AS nnd,
          CASE WHEN lag(value) OVER win IS NULL THEN 0.0
               WHEN epoch_us(ts)/1000000.0
                    - epoch_us(lag(ts) OVER win)/1000000.0 <= 0 THEN 0.0
               ELSE greatest(0.0, (value - lag(value) OVER win)
                    / (epoch_us(ts)/1000000.0
                       - epoch_us(lag(ts) OVER win)/1000000.0) * 5.0)
               END AS nnd5
        FROM events
        WINDOW win AS (PARTITION BY event_type ORDER BY ts, event_id)
      )
      SELECT event_type,
             round(sum(nnd), 4) AS nnd_sum,
             round(sum(nnd5), 4) AS nnd5_sum,
             CAST(min(3 + length(event_type) % 3 + event_id % 3) + 1
               AS BIGINT) AS gai_n,
             CAST(min(3 + length(event_type) % 3 + event_id % 3)
               AS BIGINT) AS gai_max,
             CAST((CASE WHEN ((sum(user_id * 9000000000000)
                     % 18446744073709551616) + 18446744073709551616)
                     % 18446744073709551616 >= 9223372036854775808
                   THEN ((sum(user_id * 9000000000000)
                     % 18446744073709551616) + 18446744073709551616)
                     % 18446744073709551616 - 18446744073709551616
                   ELSE ((sum(user_id * 9000000000000)
                     % 18446744073709551616) + 18446744073709551616)
                     % 18446744073709551616 END) AS BIGINT) AS swo,
             CAST(sum(len(list_filter(string_split_regex(props,
               '[^A-Za-z0-9]+'), x -> x <> ''))) AS BIGINT) AS tok_n,
             min(list_filter(string_split_regex(props,
               '[^A-Za-z0-9]+'), x -> x <> '')[1]) AS tok_first,
             CAST(sum(epoch_ms(ts) % 1000003) AS BIGINT) AS ms_sum,
             CAST(1 AS BIGINT) AS rt_ok,
             CAST(max((CAST(ts AS DATE) - DATE '1970-01-01') + 719528)
               AS BIGINT) AS days_max,
             CAST(max(CAST(ts AS DATE) - DATE '1858-11-17')
               AS BIGINT) AS mjd_max,
             CAST(1 AS BIGINT) AS mjd_rt_ok,
             CAST(sum(CAST(floor((CAST(floor(epoch(ts)) AS BIGINT) % 600
               + CAST(round(value * 60, 0) AS BIGINT)) / 600.0)
               AS BIGINT) + 1) AS BIGINT) AS slots_sum,
             CAST(count(1) AS BIGINT) AS n
      FROM w GROUP BY event_type ORDER BY event_type"""))

  // ---------------------------------------------------------------------
  // X187: CH `system.functions` — the dialect-surface inventory next
  // to system.tables/parts/columns/projections: one row per
  // ClickHouse-named function the engine registers, read from the
  // registry itself. The oracle pins a cross-family sample of names
  // (every round's fills show up here by construction) and the
  // depth of the surface as a >=-400 floor boolean — the exact count
  // moves every round and must not be hashed.
  val q277SystemFunctions = QueryDef(
    "q277_system_functions",
    (s, _) => {
      s.sql("""
        SELECT name,
               CASE WHEN (SELECT count(1) FROM system.functions) >= 400
                    THEN 1 ELSE 0 END AS deep
        FROM system.functions
        WHERE name IN ('toMonday', 'uniqExact', 'windowFunnel',
          'quantileTDigest', 'seriesPeriodDetectFFT', 'sumWithOverflow',
          'nonNegativeDerivative', 'arrayFold', 'mortonEncode',
          'uniqHLL12', 'transform', 'dictGet')
        ORDER BY name""")
    },
    Some("""
      SELECT name, 1 AS deep FROM (VALUES ('arrayFold'), ('dictGet'),
        ('mortonEncode'), ('nonNegativeDerivative'),
        ('quantileTDigest'), ('seriesPeriodDetectFFT'),
        ('sumWithOverflow'), ('toMonday'), ('transform'),
        ('uniqExact'), ('uniqHLL12'), ('windowFunnel')) t(name)
      ORDER BY name"""))

  val defs: Seq[QueryDef] =
    Seq(q224CatAssociation, q225QuantileTiming, q226AucBitmapBar,
      q251Hll, q252DialectRound10b, q256IfCombinators, q261Qualify,
      q262SystemColumns, q264DialectRound11, q266TDigest, q267CorrMatrix,
      q268FunnelModes, q269SeqMatchTimed, q270Series, q271PasteJoin,
      q272DialectRound11b, q277SystemFunctions,
      q229NetEncoding, q230ZTests, q231ExpDecay, q232SeqNextNode,
      q234FuzzyMatch, q236PlannersTypes, q239MapArraySugar,
      q243ThetaSetAlgebra, q244KeyedArraySort, q245HashSketchContracts,
      q246TiesAnyJoin, q247DialectRound10,
      q188ChRunningMaps, q190ChRunningAccumulate, q193ChBitmap,
      q197ChSystemParts, q198ChOptimizeDedup,
      q200ChIntervalAggs, q201ChMovingBits, q202ChEntropyTheta,
      q203ChDistinctOn, q204ChPointInPolygon, q205ChSummingMergeTree,
      q206ChRankTests, q207ChRegression, q208ChUrlHierarchy,
      q210ChRenderHistogram, q211ChArrayGapFill, q212ChLttb,
      q213ChProjection, q214ChPartitionOps, q215ChVectorDistances,
      q216ChScalarGapFill, q218ChSystemProjections, q219ChGeohash,
      q220ChTtlMaterialize, q221ChStarModifiers,
      q40ChDialectSql, q41ChDialectArrays, q42MetricaQ2DialectSql,
      q143ChRollupCube, q144ChMvQuantile, q145ChSetOps,
      q146ChFillInterpolate, q170ChTopKMv, q172ChSampleOffset,
      q43MetricaQ1DialectSql, q44MetricaQ1Totals, q47ChConditionalAggs,
      q53ChUniqBand, q55ChAggVocabulary, q56ChArrayJoin,
      q60ChQuantilePrewhere, q67ChLimitBySql, q68ChWithFillSql,
      q74ChUrlFuncs, q78WindowFunnel, q79ChSampleSql, q82ChJsonFuncs,
      q83ChDateVocab, q84ChSumMap, q85ChSequence, q86ChRounding,
      q87ChIpBits, q88ChStrings, q89ChStats, q90ChArrayJoinSql,
      q91ChFinalSql, q92ChDictFuncs, q94ChWindowSql, q98ChDdlWorkflow,
      q99ChArrayReduce, q100ChMvWorkflow, q101ChAsofSql,
      q119ChDateDiff, q120ChArrayVocab2, q121ChAgeIso, q122ChScalarWith,
      q127ChUrlDecode, q129ChWeightedAggs, q130ChAnyJoin, q132ChNumbers,
      q133ChLimitTies, q135ChNgramSearch, q137ChDateGeoVocab,
      q139ChSystemTables)
}
