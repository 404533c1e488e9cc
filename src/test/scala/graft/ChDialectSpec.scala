package graft

/** The ClickHouse-named SQL functions registered by the graft
  * extensions: hand-checked values through `spark.sql`, including the
  * CH default-on-miss and NULL conventions that differ from Spark's
  * builtins.
  */
class ChDialectSpec extends SparkSpec {
  import org.apache.spark.sql.functions.col
  import spark.implicits._

  test("toMonday / toInt64 / isFinite / notEmpty scalar semantics") {
    val r = spark.sql("""
      SELECT toMonday(DATE '2024-01-10') AS m,
             toInt64('42') AS i,
             isFinite(1.0) AS f1,
             isFinite(cast('NaN' as double)) AS f2,
             notEmpty('x') AS ne1,
             notEmpty('') AS ne2,
             notEmpty(cast(null as string)) AS ne3
    """).collect().head
    assert(r.getDate(0).toString == "2024-01-08") // Wednesday -> Monday
    assert(r.getLong(1) == 42L)
    assert(r.getBoolean(2))
    assert(!r.getBoolean(3))
    assert(r.getLong(4) == 1L && r.getLong(5) == 0L && r.getLong(6) == 0L)
  }

  test("indexOf: 1-based, 0 for absent AND for null (CH convention)") {
    val r = spark.sql("""
      SELECT indexOf(array('a','b'), 'b') AS hit,
             indexOf(array('a','b'), 'z') AS miss,
             indexOf(array('a','b'), cast(null as string)) AS nul
    """).collect().head
    assert(r.getLong(0) == 2L && r.getLong(1) == 0L && r.getLong(2) == 0L)
  }

  test("arrayElement: element-type default on i=0/out-of-range, never null") {
    val r = spark.sql("""
      SELECT arrayElement(array(10, 20), 2) AS hit,
             arrayElement(array(10, 20), 0) AS zero,
             arrayElement(array(10, 20), 9) AS oob,
             arrayElement(array('x'), 0) AS szero
    """).collect().head
    assert(r.getInt(0) == 20 && r.getInt(1) == 0 && r.getInt(2) == 0)
    assert(r.getString(3) == "")
  }

  test("WITH TOTALS: groups + grand total; valid SQL untouched; multi-key rejected") {
    spark.range(0, 10).select((col("id") % 2).as("k"), col("id").as("v"))
      .createOrReplaceTempView("totals_t")
    val got = spark.sql(
      "SELECT k, sum(v) AS s FROM totals_t GROUP BY k WITH TOTALS")
      .orderBy(col("k").asc_nulls_last)
      .as[(java.lang.Long, Long)].collect().toSeq
    assert(got == Seq((0L: java.lang.Long, 20L), (1L: java.lang.Long, 25L),
      (null: java.lang.Long, 45L)))
    // a string literal containing the phrase parses as plain Spark SQL
    assert(spark.sql("SELECT 'GROUP BY x WITH TOTALS' AS s")
      .as[String].head() == "GROUP BY x WITH TOTALS")
    // multi-key TOTALS: CH's lattice is groups + ONE grand total —
    // GROUPING SETS ((k, v), ()), never ROLLUP's subtotal levels
    val mk = spark.sql(
      "SELECT k, v, sum(v) AS s FROM totals_t GROUP BY k, v WITH TOTALS")
      .collect()
    assert(mk.length == 11) // 10 (k, v) groups + 1 grand total
    val totalRow = mk.filter(r => r.isNullAt(0) && r.isNullAt(1))
    assert(totalRow.length == 1 && totalRow.head.getLong(2) == 45L)
    // the clause in BOTH a subquery and the outer query: every
    // occurrence rewrites (each binding to its own keys)
    val nested = spark.sql("""
      SELECT k2, sum(s) AS s2 FROM (
        SELECT k AS k2, sum(v) AS s FROM totals_t GROUP BY k WITH TOTALS
      ) GROUP BY k2 WITH TOTALS
      ORDER BY k2 ASC NULLS LAST, s2""")
      .as[(java.lang.Long, Long)].collect().toSeq
    // inner: (0,20),(1,25),(null,45); outer groups those three rows
    // (the inner totals row becomes the null group) + grand total 90
    assert(nested == Seq((0L: java.lang.Long, 20L), (1L: java.lang.Long, 25L),
      (null: java.lang.Long, 45L), (null: java.lang.Long, 90L)))
    // a TOTALS-less GROUP BY in a sibling subquery must not steal a
    // later clause's TOTALS (nearest-GROUP-BY pairing)
    val sibling = spark.sql("""
      SELECT a.k, a.s, b.t FROM
        (SELECT k, sum(v) AS s FROM totals_t GROUP BY k) a
        JOIN (SELECT k, sum(v) AS t FROM totals_t GROUP BY k WITH TOTALS) b
          ON a.k = b.k
      ORDER BY a.k""").collect()
    assert(sibling.length == 2) // totals row has null k, drops in join
  }

  test("LIMIT offset,n (CH/MySQL form) = LIMIT n OFFSET offset") {
    val got = spark.sql(
      "SELECT id FROM range(10) ORDER BY id LIMIT 3, 4")
      .as[Long].collect().toSeq
    assert(got == Seq(3L, 4L, 5L, 6L))
  }

  test("clause rewrites never touch string literals, even when a rewrite fires") {
    // the literal contains both clause shapes; the query itself needs
    // both rewrites — the literal must come through verbatim
    val r = spark.sql("""
      SELECT 'LIMIT 1,2 GROUP BY x WITH TOTALS' AS note, id
      FROM range(10) ORDER BY id LIMIT 3, 4""").collect()
    assert(r.head.getString(0) == "LIMIT 1,2 GROUP BY x WITH TOTALS")
    assert(r.map(_.getLong(1)).toSeq == Seq(3L, 4L, 5L, 6L))
    // a comma inside a literal is not a multi-key TOTALS
    spark.range(0, 4).selectExpr("id % 2 AS k", "id AS v")
      .createOrReplaceTempView("totals_lit_t")
    val tot = spark.sql("""
      SELECT concat(cast(k AS STRING), 'a,b') AS g, sum(v) AS s
      FROM totals_lit_t GROUP BY concat(cast(k AS STRING), 'a,b') WITH TOTALS""")
    assert(tot.count() == 3) // 2 groups + totals row
  }

  test("conditional aggregates, array predicates, date helpers") {
    spark.range(0, 10).selectExpr("id % 2 AS k", "CAST(id AS DOUBLE) AS v")
      .createOrReplaceTempView("cif_t")
    val r = spark.sql("""
      SELECT countIf(k = 0) AS c0,
             sumIf(v, k = 0) AS s0,
             avgIf(v, k = 1) AS a1
      FROM cif_t""").collect().head
    assert(r.getLong(0) == 5L)     // ids 0,2,4,6,8
    assert(r.getDouble(1) == 20.0) // 0+2+4+6+8
    assert(r.getDouble(2) == 5.0)  // (1+3+5+7+9)/5
    val r2 = spark.sql("""
      SELECT has(array(1, 2, 3), 2) AS h1,
             has(array(1, 2, 3), 9) AS h0,
             arrayFilter(x -> x > 1, array(1, 2, 3)) AS f,
             arrayExists(x -> x = 3, array(1, 2, 3)) AS e,
             toStartOfMonth(DATE '2024-03-17') AS som,
             toYYYYMM(DATE '2024-03-17') AS ym,
             toDate('2024-03-17') AS d
    """).collect().head
    assert(r2.getLong(0) == 1L && r2.getLong(1) == 0L)
    assert(r2.getSeq[Int](2) == Seq(2, 3))
    assert(r2.getBoolean(3))
    assert(r2.getDate(4).toString == "2024-03-01")
    assert(r2.getLong(5) == 202403L)
    assert(r2.getDate(6).toString == "2024-03-17")
    // CH conventions on empty/no-match sets and NULL needles: counts
    // and sums are 0 (never NULL), avg of nothing is nan; NULL is a
    // MATCHABLE array value — has([1,NULL],NULL)=1, indexOf gives its
    // position — and a NULL needle over a null-free array gives 0
    val r3 = spark.sql("""
      SELECT countIf(k = 9) AS c, sumIf(v, k = 9) AS s, avgIf(v, k = 9) AS a,
             has(array(1, 2), CAST(NULL AS INT)) AS h,
             has(array(1, NULL, 2), CAST(NULL AS INT)) AS hn,
             indexOf(array(1, NULL, 2), CAST(NULL AS INT)) AS ixn,
             indexOf(array(1, 2), CAST(NULL AS INT)) AS ix0
      FROM cif_t""").collect().head
    assert(r3.getLong(0) == 0L)
    assert(r3.getDouble(1) == 0.0)
    assert(r3.getDouble(2).isNaN)
    assert(r3.getLong(3) == 0L)
    assert(r3.getLong(4) == 1L)
    assert(r3.getLong(5) == 2L)
    assert(r3.getLong(6) == 0L)
  }

  test("aggregate/date/array vocabulary: argMax, median, groupArray, arrayJoin") {
    spark.range(0, 10).selectExpr("id % 2 AS k", "id AS v",
      "CAST(id AS DOUBLE) AS d").createOrReplaceTempView("vocab_t")
    val r = spark.sql("""
      SELECT argMax(v, d) AS amax, argMin(v, d) AS amin,
             round(median(d), 2) AS med,
             array_join(arraySort(groupUniqArray(CAST(k AS STRING))), ',') AS ks,
             toYYYYMMDD(DATE '2024-03-17') AS ymd,
             toDayOfWeek(DATE '2024-03-17') AS dow,
             toDayOfWeek(DATE '2024-03-18') AS dowMon,
             toHour(TIMESTAMP '2024-03-17 13:45:00') AS h
      FROM vocab_t""").collect().head
    assert(r.getLong(0) == 9L && r.getLong(1) == 0L)
    assert(r.getDouble(2) == 4.5)
    assert(r.getString(3) == "0,1")
    assert(r.getLong(4) == 20240317L)
    assert(r.getLong(5) == 7L) // 2024-03-17 is a Sunday: CH dow = 7
    assert(r.getLong(6) == 1L) // Monday = 1
    assert(r.getLong(7) == 13L)
    val arr = spark.sql("""
      SELECT arrayCount(x -> x > 2, array(1, 2, 3, 4)) AS c2,
             arrayCount(array(0, 1, 2, 0)) AS cnz,
             arrayDistinct(array(1, 2, 1)) AS dist,
             arrayReverse(array(1, 2, 3)) AS rev,
             empty(array()) AS ea, empty(array(1)) AS ena,
             empty('') AS es, empty('x') AS ens,
             splitByChar(',', 'a,b,,c') AS sp
    """).collect().head
    assert(arr.getLong(0) == 2L && arr.getLong(1) == 2L)
    assert(arr.getSeq[Int](2) == Seq(1, 2))
    assert(arr.getSeq[Int](3) == Seq(3, 2, 1))
    assert(arr.getLong(4) == 1L && arr.getLong(5) == 0L)
    assert(arr.getLong(6) == 1L && arr.getLong(7) == 0L)
    assert(arr.getSeq[String](8) == Seq("a", "b", "", "c"))
    // arrayJoin expands rows and drops empty arrays, like CH
    val aj = spark.sql("""
      SELECT arrayJoin(a) AS x FROM VALUES (array(1, 2)), (array()) t(a)
    """).as[Int].collect().toSeq.sorted
    assert(aj == Seq(1, 2))
  }

  test("parameterized quantiles, PREWHERE, SETTINGS clause all rewrite") {
    spark.range(0, 11).selectExpr("id % 2 AS k", "CAST(id AS DOUBLE) AS v")
      .createOrReplaceTempView("chx_t")
    val r = spark.sql("""
      SELECT quantileExact(0.5)(v) AS med, quantile(0.25)(v + 0) AS q1
      FROM chx_t PREWHERE k = 0 SETTINGS max_threads=4""").collect().head
    // k = 0 keeps v in {0,2,4,6,8,10}
    assert(r.getDouble(0) == 5.0)
    assert(r.getDouble(1) == 2.5)
    // PREWHERE merges with an existing WHERE (CH applies both)
    val r2 = spark.sql("""
      SELECT count(1) AS n FROM chx_t
      PREWHERE k = 0 WHERE v >= 4 SETTINGS a=1, b=2.5""").collect().head
    assert(r2.getLong(0) == 4L) // {4, 6, 8, 10}
    // a literal containing the phrases is untouched when a rewrite fires
    val r3 = spark.sql("""
      SELECT 'PREWHERE x SETTINGS a=1' AS s, quantile(0.5)(v) AS m
      FROM chx_t""").collect().head
    assert(r3.getString(0) == "PREWHERE x SETTINGS a=1")
    assert(r3.getDouble(1) == 5.0)
    // a PREWHERE must NOT merge with a WHERE from a sibling subquery
    val r4 = spark.sql("""
      SELECT a.n + b.m AS s FROM
        (SELECT count(1) AS n FROM chx_t PREWHERE k = 0) a
        CROSS JOIN (SELECT count(1) AS m FROM chx_t WHERE v >= 9) b
      SETTINGS x=1""").collect().head
    assert(r4.getLong(0) == 6L + 2L) // 6 evens + {9, 10}
    // string-valued settings strip too
    val r5 = spark.sql("""
      SELECT quantile(0.5)(v) AS m FROM chx_t
      SETTINGS join_algorithm='hash', max_threads=2""").collect().head
    assert(r5.getDouble(0) == 5.0)
  }

  test("quantiles(l1, l2, ...)(x) plural form returns the level array") {
    val r = spark.sql("""
      SELECT quantiles(0.0, 0.5, 1.0)(x) AS q,
             quantilesExact(0.25, 0.75)(x) AS qe
      FROM (SELECT explode(sequence(0, 10)) AS x)""")
      .as[(Seq[Double], Seq[Double])].head()
    assert(r._1 == Seq(0.0, 5.0, 10.0))
    assert(r._2 == Seq(2.5, 7.5))
  }

  test("LIMIT offset, n BY key: per-group offset+take under the ORDER BY") {
    Seq((1, 10), (1, 20), (1, 30), (1, 40), (2, 5), (2, 6))
      .toDF("k", "v").createOrReplaceTempView("lb_v")
    // skip 1, take 2 per k, under ORDER BY k, v
    val got = spark.sql(
      "SELECT k, v FROM lb_v ORDER BY k, v LIMIT 1, 2 BY k")
      .as[(Int, Int)].collect().toSeq
    assert(got == Seq((1, 20), (1, 30), (2, 6)))
    // trailing global LIMIT applies AFTER the per-group limit
    val capped = spark.sql(
      "SELECT k, v FROM lb_v ORDER BY k, v LIMIT 2 BY k LIMIT 3")
      .as[(Int, Int)].collect().toSeq
    assert(capped == Seq((1, 10), (1, 20), (2, 5)))
  }

  test("WITH FILL on a numeric axis with STEP; TO exclusive; CH defaults") {
    Seq((0L, "a"), (4L, "b"), (9L, "c")).toDF("x", "s")
      .createOrReplaceTempView("wf_v")
    val got = spark.sql(
      "SELECT x, s FROM wf_v ORDER BY x WITH FILL FROM 0 TO 8 STEP 2")
      .as[(Long, String)].collect().toSeq
    // grid 0,2,4,6 (8 exclusive); present 0,4; filled rows carry the
    // CH type default '' for the string column; off-grid 9 passes through
    assert(got == Seq((0L, "a"), (2L, ""), (4L, "b"), (6L, ""), (9L, "c")))
    // inverted range fills nothing but keeps every data row
    val inv = spark.sql(
      "SELECT x, s FROM wf_v ORDER BY x WITH FILL FROM 8 TO 0 STEP 2")
      .as[(Long, String)].collect().toSeq
    assert(inv == Seq((0L, "a"), (4L, "b"), (9L, "c")))
  }

  test("WITH FILL INTERPOLATE carries the last data value; leading " +
      "fill rows default; AS-expr form rejects") {
    Seq((1L, 10L, "a"), (4L, 40L, "b"), (7L, 70L, "c"))
      .toDF("x", "v", "s").createOrReplaceTempView("wfi_v")
    val got = spark.sql("""
      SELECT x, v, s FROM wfi_v
      ORDER BY x WITH FILL FROM 0 TO 9 INTERPOLATE (v)""")
      .as[(Long, Long, String)].collect().toSeq
    // x=0 precedes all data -> v takes the long default 0; gaps carry
    // the latest earlier value; the non-interpolated string column
    // still takes its type default ''
    assert(got == Seq(
      (0L, 0L, ""), (1L, 10L, "a"), (2L, 10L, ""), (3L, 10L, ""),
      (4L, 40L, "b"), (5L, 40L, ""), (6L, 40L, ""), (7L, 70L, "c"),
      (8L, 70L, "")))
    // CH's `col AS expr` recomputes from the previous ROW — a
    // sequential recursion this engine refuses rather than guesses
    val e = intercept[Exception] {
      spark.sql("""
        SELECT x, v, s FROM wfi_v
        ORDER BY x WITH FILL FROM 0 TO 9 INTERPOLATE (v AS v + 1)""")
        .collect()
    }
    assert(e.getMessage.contains("carry-forward"))
    // an unknown interpolate column fails loudly
    val e2 = intercept[Exception] {
      spark.sql("""
        SELECT x, v, s FROM wfi_v
        ORDER BY x WITH FILL FROM 0 TO 9 INTERPOLATE (nope)""").collect()
    }
    assert(e2.getMessage.contains("not an output column"))
  }

  test("type conversions widen per the documented mapping; intDiv truncates") {
    val r = spark.sql("""
      SELECT toString(42) AS s, toFloat64('2.5') AS f, toFloat32(1) AS f32,
             toUInt8(3) AS u8, toUInt16(5) AS u16, toUInt32(7) AS u32,
             toUInt64(9) AS u64, toInt8(1) AS i8, toInt16(2) AS i16,
             toInt32('9') AS i32,
             intDiv(7, 2) AS d1, intDiv(-7, 2) AS d2,
             assumeNotNull(5) AS an
    """).collect().head
    assert(r.getString(0) == "42")
    assert(r.getDouble(1) == 2.5)
    assert(r.getFloat(2) == 1.0f)
    assert(r.getShort(3) == 3) // UInt8 -> short
    assert(r.getInt(4) == 5) // UInt16 -> int
    assert(r.getLong(5) == 7L) // UInt32 -> long
    assert(r.getLong(6) == 9L) // UInt64 -> long reinterpret
    assert(r.getByte(7) == 1 && r.getShort(8) == 2 && r.getInt(9) == 9)
    assert(r.getLong(10) == 3L && r.getLong(11) == -3L) // toward zero
    assert(r.getInt(12) == 5)
  }

  test("uniqExact exact; uniq approximate within HLL tolerance; sumArray") {
    Seq((1, Seq(1L, 2L)), (1, Seq(3L)), (2, Seq(10L)))
      .toDF("k", "arr").createOrReplaceTempView("dialect_t")
    val r = spark.sql("""
      SELECT uniqExact(k) AS ue, sumArray(arr) AS sa FROM dialect_t
    """).collect().head
    assert(r.getLong(0) == 2L)
    assert(r.getLong(1) == 16L)
    // uniq = HLL++: exact-ish at tiny cardinality, within 5% at 10k
    val n = spark.sql(
      "SELECT uniq(id) AS u FROM range(10000)").as[Long].head()
    assert(math.abs(n - 10000L) <= 500L)
  }

  test("sumMap merges parallel-array pairs, within and across rows") {
    val r = spark.sql("""
      SELECT sumMap(k, v) AS sm FROM VALUES
        (array('b', 'a'), array(1, 2)),
        (array('a', 'a'), array(10, 100)),
        (array('c'), array(7))
      AS t(k, v)
    """).collect().head.getStruct(0)
    assert(r.getSeq[String](0) == Seq("a", "b", "c"))
    assert(r.getSeq[Long](1) == Seq(112L, 1L, 7L))
  }

  test("sequenceMatch: filtered adjacency, gaps, and blocking events") {
    // CH docs shape: events 1, 3, 2 — the 3 is invisible when it
    // matches no condition, so (?1)(?2) holds; making it condition 3
    // breaks the adjacency
    val r = spark.sql("""
      SELECT sequenceMatch('(?1)(?2)')(t, n = 1, n = 2) AS adj2,
             sequenceMatch('(?1)(?2)')(t, n = 1, n = 2, n = 3) AS adj3,
             sequenceMatch('(?1).*(?2)')(t, n = 1, n = 2, n = 3) AS gap3
      FROM VALUES (TIMESTAMP '2024-01-01 00:00:01', 1),
                  (TIMESTAMP '2024-01-01 00:00:02', 3),
                  (TIMESTAMP '2024-01-01 00:00:03', 2) AS t(t, n)
    """).collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == ((1L, 0L, 1L)))
  }

  test("sequenceCount counts non-overlapping minimal chains") {
    val r = spark.sql("""
      SELECT sequenceCount('(?1)(?2)')(t, n = 1, n = 2) AS c
      FROM VALUES (TIMESTAMP '2024-01-01 00:00:01', 1),
                  (TIMESTAMP '2024-01-01 00:00:02', 2),
                  (TIMESTAMP '2024-01-01 00:00:03', 1),
                  (TIMESTAMP '2024-01-01 00:00:04', 2) AS t(t, n)
    """).collect().head
    assert(r.getLong(0) == 2L)
  }

  test("sequenceMatch (?t...) time constraints: hand cases (round 11)") {
    // view at t=0, click at t=100: within 3600, not beyond
    val r = spark.sql("""
      SELECT sequenceMatch('(?1)(?t<=3600)(?2)')(t, n = 1, n = 2) AS a,
             sequenceMatch('(?1)(?t>3600)(?2)')(t, n = 1, n = 2) AS b,
             sequenceMatch('(?1)(?t<100)(?2)')(t, n = 1, n = 2) AS c,
             sequenceMatch('(?1)(?t==100)(?2)')(t, n = 1, n = 2) AS d
      FROM VALUES (TIMESTAMP '2024-01-01 00:00:00', 1),
                  (TIMESTAMP '2024-01-01 00:01:40', 2) AS t(t, n)
    """).collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ==
      ((1L, 0L, 0L, 1L)))
    // the timed pair pins CONSECUTIVE matched events: an intervening
    // matched event breaks it (same contract as untimed adjacency)
    val s = spark.sql("""
      SELECT sequenceMatch('(?1)(?t<=3600)(?2)')(t, n = 1, n = 2) AS a
      FROM VALUES (TIMESTAMP '2024-01-01 00:00:00', 1),
                  (TIMESTAMP '2024-01-01 00:00:30', 1),
                  (TIMESTAMP '2024-01-01 00:01:40', 2) AS t(t, n)
    """).collect().head
    assert(s.getLong(0) == 1L) // the SECOND view chains (consecutive)
    // three-ref chain with two constraints
    val u = spark.sql("""
      SELECT sequenceMatch('(?1)(?t<=60)(?2)(?t>30)(?3)')(
               t, n = 1, n = 2, n = 3) AS a
      FROM VALUES (TIMESTAMP '2024-01-01 00:00:00', 1),
                  (TIMESTAMP '2024-01-01 00:00:50', 2),
                  (TIMESTAMP '2024-01-01 00:01:40', 3) AS t(t, n)
    """).collect().head
    assert(u.getLong(0) == 1L)
    // gaps still do not compose with constraints — loud reject
    val e = intercept[Exception] {
      spark.sql("""
        SELECT sequenceMatch('(?1).*(?t<=3600)(?2)')(t, n = 1, n = 2)
        FROM VALUES (TIMESTAMP '2024-01-01 00:00:01', 1) AS t(t, n)
      """).collect()
    }
    assert(e.getMessage.contains("do not compose"))
    // and sequenceCount keeps its loud reject for timed patterns
    val e2 = intercept[Exception] {
      spark.sql("""
        SELECT sequenceCount('(?1)(?t<=3600)(?2)')(t, n = 1, n = 2)
        FROM VALUES (TIMESTAMP '2024-01-01 00:00:01', 1) AS t(t, n)
      """).collect()
    }
    assert(e2.getMessage.contains("windowFunnel"))
  }

  test("uniqUpTo caps the exact distinct count at N+1") {
    val r = spark.sql("""
      SELECT uniqUpTo(3)(v) AS capped, uniqUpTo(10)(v) AS exact
      FROM VALUES (1), (2), (3), (4), (5) AS t(v)
    """).collect().head
    assert((r.getLong(0), r.getLong(1)) == ((4L, 5L)))
  }

  test("topK returns the k most frequent values, ties by value") {
    val r = spark.sql("""
      SELECT topK(2)(v) AS top2
      FROM VALUES ('a'), ('a'), ('a'), ('b'), ('b'), ('c') AS t(v)
    """).collect().head
    assert(r.getSeq[String](0) == Seq("a", "b"))
  }

  test("Metrica rounding: roundToExp2 / roundDuration / roundAge / roundDown") {
    val r = spark.sql("""
      SELECT roundToExp2(0) AS z, roundToExp2(1) AS one,
             roundToExp2(511) AS below, roundToExp2(512) AS exact,
             roundToExp2(1023) AS big, roundToExp2(1024) AS pow10,
             roundDuration(0) AS d0, roundDuration(59) AS d59,
             roundDuration(60) AS d60, roundDuration(99999) AS dmax,
             roundAge(0) AS a0, roundAge(17) AS a17, roundAge(25) AS a25,
             roundAge(90) AS a90,
             roundDown(3.0D, array(0.0D, 5.0D, 20.0D)) AS rd_lo,
             roundDown(7.5D, array(0.0D, 5.0D, 20.0D)) AS rd_mid,
             roundDown(-2.0D, array(1.0D, 5.0D)) AS rd_below
    """).collect().head
    assert(r.getLong(0) == 0L && r.getLong(1) == 1L)
    assert(r.getLong(2) == 256L && r.getLong(3) == 512L)
    assert(r.getLong(4) == 512L && r.getLong(5) == 1024L)
    assert(r.getLong(6) == 0L && r.getLong(7) == 30L)
    assert(r.getLong(8) == 60L && r.getLong(9) == 36000L)
    assert(r.getLong(10) == 0L && r.getLong(11) == 17L)
    assert(r.getLong(12) == 25L && r.getLong(13) == 55L)
    assert(r.getDouble(14) == 0.0 && r.getDouble(15) == 5.0)
    assert(r.getDouble(16) == 1.0)
  }

  test("transformLookup maps values through parallel arrays with default") {
    import spark.implicits._
    val df = Seq(1, 2, 3, 99).toDF("src")
    val out = df.select(graft.functions.ch.transformLookup($"src",
      Seq(1, 2, 3), Seq("organic", "direct", "ad"),
      org.apache.spark.sql.functions.lit("other")).as("name"))
      .collect().map(_.getString(0)).toSeq
    assert(out == Seq("organic", "direct", "ad", "other"))
  }

  test("IPv4 dotted-quad rendering, parsing, and malformed fallbacks") {
    val r = spark.sql("""
      SELECT IPv4NumToString(3232235777) AS home,
             IPv4NumToString(0) AS zero,
             IPv4NumToString(4294967295) AS bcast,
             IPv4StringToNum('192.168.1.1') AS parsed,
             IPv4StringToNum('256.1.1.1') AS octet_over,
             IPv4StringToNum('not an ip') AS junk,
             toIPv4('10.0.0.1') AS ten
    """).collect().head
    assert(r.getString(0) == "192.168.1.1")
    assert(r.getString(1) == "0.0.0.0")
    assert(r.getString(2) == "255.255.255.255")
    assert(r.getLong(3) == 3232235777L)
    assert(r.getLong(4) == 0L && r.getLong(5) == 0L)
    assert(r.getLong(6) == 167772161L)
  }

  test("bit vocabulary and digests match their CH shapes") {
    val r = spark.sql("""
      SELECT bitAnd(12, 10) AS a, bitOr(12, 10) AS o, bitXor(12, 10) AS x,
             bitShiftLeft(1, 10) AS sl, bitShiftRight(1024, 3) AS sr,
             bitTest(5, 0) AS t0, bitTest(5, 1) AS t1,
             hex(MD5('abc')) AS md5h,
             base64Decode(base64Encode('graft')) AS rt
    """).collect().head
    assert(r.getInt(0) == 8 && r.getInt(1) == 14 && r.getInt(2) == 6)
    assert(r.getInt(3) == 1024 && r.getInt(4) == 128)
    assert(r.getLong(5) == 1L && r.getLong(6) == 0L)
    // RFC 1321 test vector
    assert(r.getString(7) == "900150983CD24FB0D6963F7D28E17F72")
    assert(r.getString(8) == "graft")
  }

  test("string vocabulary: positions, extract, replaces, pads, searches") {
    val r = spark.sql("""
      SELECT position('clickhouse', 'house') AS p1,
             position('clickhouse', 'zzz') AS p0,
             positionCaseInsensitive('ClickHouse', 'house') AS pci,
             lengthUTF8('граф') AS l8,
             substringUTF8('clickhouse', 6, 5) AS sub,
             substringUTF8('clickhouse', 6) AS sub2,
             extract('a=17;b=2', '=([0-9]+)') AS exg,
             extract('abc123', '[0-9]+') AS exw,
             extract(YEAR FROM DATE '2024-03-07') AS exy,
             extractAll('a=1;b=22', '=([0-9]+)') AS exa,
             match('abc123', '^[a-z]+[0-9]+$') AS m1,
             replaceOne('aXbXc', 'X', '_') AS ro,
             replaceAll('aXbXc', 'X', '_') AS ra,
             replaceRegexpAll('2024-03-07', '([0-9]+)-([0-9]+)-([0-9]+)',
                              '\\3/\\2/\\1') AS rra,
             trimBoth('  x  ') AS tb, trimLeft('  x  ') AS tl,
             trimRight('  x  ') AS tr2,
             leftPad('7', 3, '0') AS lp, rightPad('7', 3, '0') AS rp,
             countSubstrings('abcabcab', 'ab') AS cs,
             multiSearchAny('clickhouse', array('zz', 'web', 'hou')) AS msa,
             multiSearchAny('clickhouse', array('zz', 'web')) AS msn
    """).collect().head
    assert(r.getLong(0) == 6L && r.getLong(1) == 0L && r.getLong(2) == 6L)
    assert(r.getLong(3) == 4L)
    assert(r.getString(4) == "house" && r.getString(5) == "house")
    assert(r.getString(6) == "17" && r.getString(7) == "123")
    assert(r.getInt(8) == 2024)
    assert(r.getSeq[String](9) == Seq("1", "22"))
    assert(r.getLong(10) == 1L)
    assert(r.getString(11) == "a_bXc" && r.getString(12) == "a_b_c")
    assert(r.getString(13) == "07/03/2024")
    assert(r.getString(14) == "x" && r.getString(15) == "x  " &&
      r.getString(16) == "  x")
    assert(r.getString(17) == "007" && r.getString(18) == "700")
    assert(r.getLong(19) == 3L)
    assert(r.getLong(20) == 1L && r.getLong(21) == 0L)
  }

  test("statistical aggregates: moments, weighted avg, any family") {
    val r = spark.sql("""
      SELECT round(stddevPop(v), 6) AS sdp, round(varSamp(v), 6) AS vs,
             round(covarPop(v, w), 6) AS cvp,
             round(avgWeighted(v, w), 6) AS aw,
             round(skewPop(v), 6) AS sk, round(kurtPop(v), 6) AS kt,
             any(v) AS a, anyLast(v) AS al, anyHeavy(h) AS ah
      FROM VALUES (1.0D, 1, 'x'), (2.0D, 2, 'y'), (3.0D, 3, 'y'),
                  (4.0D, 4, 'y') AS t(v, w, h)
    """).collect().head
    // v = 1..4: varPop = 1.25, sdPop = 1.1180.., varSamp = 5/3
    assert(r.getDouble(0) == 1.118034 && r.getDouble(1) == 1.666667)
    assert(r.getDouble(2) == 1.25)
    // avgWeighted = (1+4+9+16)/10 = 3.0
    assert(r.getDouble(3) == 3.0)
    // symmetric uniform: skew 0; kurtPop of discrete uniform(4) = 1.64
    assert(r.getDouble(4) == 0.0 && r.getDouble(5) == 1.64)
    assert(r.getDouble(6) == 1.0 && r.getDouble(7) == 4.0)
    assert(r.getString(8) == "y")
  }

  test("avgWeighted of a zero-weight group is NaN, CH's contract") {
    val r = spark.sql("""
      SELECT avgWeighted(v, w) AS aw
      FROM VALUES (1.0D, 0), (2.0D, 0) AS t(v, w)
    """).collect().head
    assert(r.getDouble(0).isNaN)
  }

  test("quantileTDigest parameterized forms run the NATIVE t-digest") {
    // round 11: the round-9 percentile collapse is replaced by
    // NativeStats.TDigestAgg. At tiny n every point is its own
    // centroid and the estimate is the standard centroid-midpoint
    // interpolation: median of 1..5 hits centroid 3 exactly; q25/q75
    // interpolate BETWEEN points (1.75 / 4.25), unlike exact
    // percentile's 2.0 / 4.0 — the sketch semantic, as in CH.
    val r = spark.sql("""
      SELECT quantileTDigest(0.5)(v) AS med,
             quantilesTDigest(0.25, 0.75)(v) AS qs
      FROM VALUES (1), (2), (3), (4), (5) AS t(v)
    """).collect().head
    assert(r.getDouble(0) == 3.0)
    assert(r.getSeq[Double](1) == Seq(1.75, 4.25))
  }

  test("quantileTiming: CH fixed-bin sketch — exact below 1024, 16 ms " +
      "bins to 30000, clamp above, weighted + plural forms") {
    // small values: exact (1 ms bins); rank = floor(level*(n-1)),
    // first bin with cumulative > rank
    val r = spark.sql("""
      SELECT quantileTiming(0.5)(v) AS med,
             quantilesTiming(0.0, 1.0)(v) AS minmax
      FROM VALUES (1), (2), (3), (4), (5) AS t(v)
    """).collect().head
    assert(r.getDouble(0) == 3.0)
    assert(r.getSeq[Double](1) == Seq(1.0, 5.0))
    // mid range: 1030 and 1039 share the [1024, 1040) bin, rep = its
    // LOWER bound 1024; 2007 → 1024 + floor((2007-1024)/16)*16 = 2000
    val m = spark.sql("""
      SELECT quantileTiming(0.0)(v) AS lo,
             quantileTiming(1.0)(v) AS hi,
             quantileTiming(0.5)(w) AS clamp
      FROM VALUES (1030, 50000), (1039, 31000), (2007, 99999) AS t(v, w)
    """).collect().head
    assert(m.getDouble(0) == 1024.0)
    assert(m.getDouble(1) == 2000.0)
    assert(m.getDouble(2) == 30000.0)
    // weighted: weights are repetition counts — (5 w=1, 7 w=3) has
    // n=4, median rank floor(0.5*3)=1 → cumulative 5:1, 7:4 > 1 → 7
    val w = spark.sql("""
      SELECT quantileTimingWeighted(0.5)(v, c) AS med
      FROM VALUES (5, 1), (7, 3) AS t(v, c)
    """).collect().head
    assert(w.getDouble(0) == 7.0)
    // partition-invariance: fixed-bin counts merge exactly
    spark.range(0, 5000).selectExpr("CAST(id * 7 % 40000 AS LONG) AS v")
      .repartition(13).createOrReplaceTempView("qt_pi")
    val a = spark.sql(
      "SELECT quantilesTiming(0.1, 0.5, 0.9, 0.99)(v) AS q FROM qt_pi")
      .collect().head.getSeq[Double](0)
    val b = spark.sql(
      "SELECT quantilesTiming(0.1, 0.5, 0.9, 0.99)(v) AS q " +
        "FROM (SELECT v FROM qt_pi ORDER BY v DESC)")
      .collect().head.getSeq[Double](0)
    assert(a == b)
  }

  test("date vocabulary and conditional-aggregate completion") {
    val r = spark.sql("""
      SELECT toStartOfHour(TIMESTAMP '2024-03-07 13:45:21') AS sh,
             toStartOfQuarter(DATE '2024-05-09') AS sq,
             toStartOfYear(DATE '2024-05-09') AS sy,
             toMinute(TIMESTAMP '2024-03-07 13:45:21') AS mi,
             toSecond(TIMESTAMP '2024-03-07 13:45:21') AS se,
             subtractDays(DATE '2024-03-07', 7) AS sub7,
             dateDiff(day, DATE '2024-01-01', DATE '2024-03-01') AS dd
    """).collect().head
    assert(r.getTimestamp(0).toString == "2024-03-07 13:00:00.0")
    assert(r.getDate(1).toString == "2024-04-01")
    assert(r.getDate(2).toString == "2024-01-01")
    assert(r.getLong(3) == 45L && r.getLong(4) == 21L)
    assert(r.getDate(5).toString == "2024-02-29")
    assert(r.getLong(6) == 60L)
    val agg = spark.sql("""
      SELECT minIf(v, k = 'a') AS mn, maxIf(v, k = 'a') AS mx,
             anyIf(v, k = 'z') AS none
      FROM VALUES ('a', 3), ('a', 9), ('b', 100) AS t(k, v)
    """).collect().head
    assert(agg.getInt(0) == 3 && agg.getInt(1) == 9)
    assert(agg.isNullAt(2)) // empty set -> NULL, CH's Nullable result
  }

  test("JSON extraction: default-on-miss contract, visitParam aliases") {
    val r = spark.sql("""
      SELECT JSONExtractString('{"a": "x", "n": 7}', 'a') AS s,
             JSONExtractString('{"a": "x"}', 'zz') AS s_miss,
             JSONExtractInt('{"n": 7}', 'n') AS i,
             JSONExtractInt('{"n": 7}', 'zz') AS i_miss,
             JSONExtractInt('not json', 'n') AS i_bad,
             JSONExtractFloat('{"n": 2.5}', 'n') AS f,
             JSONHas('{"n": 7}', 'n') AS h1,
             JSONHas('{"n": 7}', 'zz') AS h0,
             visitParamExtractUInt('{"n": 7}', 'n') AS vp,
             visitParamHas('{"n": 7}', 'n') AS vph
    """).collect().head
    assert(r.getString(0) == "x" && r.getString(1) == "")
    assert(r.getLong(2) == 7L && r.getLong(3) == 0L && r.getLong(4) == 0L)
    assert(r.getDouble(5) == 2.5)
    assert(r.getLong(6) == 1L && r.getLong(7) == 0L)
    assert(r.getLong(8) == 7L && r.getLong(9) == 1L)
  }

  test("array vocabulary: enumerate/cumSum/sum/slice/concat/flatten edges") {
    val r = spark.sql("""
      SELECT arrayEnumerate(array(7, 8, 9)) AS en,
             arrayEnumerate(array()) AS en_empty,
             arrayCumSum(array(1, 2, 3)) AS cs_long,
             arrayCumSum(array(0.5D, 0.25D)) AS cs_dbl,
             arraySum(array(1, 2, 3)) AS s_long,
             arraySlice(array('a','b','c','d'), 2, 2) AS sl,
             arraySlice(array('a','b','c','d'), 3) AS sl_toend,
             arraySlice(array('a','b','c','d'), -2, 2) AS sl_neg,
             arrayConcat(array(1), array(2, 3)) AS cc,
             arrayFlatten(array(array(1), array(2, 3))) AS fl
    """).collect().head
    assert(r.getSeq[Int](0) == Seq(1, 2, 3))
    assert(r.getSeq[Int](1).isEmpty)
    assert(r.getSeq[Long](2) == Seq(1L, 3L, 6L))
    assert(r.getSeq[Double](3) == Seq(0.5, 0.75))
    assert(r.getLong(4) == 6L)
    assert(r.getSeq[String](5) == Seq("b", "c"))
    assert(r.getSeq[String](6) == Seq("c", "d"))
    assert(r.getSeq[String](7) == Seq("c", "d"))
    assert(r.getSeq[Int](8) == Seq(1, 2, 3))
    assert(r.getSeq[Int](9) == Seq(1, 2, 3))
  }

  test("retention: anchor-gated cohort flags") {
    // u1: anchor+day1; u2: day1 only (no anchor -> all zero);
    // u3: anchor only; u4: anchor+day7
    Seq((1, "a"), (1, "b"), (2, "b"), (3, "a"), (4, "a"), (4, "c"))
      .toDF("u", "d").createOrReplaceTempView("ret_t")
    val rows = spark.sql("""
      SELECT u, retention(d = 'a', d = 'b', d = 'c') AS r
      FROM ret_t GROUP BY u ORDER BY u""")
      .collect().map(r => (r.getInt(0), r.getSeq[Int](1)))
    assert(rows(0) == (1, Seq(1, 1, 0)))
    assert(rows(1) == (2, Seq(0, 0, 0))) // day-1 without anchor
    assert(rows(2) == (3, Seq(1, 0, 0)))
    assert(rows(3) == (4, Seq(1, 0, 1)))
  }

  test("windowFunnel: ordered chain within window, restarts, pre-update state") {
    import graft.functions.ch
    def funnel(events: Seq[(Long, String)], window: Long = 10L): Int = {
      val df = events.toDF("t", "e")
        .select(org.apache.spark.sql.functions.timestamp_seconds($"t")
          .as("ts"), $"e")
      df.agg(ch.windowFunnel(org.apache.spark.sql.functions.lit(window),
        $"ts", Seq($"e" === "v", $"e" === "c", $"e" === "p")))
        .collect().head.getInt(0)
    }
    // full chain inside the window
    assert(funnel(Seq((0L, "v"), (3L, "c"), (7L, "p"))) == 3)
    // step 2 within window, step 3 outside (window measured from START)
    assert(funnel(Seq((0L, "v"), (9L, "c"), (11L, "p"))) == 2)
    // restart: the later 'v' reopens the window for the chain
    assert(funnel(Seq((0L, "v"), (20L, "v"), (25L, "c"), (28L, "p"))) == 3)
    // out-of-order does not count: c before v contributes nothing, and
    // p needs a completed v->c prefix
    assert(funnel(Seq((0L, "c"), (1L, "v"), (2L, "p"))) == 1)
    // no first step -> level 0
    assert(funnel(Seq((0L, "c"), (1L, "p"))) == 0)
    // a NULL-ts event neither starts nor extends a chain
    val withNull = Seq((Some(0L), "v"), (None, "v"), (Some(3L), "c"))
      .toDF("t", "e")
      .select(org.apache.spark.sql.functions
        .timestamp_seconds($"t").as("ts"), $"e")
      .agg(ch.windowFunnel(org.apache.spark.sql.functions.lit(10L),
        $"ts", Seq($"e" === "v", $"e" === "c")))
      .collect().head.getInt(0)
    assert(withNull == 2) // the null view is ignored, chain v@0 -> c@3 holds
    // one event advances at most one step (pre-update state)
    val both = Seq((0L, "b")).toDF("t", "e")
      .select(org.apache.spark.sql.functions.timestamp_seconds($"t")
        .as("ts"), $"e")
      .agg(ch.windowFunnel(org.apache.spark.sql.functions.lit(10L),
        $"ts", Seq($"e" === "b", $"e" === "b")))
      .collect().head.getInt(0)
    assert(both == 1)
  }

  test("windowFunnel parameterized SQL form flattens through the parser") {
    Seq((1, 0L, "v"), (1, 3L, "c"), (1, 7L, "p"), (2, 0L, "v"), (2, 50L, "c"))
      .toDF("u", "t", "e").createOrReplaceTempView("wf_t")
    val rows = spark.sql("""
      SELECT u, windowFunnel(10)(timestamp_seconds(t),
               e = 'v', e = 'c', e = 'p') AS lvl
      FROM wf_t GROUP BY u ORDER BY u""")
      .collect().map(r => (r.getInt(0), r.getInt(1)))
    assert(rows.toSeq == Seq((1, 3), (2, 1)))
  }

  test("SAMPLE clause: deterministic, nested, pushed to the stamped scan") {
    import org.apache.spark.sql.types._
    val keyMd = new MetadataBuilder()
      .putBoolean("graft.sampleKey", true)
      .putBoolean("graft.samplePortable", true).build()
    spark.range(0, 1000)
      .select(col("id").as("k", keyMd), (col("id") * 2).as("v"))
      .createOrReplaceTempView("sample_t")
    def ids(sql: String): Set[Long] =
      spark.sql(sql).collect().map(_.getLong(0)).toSet
    val s30 = ids("SELECT k FROM sample_t SAMPLE 0.3")
    val s10 = ids("SELECT k FROM sample_t SAMPLE 0.1")
    assert(s30 == ids("SELECT k FROM sample_t SAMPLE 0.3")) // deterministic
    assert(s10.subsetOf(s30)) // nested prefixes like CH
    assert(s30.size > 200 && s30.size < 400, s"got ${s30.size}") // ~30%
    // the filter reduces the scan BEFORE the aggregate
    val n = spark.sql(
      "SELECT count(1) AS n FROM sample_t SAMPLE 0.3").collect().head.getLong(0)
    assert(n == s30.size)
    // no stamped key -> loud failure, not a silent full scan
    spark.range(3).createOrReplaceTempView("nokey_t")
    val err = intercept[Exception](
      spark.sql("SELECT * FROM nokey_t SAMPLE 0.5").collect())
    assert(err.getMessage.contains("sample key"))
  }

  test("uniqState/uniqMerge: sketch rollup re-aggregates across partitions") {
    // 5000 distinct ids split across 10 daily partitions with overlap:
    // merge-of-states must estimate the DISTINCT union, not the sum
    val est = spark.sql("""
      SELECT uniqMerge(st) AS u FROM (
        SELECT id % 10 AS day, uniqState(id % 5000) AS st
        FROM range(20000) GROUP BY id % 10
      )""").collect().head.getLong(0)
    assert(math.abs(est - 5000L) <= 250L, s"estimate $est")
    // partial rollup: merging a subset of states covers that subset only
    val half = spark.sql("""
      SELECT uniqMerge(st) AS u FROM (
        SELECT id % 2 AS half, uniqState(id) AS st
        FROM range(10000) GROUP BY id % 2
      ) WHERE half = 0""").collect().head.getLong(0)
    assert(math.abs(half - 5000L) <= 250L, s"estimate $half")
  }

  test("dateDiff quoted unit: BOUNDARY-based counting, all units") {
    // 23:00 -> next day 01:00: 1 day boundary but only 2 hours —
    // CH (and DuckDB date_diff) count boundaries, never full periods
    val r = spark.sql("""
      SELECT dateDiff('day', toDateTime('2024-01-01 23:00:00'),
                      toDateTime('2024-01-02 01:00:00')) AS d,
             dateDiff('hour', toDateTime('2024-01-01 23:10:00'),
                      toDateTime('2024-01-02 01:05:00')) AS h,
             dateDiff('minute', toDateTime('2024-01-01 00:00:59'),
                      toDateTime('2024-01-01 00:01:01')) AS mi,
             dateDiff('month', toDateTime('2024-01-31 12:00:00'),
                      toDateTime('2024-02-01 00:00:00')) AS mo,
             dateDiff('week', toDateTime('2024-01-07 23:59:59'),
                      toDateTime('2024-01-08 00:00:00')) AS w,
             dateDiff('year', toDateTime('2023-12-31 23:59:59'),
                      toDateTime('2024-01-01 00:00:00')) AS y""")
      .collect().head
    // 2024-01-07 is a Sunday, 01-08 the next Monday: one week boundary
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4), r.getLong(5)) == ((1L, 2L, 1L, 1L, 1L, 1L)))
    // negative direction: boundaries count signed
    val neg = spark.sql("""
      SELECT dateDiff('day', toDateTime('2024-01-02 01:00:00'),
                      toDateTime('2024-01-01 23:00:00')) AS d""")
      .collect().head.getLong(0)
    assert(neg == -1L)
  }

  test("age vs dateDiff: full periods vs boundaries; ISO calendar trio") {
    // the same two instants, both CH semantics side by side: 23:00 ->
    // next day 01:00 crosses one DAY boundary (dateDiff = 1) but only
    // 2 hours elapsed (age day = 0)
    val r = spark.sql("""
      SELECT age('day', toDateTime('2024-01-01 23:00:00'),
                 toDateTime('2024-01-02 01:00:00')) AS a,
             dateDiff('day', toDateTime('2024-01-01 23:00:00'),
                      toDateTime('2024-01-02 01:00:00')) AS d,
             age('month', toDateTime('2024-01-15 00:00:00'),
                 toDateTime('2024-03-14 00:00:00')) AS am""")
      .collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == ((0L, 1L, 1L)))
    // 2023-01-01 was a Sunday: ISO week 52 of ISO YEAR 2022
    val iso = spark.sql("""
      SELECT toISOYear(toDateTime('2023-01-01 12:00:00')) AS y,
             toISOWeek(toDateTime('2023-01-01 12:00:00')) AS w,
             toDayOfYear(toDateTime('2024-02-01 00:00:00')) AS doy""")
      .collect().head
    assert((iso.getLong(0), iso.getLong(1), iso.getLong(2)) ==
      ((2022L, 52L, 32L)))
  }

  test("toStartOfInterval: epoch-aligned day-time and month buckets") {
    val r = spark.sql("""
      SELECT CAST(toStartOfInterval(
               toDateTime('2024-01-01 00:37:21'), INTERVAL 15 MINUTE)
             AS STRING) AS q15,
             CAST(toStartOfInterval(
               toDateTime('2024-01-01 07:00:00'), INTERVAL 6 HOUR)
             AS STRING) AS h6,
             CAST(toStartOfInterval(
               toDateTime('2024-03-15 10:00:00'), INTERVAL 2 MONTH)
             AS STRING) AS m2""").collect().head
    assert(r.getString(0) == "2024-01-01 00:30:00")
    assert(r.getString(1) == "2024-01-01 06:00:00")
    assert(r.getString(2) == "2024-03-01") // months since 1970-01 = 650, even
    // whole-week intervals align on MONDAYS (CH), not on the epoch
    // day (1970-01-01 was a Thursday): Tue 2024-01-02 -> Mon 01-01
    val w = spark.sql("""
      SELECT CAST(toStartOfInterval(
               toDateTime('2024-01-02 10:00:00'), INTERVAL 1 WEEK)
             AS STRING) AS w""").collect().head.getString(0)
    assert(w == "2024-01-01 00:00:00")
  }

  test("quoted-literal rewrite never hijacks plain Spark datediff") {
    // 2-arg datediff with a date-string literal is valid Spark SQL —
    // the unit-gated rewrite must leave it alone
    val d = spark.sql("SELECT datediff('2024-01-05', '2024-01-01') AS d")
      .collect().head.getInt(0)
    assert(d == 4)
    // the BARE-unit 3-arg spelling is Spark text: full-period
    // semantics stay (quoted text is CH text, boundary semantics)
    val bare = spark.sql("""
      SELECT dateDiff(DAY, TIMESTAMP'2024-01-01 23:00:00',
                      TIMESTAMP'2024-01-02 01:00:00') AS d""")
      .collect().head.getLong(0)
    assert(bare == 0L)
  }

  test("uniqIf/uniqExactIf: conditional distinct counts, 0 on no match") {
    val r = spark.sql("""
      SELECT uniqExactIf(v, v > 1) AS hi, uniqExactIf(v, v > 99) AS none,
             uniqIf(v, v > 1) AS hi_approx
      FROM VALUES (1), (2), (2), (3) AS t(v)""").collect().head
    assert(r.getLong(0) == 2 && r.getLong(1) == 0)
    assert(r.getLong(2) == 2) // tiny set: HLL is exact here
  }

  test("transform: CH parallel-array mapping; Spark's lambda form intact") {
    val r = spark.sql("""
      SELECT transform('click', array('click','view'), array('C','V'), '?') AS a,
             transform('buy', array('click','view'), array('C','V'), '?') AS b,
             transform('buy', array('click','view'), array('C','V')) AS c,
             transform(array(1, 2), x -> x * 10) AS d""").collect().head
    assert(r.getString(0) == "C")
    assert(r.getString(1) == "?") // 4-arg: default on no match
    assert(r.getString(2) == "buy") // 3-arg: input kept on no match
    assert(r.getSeq[Int](3) == Seq(10, 20)) // builtin higher-order form
  }

  test("scalar WITH: CH macro aliases substitute and keep output names") {
    val df = spark.sql("""
      WITH 2 AS k, k * 10 AS k10
      SELECT k, k10, v * k AS vk
      FROM VALUES (1), (2) AS t(v)
      ORDER BY vk""")
    assert(df.columns.toSeq == Seq("k", "k10", "vk"))
    assert(df.collect().map(r => (r.getInt(0), r.getInt(1), r.getInt(2)))
      .toSeq == Seq((2, 20, 2), (2, 20, 4)))
    // the alias reaches WHERE / GROUP BY / HAVING scopes and literals
    // with commas stay whole through the masked split
    val g = spark.sql("""
      WITH 1 AS lo, 'a,b' AS sep
      SELECT v % 2 AS parity, concat_ws(sep, 'x', 'y') AS s,
             count(1) AS n
      FROM VALUES (1), (2), (3), (4) AS t(v)
      WHERE v > lo
      GROUP BY parity, sep
      HAVING count(1) >= lo
      ORDER BY parity""").collect()
    assert(g.map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
      .toSeq == Seq((0, "xa,by", 2), (1, "xa,by", 1)))
  }

  test("scalar WITH: standard CTE form is untouched") {
    val df = spark.sql(
      "WITH t AS (SELECT 1 AS v) SELECT v, 2 AS w FROM t")
    assert(df.collect().head.getInt(0) == 1)
  }

  test("weighted parameterized aggregates: quantileExactWeighted, topKWeighted") {
    val r = spark.sql("""
      SELECT quantileExactWeighted(0.5)(v, w) AS p50w,
             topKWeighted(2)(CAST(v AS STRING), w) AS topw
      FROM VALUES (1, 1L), (2, 1L), (10, 8L) AS t(v, w)""").collect().head
    // repeated-row view: 1,2,10×8 → median 10; weights 8 > 1 = 1,
    // tie between '1' and '2' broken by value
    assert(r.getDouble(0) == 10.0)
    assert(r.getSeq[String](1) == Seq("10", "1"))
  }

  test("scalar WITH composes with TOTALS and LIMIT BY in one statement") {
    val df = spark.sql("""
      WITH 1 AS lo
      SELECT v % 3 AS g, sum(v) AS s
      FROM VALUES (1), (2), (3), (4), (5), (6) AS t(v)
      WHERE v > lo
      GROUP BY v % 3 WITH TOTALS
      ORDER BY s
      LIMIT 3 BY g""")
    val rows = df.collect().map(r =>
      (Option(r.get(0)).map(_.toString).orNull, r.getLong(1))).toSet
    // groups over v in 2..6: g=0 → 3+6=9, g=1 → 4, g=2 → 2+5=7;
    // totals row: 20 with NULL key
    assert(rows == Set(("1", 4L), ("2", 7L), ("0", 9L), (null, 20L)))
  }

  test("arrayFold: CH lambda-first fold with explicit init") {
    val r = spark.sql("""
      SELECT arrayFold((acc, x) -> acc * 10 + x,
                       array(1, 2, 3), CAST(0 AS BIGINT)) AS digits,
             arrayFold((acc, x) -> acc || x,
                       array('b', 'c'), 'a') AS cat,
             arrayFold((acc, x) -> acc + x,
                       CAST(array() AS ARRAY<INT>), 100) AS empty
    """).collect().head
    assert(r.getLong(0) == 123L)
    assert(r.getString(1) == "abc")
    assert(r.getInt(2) == 100) // empty array: init unchanged
  }

  test("add/subtract family: dates stay dates, timestamps keep time-of-day") {
    val r = spark.sql("""
      SELECT CAST(addMonths(DATE'2024-01-31', 1) AS STRING) AS d1,
             CAST(addYears(DATE'2024-02-29', 1) AS STRING) AS d2,
             CAST(addHours(TIMESTAMP'2024-01-01 22:30:00', 3) AS STRING) AS t1,
             CAST(addMonths(TIMESTAMP'2024-01-15 10:20:30', 1) AS STRING) AS t2,
             CAST(subtractWeeks(DATE'2024-01-15', 2) AS STRING) AS d3,
             CAST(subtractMinutes(TIMESTAMP'2024-01-01 00:10:00', 15) AS STRING) AS t3,
             CAST(toLastDayOfMonth(DATE'2024-02-10') AS STRING) AS ld,
             CAST(timeSlot(TIMESTAMP'2024-01-01 10:44:59') AS STRING) AS slot,
             toRelativeDayNum(TIMESTAMP'1970-01-03 01:00:00') AS rd,
             toRelativeHourNum(TIMESTAMP'1970-01-01 05:30:00') AS rh""")
      .collect().head
    assert(r.getString(0) == "2024-02-29") // month-end clamp
    assert(r.getString(1) == "2025-02-28") // leap-day clamp
    assert(r.getString(2) == "2024-01-02 01:30:00")
    assert(r.getString(3) == "2024-02-15 10:20:30") // time survives
    assert(r.getString(4) == "2024-01-01")
    assert(r.getString(5) == "2023-12-31 23:55:00")
    assert(r.getString(6) == "2024-02-29")
    assert(r.getString(7) == "2024-01-01 10:30:00")
    assert(r.getLong(8) == 2L && r.getLong(9) == 5L)
  }

  test("splitters, maps, bit/conditional vocab, geo, array shingles") {
    val r = spark.sql("""
      SELECT splitByWhitespace('  a  bb\tc ') AS sw,
             alphaTokens('ab12cd-ef') AS at,
             concatWithSeparator('-', 'a', 'b', 'c') AS cs,
             substringIndex('a.b.c', '.', 2) AS si,
             mapKeys(map('x', 1, 'y', 2)) AS mk,
             mapContains(map('x', 1), 'x') AS mc1,
             mapContains(map('x', 1), 'z') AS mc0,
             bitCount(7) AS bc,
             isZeroOrNull(0) AS z1, isZeroOrNull(CAST(NULL AS INT)) AS z2,
             isZeroOrNull(3) AS z0,
             ifNotFinite(CAST('NaN' AS DOUBLE), -1.0D) AS inf,
             arrayShingles(array(1, 2, 3, 4), 2) AS sh,
             arrayShingles(array(1), 3) AS sh0,
             arrayWithConstant(3, 'k') AS awc,
             round(greatCircleDistance(37.62, 55.75, 30.32, 59.94), 0) AS gc
    """).collect().head
    assert(r.getSeq[String](0) == Seq("a", "bb", "c"))
    assert(r.getSeq[String](1) == Seq("ab", "cd", "ef"))
    assert(r.getString(2) == "a-b-c")
    assert(r.getString(3) == "a.b")
    assert(r.getSeq[String](4).sorted == Seq("x", "y"))
    assert(r.getLong(5) == 1L && r.getLong(6) == 0L)
    assert(r.getLong(7) == 3L)
    assert(r.getLong(8) == 1L && r.getLong(9) == 1L && r.getLong(10) == 0L)
    assert(r.getDouble(11) == -1.0)
    assert(r.getSeq[Seq[Int]](12) == Seq(Seq(1, 2), Seq(2, 3), Seq(3, 4)))
    assert(r.getSeq[Seq[Int]](13).isEmpty)
    assert(r.getSeq[String](14) == Seq("k", "k", "k"))
    // Moscow → St Petersburg ≈ 634 km on the 6371 km sphere
    assert(math.abs(r.getDouble(15) - 634000.0) < 4000.0)
  }

  test("greatCircleDistance: q137 fixture grid vs reference haversine, " +
      "relative tolerance (trig retired from the hashed oracle surface)") {
    // the driver-hashed q137 entry no longer carries the geo column —
    // JVM-vs-libm trig deltas flipped a floor() bucket two rounds
    // running. This spec is the coverage that replaced it: the same
    // (user_id, event_id) coordinate grid, checked against a
    // pure-Scala haversine with 1e-9 relative tolerance.
    def ref(lon1: Double, lat1: Double, lon2: Double, lat2: Double): Double = {
      val (f1, f2) = (math.toRadians(lat1), math.toRadians(lat2))
      val (dF, dL) = (f2 - f1, math.toRadians(lon2 - lon1))
      val h = math.pow(math.sin(dF / 2), 2) +
        math.cos(f1) * math.cos(f2) * math.pow(math.sin(dL / 2), 2)
      2 * 6371000.0 * math.asin(math.sqrt(h))
    }
    val rows = spark.sql("""
      SELECT u, e,
             greatCircleDistance(CAST(u % 90 AS DOUBLE) + 0.5,
                                 CAST(u % 60 AS DOUBLE) + 0.5,
                                 CAST(e % 90 AS DOUBLE) + 0.5,
                                 CAST(e % 60 AS DOUBLE) + 0.5) AS gc
      FROM (SELECT id AS u, id * 7 + 3 AS e FROM range(0, 200))
    """).collect()
    assert(rows.length == 200)
    rows.foreach { r =>
      val (u, e) = (r.getLong(0), r.getLong(1))
      val want = ref(u % 90 + 0.5, u % 60 + 0.5, e % 90 + 0.5, e % 60 + 0.5)
      val got = r.getDouble(2)
      assert(math.abs(got - want) <= 1e-9 * math.max(1.0, want),
        s"u=$u e=$e got=$got want=$want")
    }
  }

  test("ngramDistance / ngramSearch: multiset 4-gram fuzzy matching") {
    val r = spark.sql("""
      SELECT ngramDistance('clickhouse', 'clickhouse') AS same,
             ngramDistance('clickhouse', 'clickhome') AS near,
             ngramDistance('abc', 'xy') AS both_gramless,
             ngramDistance('abcd', 'xyz') AS one_gramless,
             ngramSearch('the quick brown fox', 'quick') AS hit,
             ngramSearch('the quick brown fox', 'zebra') AS miss,
             ngramSearch('aba', 'abab') AS partial
    """).collect().head
    assert(r.getDouble(0) == 0.0)
    // clickhouse: 7 grams, clickhome: 6, shared 4 → 1 − 8/13
    assert(math.abs(r.getDouble(1) - 5.0 / 13) < 1e-9)
    assert(r.getDouble(2) == 0.0) // both too short: distance 0
    assert(r.getDouble(3) == 1.0) // exactly one gramless: distance 1
    assert(r.getDouble(4) == 1.0) // every needle gram present
    assert(r.getDouble(5) == 0.0)
    assert(r.getDouble(6) == 0.0) // gramless haystack shares nothing
  }

  test("numbers() table function, FORMAT tail, trailing semicolon") {
    val r = spark.sql("""
      SELECT number, number * 2 AS dbl
      FROM numbers(5) ORDER BY number
      FORMAT CSVWithNames;""").collect()
    assert(r.map(x => (x.getLong(0), x.getLong(1))).toSeq ==
      (0L until 5L).map(i => (i, i * 2)))
    val off = spark.sql("SELECT sum(number) AS s FROM numbers(10, 5);")
      .collect().head.getLong(0)
    assert(off == (10L to 14L).sum)
    // a bare trailing semicolon alone also parses
    assert(spark.sql("SELECT 1 AS one;").collect().head.getInt(0) == 1)
    // the CH cross-join idiom: a comma-adjacent numbers() (the comma
    // follows ')', no word boundary) rewrites too
    val cross = spark.sql("""
      SELECT count(1) AS n FROM numbers(3), numbers(4);""")
      .collect().head.getLong(0)
    assert(cross == 12L)
  }

  test("arrayEnumerateUniq: 1-based occurrence index among equals") {
    val r = spark.sql("""
      SELECT arrayEnumerateUniq(array('a', 'b', 'a', 'a', 'b')) AS e,
             arrayEnumerateUniq(CAST(array() AS ARRAY<STRING>)) AS empty
    """).collect().head
    assert(r.getSeq[Long](0) == Seq(1L, 1L, 2L, 3L, 2L))
    assert(r.getSeq[Long](1).isEmpty)
  }

  test("arrayMin/arrayMax: element-type default on an empty array") {
    val r = spark.sql("""
      SELECT arrayMin(CAST(array() AS ARRAY<INT>)) AS mn,
             arrayMax(CAST(array() AS ARRAY<DOUBLE>)) AS mx""")
      .collect().head
    assert(r.getInt(0) == 0 && r.getDouble(1) == 0.0) // never NULL
  }

  test("arrayFirst/arrayLast/arrayAll/arrayMin/arrayMax/arrayAvg") {
    val r = spark.sql("""
      SELECT arrayFirst(x -> x > 1, array(1, 2, 3)) AS f,
             arrayLast(x -> x > 1, array(1, 2, 3)) AS l,
             arrayFirst(x -> x > 99, array(1, 2)) AS fmiss,
             arrayLast(x -> x > 99, array(1, 2)) AS lmiss,
             arrayAll(x -> x > 0, array(1, 2)) AS alltrue,
             arrayAll(x -> x > 1, array(1, 2)) AS allfalse,
             arrayMin(array(3, 1, 2)) AS mn,
             arrayMax(array(3, 1, 2)) AS mx,
             arrayAvg(array(1.0D, 2.0D, 6.0D)) AS av,
             arrayAvg(CAST(array() AS ARRAY<DOUBLE>)) AS avempty""")
      .collect().head
    assert(r.getInt(0) == 2 && r.getInt(1) == 3)
    assert(r.getInt(2) == 0 && r.getInt(3) == 0) // element default, not NULL
    assert(r.getBoolean(4) && !r.getBoolean(5))
    assert(r.getInt(6) == 1 && r.getInt(7) == 3)
    assert(math.abs(r.getDouble(8) - 3.0) < 1e-12)
    assert(r.getDouble(9) == 0.0) // CH: arrayAvg([]) = 0
  }
}
