package graft

/** Round-8 ninth wave: CH array/string vocabulary gap-fill (X121 —
  * arrayFirstIndex, arraySplit, countEqual, arrayProduct,
  * arrayJaccardIndex, hasSubstr, splitByRegexp,
  * multiSearchAllPositions, hex/unhex, halfMD5, toFixedString /
  * toStringCutToZero).
  */
class Round8gSpec extends SparkSpec {

  private def sql1(q: String): Any = spark.sql(q).head().get(0)

  test("arrayFirstIndex: 1-based first hit, 0 on no match / empty") {
    assert(sql1("SELECT arrayFirstIndex(x -> x > 2, array(1, 3, 5))") == 2L)
    assert(sql1("SELECT arrayFirstIndex(x -> x > 9, array(1, 3, 5))") == 0L)
    assert(sql1("SELECT arrayFirstIndex(x -> x > 0, array())") == 0L)
  }

  test("arraySplit cuts before matches but never before the first " +
      "element (CH's documented example)") {
    assert(sql1("SELECT arraySplit(x -> x = 1, array(1, 2, 3, 1, 4))")
      .toString == "WrappedArray(WrappedArray(1, 2, 3), WrappedArray(1, 4))"
      .replace("WrappedArray", "ArraySeq") ||
      sql1("SELECT arraySplit(x -> x = 1, array(1, 2, 3, 1, 4))")
        .asInstanceOf[scala.collection.Seq[scala.collection.Seq[Int]]]
        .map(_.toSeq).toSeq == Seq(Seq(1, 2, 3), Seq(1, 4)))
    assert(sql1("SELECT arraySplit(x -> false, array(7, 8))")
      .asInstanceOf[scala.collection.Seq[scala.collection.Seq[Int]]]
      .map(_.toSeq).toSeq == Seq(Seq(7, 8)))
    assert(sql1("SELECT size(arraySplit(x -> true, array()))") == 0)
  }

  test("countEqual counts occurrences, null-safely") {
    assert(sql1("SELECT countEqual(array(1, 2, 1, 1), 1)") == 3L)
    assert(sql1(
      "SELECT countEqual(array(1, NULL, NULL), CAST(NULL AS INT))") == 2L)
  }

  test("arrayProduct is a Float64 fold; arrayJaccardIndex is set " +
      "intersection over union") {
    assert(sql1("SELECT arrayProduct(array(2, 3, 4))") == 24.0)
    assert(sql1("SELECT arrayJaccardIndex(array(1, 2, 3), array(2, 3, 4))")
      == 0.5)
    assert(sql1("SELECT arrayJaccardIndex(array(), array())") == 0.0)
  }

  test("hasSubstr demands a contiguous ordered run (vs hasAll's set " +
      "test)") {
    assert(sql1("SELECT hasSubstr(array(1, 2, 3, 4), array(2, 3))") == true)
    assert(sql1("SELECT hasSubstr(array(1, 2, 3, 4), array(3, 2))") == false)
    assert(sql1("SELECT hasSubstr(array(1, 2), array(1, 2, 3))") == false)
    assert(sql1("SELECT hasSubstr(array(1, 2), array())") == true)
  }

  test("splitByRegexp keeps CH argument order (pattern first) and " +
      "trailing empties") {
    assert(sql1("SELECT splitByRegexp('[0-9]+', 'a1bb22ccc')")
      .asInstanceOf[scala.collection.Seq[String]].toSeq ==
      Seq("a", "bb", "ccc"))
    assert(sql1("SELECT splitByRegexp(',', 'x,,')")
      .asInstanceOf[scala.collection.Seq[String]].toSeq ==
      Seq("x", "", ""))
  }

  test("multiSearchAllPositions: 1-based positions, 0 for misses") {
    assert(sql1("SELECT multiSearchAllPositions('hello world', " +
      "array('l', 'world', 'zz'))")
      .asInstanceOf[scala.collection.Seq[Long]].toSeq == Seq(3L, 7L, 0L))
  }

  test("hex/unhex round-trip uppercase over UTF-8 bytes") {
    assert(sql1("SELECT hex('abc')") == "616263")
    assert(sql1("SELECT hex('z')") == "7A")
    assert(sql1("SELECT unhex(hex('graft'))") == "graft")
  }

  test("halfMD5 equals the first 8 MD5 bytes as an unsigned big-endian " +
      "integer") {
    val md = java.security.MessageDigest.getInstance("MD5")
    val d = md.digest("hello".getBytes("UTF-8"))
    val expect = BigInt(1, d.take(8))
    assert(BigDecimal(sql1("SELECT halfMD5('hello')")
      .asInstanceOf[java.math.BigDecimal]).toBigInt == expect)
  }

  test("vector distances match hand math on small integer vectors") {
    spark.sql("SELECT array(1L, 2L, 3L) AS a, array(4L, 6L, 3L) AS b")
      .createOrReplaceTempView("vd_t")
    val r = spark.sql("""
      SELECT dotProduct(a, b), L1Distance(a, b), L2SquaredDistance(a, b),
             L2Distance(a, b), LinfDistance(a, b), cosineDistance(a, b)
      FROM vd_t""").head()
    assert(r.getDouble(0) == 25.0) // 4 + 12 + 9
    assert(r.getDouble(1) == 7.0)  // 3 + 4 + 0
    assert(r.getDouble(2) == 25.0) // 9 + 16 + 0
    assert(r.getDouble(3) == 5.0)
    assert(r.getDouble(4) == 4.0)
    // 1 − 25 / (sqrt(14)·sqrt(61))
    assert(r.getDouble(5) ==
      1.0 - 25.0 / (math.sqrt(14.0) * math.sqrt(61.0)))
  }

  test("cosineDistance is NULL on a zero-norm side; identical vectors " +
      "give distance 0") {
    spark.sql("SELECT array(0L, 0L) AS z, array(1L, 2L) AS v")
      .createOrReplaceTempView("vd_z")
    val r = spark.sql(
      "SELECT cosineDistance(z, v), cosineDistance(v, v) FROM vd_z").head()
    assert(r.isNullAt(0))
    // 1 − n/(√n·√n) is a few ulps, not exactly 0 — the formula's own
    // float identity (CH's cosineDistance behaves the same way)
    assert(math.abs(r.getDouble(1)) < 1e-12)
  }

  test("pointInEllipses: inside-any semantics with the boundary " +
      "counted as inside") {
    def at(px: Double, py: Double): Long = spark.sql(
      s"SELECT pointInEllipses(CAST($px AS DOUBLE), CAST($py AS DOUBLE)," +
        " 0.0D, 0.0D, 2.0D, 1.0D, 10.0D, 10.0D, 1.0D, 1.0D)")
      .head().getLong(0)
    assert(at(0.0, 0.0) == 1L)   // center of the first
    assert(at(2.0, 0.0) == 1L)   // on the boundary
    assert(at(10.5, 10.0) == 1L) // inside the second
    assert(at(3.0, 3.0) == 0L)   // outside both
  }

  test("gcd/lcm: Euclid fold matches known values, zero edges pinned") {
    val r = spark.sql("""
      SELECT gcd(12, 18), gcd(17, 5), gcd(0, 7), gcd(0, 0),
             lcm(4, 6), lcm(21, 6), lcm(0, 5)""").head()
    assert(r.getLong(0) == 6L)
    assert(r.getLong(1) == 1L)
    assert(r.getLong(2) == 7L)
    assert(r.getLong(3) == 0L)
    assert(r.getLong(4) == 12L)
    assert(r.getLong(5) == 42L)
    assert(r.getLong(6) == 0L)
  }

  test("toYearWeek is the ISO yearweek (year boundary flips with the " +
      "ISO week); dateName/monthName render English names") {
    val r = spark.sql("""
      SELECT toYearWeek(DATE '2024-01-02'),
             toYearWeek(DATE '2023-01-01'),
             dateName('weekday', DATE '2024-01-02'),
             dateName('month', DATE '2024-01-02'),
             monthName(DATE '2024-03-15')""").head()
    assert(r.getLong(0) == 202401L)
    assert(r.getLong(1) == 202252L) // Sunday → ISO week 52 of 2022
    assert(r.getString(2) == "Tuesday")
    assert(r.getString(3) == "January")
    assert(r.getString(4) == "March")
  }

  test("multiSearchFirstPosition takes the leftmost hit; " +
      "appendTrailingCharIfAbsent is idempotent; tokens split on " +
      "non-alphanumerics; OrZero division never errors") {
    val r = spark.sql("""
      SELECT multiSearchFirstPosition('hello world', array('lo', 'wor')),
             multiSearchFirstPosition('abc', array('zz')),
             appendTrailingCharIfAbsent(
               appendTrailingCharIfAbsent('dir', '/'), '/'),
             concat_ws('-', tokens('a1 b-c,,d')),
             intDivOrZero(9, 0), moduloOrZero(9, 0),
             intDivOrZero(9, 2), moduloOrZero(9, 4)""").head()
    assert(r.getLong(0) == 4L)
    assert(r.getLong(1) == 0L)
    assert(r.getString(2) == "dir/")
    assert(r.getString(3) == "a1-b-c-d")
    assert(r.getLong(4) == 0L && r.getLong(5) == 0L)
    assert(r.getLong(6) == 4L && r.getLong(7) == 1L)
  }

  test("geohashEncode reproduces the canonical cell and clamps the " +
      "±180/±90 edges; decode(encode) round-trips to the cell center") {
    val r = spark.sql("""
      SELECT geohashEncode(-5.60302734375D, 42.60498046875D, 5),
             geohashEncode(180.0D, 90.0D, 4),
             geohashEncode(-180.0D, -90.0D, 4)""").head()
    assert(r.getString(0) == "ezs42")
    assert(r.getString(1) == "zzzz")
    assert(r.getString(2) == "0000")
    val d = spark.sql("""
      SELECT geohashDecode(geohashEncode(13.361389D, 38.115556D, 12)) AS c
      """).selectExpr("c.longitude", "c.latitude").head()
    assert(math.abs(d.getDouble(0) - 13.361389) < 1e-6)
    assert(math.abs(d.getDouble(1) - 38.115556) < 1e-6)
    // canonical decode: 'ezs42' centers on (-5.603, 42.605)
    val e = spark.sql("SELECT geohashDecode('ezs42') AS c")
      .selectExpr("c.longitude", "c.latitude").head()
    assert(math.abs(e.getDouble(0) + 5.60302734375) < 1e-9)
    assert(math.abs(e.getDouble(1) - 42.60498046875) < 1e-9)
  }

  test("toFixedString pads with NUL to n and errors on overflow; " +
      "toStringCutToZero reads it back") {
    assert(sql1("SELECT length(toFixedString('ab', 5))") == 5)
    assert(sql1("SELECT toStringCutToZero(toFixedString('ab', 5))") == "ab")
    val e = intercept[Exception] {
      spark.sql("SELECT toFixedString('toolong', 3)").collect()
    }
    assert(e.getMessage.contains("toFixedString") ||
      e.getCause.getMessage.contains("toFixedString"))
  }
}
