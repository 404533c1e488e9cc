package graft

import org.apache.spark.sql.functions._

import graft.functions.url

/** Round-8 seventh wave: the URL hierarchy / authority family (X118 —
  * URLHierarchy, URLPathHierarchy, cutToFirstSignificantSubdomain,
  * extractURLParameterNames/Parameters, netloc, encodeURLComponent).
  */
class Round8fSpec extends SparkSpec {
  import spark.implicits._

  private def one(u: String, c: org.apache.spark.sql.Column => org.apache.spark.sql.Column): Any =
    Seq(u).toDF("u").select(c($"u")).head().get(0)

  private def arr(u: String, c: org.apache.spark.sql.Column => org.apache.spark.sql.Column): Seq[String] =
    one(u, c).asInstanceOf[scala.collection.Seq[String]].toSeq

  test("URLHierarchy truncates after each separator run, CH's example") {
    assert(arr("https://example.com/browse/CONV-6788", url.urlHierarchy) ==
      Seq("https://example.com/", "https://example.com/browse/",
        "https://example.com/browse/CONV-6788"))
  }

  test("URLHierarchy: query cut, consecutive separators as one, and " +
      "the separator-free URL maps to itself") {
    assert(arr("http://a.b.c//d?x=1", url.urlHierarchy) ==
      Seq("http://a.b.c//", "http://a.b.c//d?", "http://a.b.c//d?x=1"))
    assert(arr("https://example.com", url.urlHierarchy) ==
      Seq("https://example.com"))
  }

  test("URLPathHierarchy drops protocol+host and the bare root") {
    assert(arr("https://example.com/browse/CONV-6788", url.urlPathHierarchy) ==
      Seq("/browse/", "/browse/CONV-6788"))
    assert(arr("https://example.com/", url.urlPathHierarchy).isEmpty)
    assert(arr("https://example.com", url.urlPathHierarchy).isEmpty)
  }

  test("cutToFirstSignificantSubdomain applies the {com,net,org,co} " +
      "second-level rule") {
    assert(one("https://news.clickhouse.com.tr/",
      url.cutToFirstSignificantSubdomain) == "clickhouse.com.tr")
    assert(one("https://metrica.yandex.ru/about",
      url.cutToFirstSignificantSubdomain) == "yandex.ru")
    assert(one("http://localhost/x",
      url.cutToFirstSignificantSubdomain) == "")
  }

  test("extractURLParameterNames and extractURLParameters keep query " +
      "order, duplicates, and bare flags; the fragment is excluded") {
    val u = "http://h/p?a=1&b&a=2&c=3#d=9"
    assert(arr(u, url.extractURLParameterNames) == Seq("a", "b", "a", "c"))
    assert(arr(u, url.extractURLParameters) ==
      Seq("a=1", "b", "a=2", "c=3"))
  }

  test("histogram: equal-width buckets partition the group, bounds " +
      "span [min, max], last bucket takes the max") {
    val df = Seq(0.0, 1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0, 8.0).toDF("v")
    val rows = df.agg(graft.functions.ch.histogramEq(4, $"v").as("h"))
      .selectExpr("inline(h)").as[(Double, Double, Long)].collect()
    assert(rows.length == 4)
    assert(rows.map(_._3).sum == 9)
    assert(rows.head._1 == 0.0 && rows.last._2 == 8.0)
    // width 2: [0,2)→{0,1}, [2,4)→{2,3}, [4,6)→{4,5}, [6,8]→{6,7,8}
    assert(rows.map(_._3).toSeq == Seq(2, 2, 2, 3))
  }

  test("histogram: constant group lands wholly in bucket 0") {
    val df = Seq(5.0, 5.0, 5.0).toDF("v")
    val rows = df.agg(graft.functions.ch.histogramEq(4, $"v").as("h"))
      .selectExpr("inline(h)").as[(Double, Double, Long)].collect()
    assert(rows.map(_._3).toSeq == Seq(3, 0, 0, 0))
  }

  test("bar renders full blocks plus one eighth-cell partial") {
    def render(x: Double, w: Int): String =
      Seq(x).toDF("x")
        .select(graft.functions.ch.bar($"x", lit(0.0), lit(1.0), w))
        .as[String].head()
    assert(render(1.0, 4) == "████")
    assert(render(0.0, 4) == "")
    assert(render(0.5, 4) == "██")
    // 0.3·4·8 = 9.6 → e=9 → one full + ▏
    assert(render(0.3, 4) == "█▏")
    assert(render(2.0, 4) == "████") // clamped
  }

  test("formatReadableSize walks the KiB ladder with exact two-decimal " +
      "rendering; formatReadableQuantity the thousands ladder") {
    def sz(x: Long): String = Seq(x).toDF("x")
      .select(graft.functions.ch.formatReadableSize($"x")).as[String].head()
    assert(sz(123L) == "123.00 B")
    assert(sz(1536L) == "1.50 KiB")
    assert(sz(1048576L) == "1.00 MiB")
    assert(sz(5L * 1024 * 1024 * 1024) == "5.00 GiB")
    def q(x: Long): String = Seq(x).toDF("x")
      .select(graft.functions.ch.formatReadableQuantity($"x")).as[String].head()
    assert(q(999L) == "999.00")
    assert(q(1200L) == "1.20 thousand")
    assert(q(3500000L) == "3.50 million")
  }

  test("netloc keeps userinfo and port; encodeURLComponent uses %20 " +
      "for space and round-trips through decodeURLComponent") {
    assert(one("https://user:pw@host.com:8443/p?q", url.netloc) ==
      "user:pw@host.com:8443")
    assert(one("a b+c/d", url.encodeURLComponent) == "a%20b%2Bc%2Fd")
    val roundTrip = Seq("a b+c/d &?=x").toDF("u")
      .select(url.decodeURLComponent(url.encodeURLComponent($"u")))
      .as[String].head()
    assert(roundTrip == "a b+c/d &?=x")
  }
}
