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
