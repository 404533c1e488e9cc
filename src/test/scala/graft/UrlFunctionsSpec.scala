package graft

import org.apache.spark.sql.functions._

import graft.functions.url

/** CH URL-function combinators: hand-checked component extraction on
  * every structural URL shape, the empty-string-never-null contract,
  * and the SQL-dialect registration.
  */
class UrlFunctionsSpec extends SparkSpec {
  import spark.implicits._

  private def parts(u: String): (String, String, String, String, String,
      Int, String, String, String, String, String) = {
    val r = Seq(u).toDF("u").select(
      url.protocol(col("u")), url.domain(col("u")),
      url.domainWithoutWWW(col("u")), url.topLevelDomain(col("u")),
      url.firstSignificantSubdomain(col("u")), url.port(col("u")),
      url.path(col("u")), url.pathFull(col("u")),
      url.queryString(col("u")), url.fragment(col("u")),
      url.cutQueryString(col("u"))).collect().head
    (r.getString(0), r.getString(1), r.getString(2), r.getString(3),
      r.getString(4), r.getInt(5), r.getString(6), r.getString(7),
      r.getString(8), r.getString(9), r.getString(10))
  }

  test("full URL: scheme, userinfo, www, port, path, query, fragment") {
    val (proto, dom, domNw, tld, fsd, prt, pth, pfull, qs, frag, cutQs) =
      parts("https://u@www.example.com:8080/a/b.html?x=1&y=2#frag")
    assert(proto == "https")
    assert(dom == "www.example.com")
    assert(domNw == "example.com")
    assert(tld == "com")
    assert(fsd == "example")
    assert(prt == 8080)
    assert(pth == "/a/b.html")
    assert(pfull == "/a/b.html?x=1&y=2#frag")
    assert(qs == "x=1&y=2")
    assert(frag == "frag")
    assert(cutQs == "https://u@www.example.com:8080/a/b.html#frag")
  }

  test("scheme-less URL and effective-TLD stepping") {
    val (proto, dom, _, tld, fsd, prt, pth, _, _, _, _) =
      parts("news.portal.com.tr/x")
    assert(proto == "")
    assert(dom == "news.portal.com.tr")
    assert(tld == "tr")
    assert(fsd == "portal") // steps over the com second-level label
    assert(prt == 0)
    assert(pth == "/x")
  }

  test("path-less URL with port and query: no authority re-parse") {
    // an optional-prefix regex backtracks here and reads the authority
    // as a path — the strip-first form must not
    val (_, dom, _, _, _, prt, pth, pfull, qs, _, _) =
      parts("https://u@host.io:9000?a=1")
    assert(dom == "host.io")
    assert(prt == 9000)
    assert(pth == "" && pfull == "")
    assert(qs == "a=1")
  }

  test("empty-string contract: every component '' (or default port) on a bare host") {
    val (proto, dom, domNw, tld, fsd, prt, pth, pfull, qs, frag, cutQs) =
      parts("cdn.io")
    assert(proto == "" && dom == "cdn.io" && domNw == "cdn.io")
    assert(tld == "io" && fsd == "cdn" && prt == 0)
    assert(pth == "" && pfull == "" && qs == "" && frag == "")
    assert(cutQs == "cdn.io")
  }

  test("single-label domain: no tld, no significant subdomain") {
    val (_, dom, _, tld, fsd, _, _, _, _, _, _) = parts("localhost/x")
    assert(dom == "localhost" && tld == "" && fsd == "")
  }

  test("extractURLParameter: first hit, raw value, '' on absent, name quoted") {
    val r = Seq("http://x.io/p?a=1&b=2&a=3").toDF("u").select(
      url.extractURLParameter(col("u"), "a"),
      url.extractURLParameter(col("u"), "b"),
      url.extractURLParameter(col("u"), "z"),
      url.extractURLParameter(col("u"), "a.b")).collect().head
    assert(r.getString(0) == "1") // first occurrence
    assert(r.getString(1) == "2")
    assert(r.getString(2) == "")
    assert(r.getString(3) == "") // regex-quoted: '.' is literal, no match
  }

  test("cut functions keep the right remainder") {
    val r = Seq("http://x.io/p?q=1#f?g").toDF("u").select(
      url.cutQueryString(col("u")),
      url.cutFragment(col("u")),
      url.cutQueryStringAndFragment(col("u"))).collect().head
    assert(r.getString(0) == "http://x.io/p#f?g") // fragment survives
    assert(r.getString(1) == "http://x.io/p?q=1")
    assert(r.getString(2) == "http://x.io/p")
  }

  test("decodeURLComponent: UTF-8 percent decode, '+' stays literal") {
    val r = spark.sql("""
      SELECT decodeURLComponent('a%20b+c%2Fd') AS plain,
             decodeURLComponent('%D0%BF%D1%80%D0%B8%D0%B2%D0%B5%D1%82') AS ru,
             decodeURLComponent('') AS empty
    """).collect().head
    assert(r.getString(0) == "a b+c/d") // space decoded, plus untouched
    assert(r.getString(1) == "привет") // multibyte UTF-8 sequences
    assert(r.getString(2) == "")
    // malformed percent-sequences fall back to the raw value — one
    // bad row must never abort a corpus-wide scan
    val bad = spark.sql("""
      SELECT decodeURLComponent('100% cotton') AS a,
             decodeURLComponent('q=%zz') AS b,
             decodeURLComponent('tail%') AS c""").collect().head
    assert(bad.getString(0) == "100% cotton")
    assert(bad.getString(1) == "q=%zz")
    assert(bad.getString(2) == "tail%")
  }

  test("cutWWW: one leading www. falls after protocol/userinfo only") {
    val r = spark.sql("""
      SELECT cutWWW('https://www.ex.com/p') AS a,
             cutWWW('http://u@www.site.org/q') AS b,
             cutWWW('www.bare.io/x') AS c,
             cutWWW('https://notwww.ex.com/www.deep/') AS d
    """).collect().head
    assert(r.getString(0) == "https://ex.com/p")
    assert(r.getString(1) == "http://u@site.org/q")
    assert(r.getString(2) == "bare.io/x") // protocol-less host
    assert(r.getString(3) == "https://notwww.ex.com/www.deep/") // untouched
  }

  test("SQL dialect registration: CH URL functions run as verbatim SQL") {
    val r = spark.sql("""
      SELECT domain('https://u@www.ex.org:1/p?a=b#c') AS d,
             firstSignificantSubdomain('a.b.com.tr/x') AS f,
             port('x.io', 8123) AS p,
             extractURLParameter('x.io/p?k=v', 'k') AS e,
             pathFull('x.io/p?k=v') AS pf
    """).collect().head
    assert(r.getString(0) == "www.ex.org")
    assert(r.getString(1) == "b")
    assert(r.getInt(2) == 8123)
    assert(r.getString(3) == "v")
    assert(r.getString(4) == "/p?k=v")
  }
}
