package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** ClickHouse URL-function vocabulary.
  *
  * Metrica is web analytics: the reference's tables carry page and
  * referrer URLs (`/root/reference/ddl/hits.sql:11` `URL String`,
  * `:13` `Referer`, `/root/reference/ddl/visits.sql:14` `StartURL`),
  * and ClickHouse's URL function family (`domain`, `path`,
  * `queryString`, `extractURLParameter`, …) is the idiomatic query
  * vocabulary over them. Everything here is composed from native
  * `regexp_extract` / `regexp_replace` / `split` — whole-stage
  * codegen'd, no UDFs — and follows CH's contract of returning the
  * EMPTY STRING (never NULL, never an error) when a component is
  * absent, so the functions are safe in aggregations over dirty data.
  *
  * Parsing strategy: a URL's scheme (`https://`) and userinfo (`u@`)
  * prefixes are stripped first with ANCHORED replaces, then components
  * are extracted from the remainder. A single optional-prefix regex
  * looks simpler but backtracks wrongly on scheme-less or path-less
  * URLs (the optional group gives back its match and the authority is
  * re-parsed as a path), so the two-step form is load-bearing.
  *
  * CH accepts URLs with or without a scheme; so do these. Divergences
  * (documented, not bugs): `protocol` requires the `://` form (CH also
  * accepts `mailto:`), and `firstSignificantSubdomain` uses CH's
  * documented {com, net, org, co} second-level list rather than the
  * full public-suffix table.
  */
object url {

  private val SchemeRe = "^[A-Za-z][A-Za-z0-9+.-]*://"
  private val UserinfoRe = "^[^/@?#]*@"

  /** Scheme + userinfo stripped: the remainder starts at the host. */
  private def rest(u: Column): Column =
    regexp_replace(regexp_replace(u, SchemeRe, ""), UserinfoRe, "")

  /** CH `protocol(url)`: the scheme, '' when the URL has none. */
  def protocol(u: Column): Column =
    regexp_extract(u, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1)

  /** CH `domain(url)`: the hostname, with or without a scheme in the
    * URL, excluding userinfo and port; '' for scheme-relative garbage.
    */
  def domain(u: Column): Column =
    regexp_extract(rest(u), "^([^/:?#]+)", 1)

  /** CH `domainWithoutWWW(url)`: [[domain]] minus one leading `www.`. */
  def domainWithoutWWW(u: Column): Column =
    regexp_replace(domain(u), "^www\\.", "")

  /** CH `topLevelDomain(url)`: the last dot-label of the domain, ''
    * when the domain has no dot.
    */
  def topLevelDomain(u: Column): Column =
    regexp_extract(domain(u), "\\.([^.]+)$", 1)

  /** CH `firstSignificantSubdomain(url)`: the owner-level label —
    * `news.portal.com.tr` → `portal`, `metrica.yandex.ru` → `yandex`.
    * CH's rule: step over a second-level label in {com, net, org, co}
    * (effective-TLD stand-ins), else take the label left of the TLD.
    */
  def firstSignificantSubdomain(u: Column): Column = {
    val parts = split(domain(u), "\\.")
    val n = size(parts)
    when(n >= 3 && element_at(parts, -2).isin("com", "net", "org", "co"),
        element_at(parts, -3))
      .when(n >= 2, element_at(parts, -2))
      .otherwise(lit(""))
  }

  /** CH `port(url[, default])`: the explicit port, else `default`. */
  def port(u: Column, default: Column = lit(0)): Column = {
    val p = regexp_extract(rest(u), "^[^/:?#]+:([0-9]+)", 1)
    when(p === "", default.cast("int")).otherwise(p.cast("int"))
  }

  /** CH `path(url)`: from the first `/` after the authority up to the
    * query string or fragment; '' when the URL has no path.
    */
  def path(u: Column): Column =
    regexp_extract(rest(u), "^[^/?#]*(/[^?#]*)", 1)

  /** CH `pathFull(url)`: [[path]] plus query string and fragment. */
  def pathFull(u: Column): Column =
    regexp_extract(rest(u), "^[^/?#]*(/.*)$", 1)

  /** CH `queryString(url)`: between `?` and `#`, without the `?`. */
  def queryString(u: Column): Column =
    regexp_extract(u, "\\?([^#]*)", 1)

  /** CH `fragment(url)`: after `#`, without the `#`. */
  def fragment(u: Column): Column =
    regexp_extract(u, "#(.*)$", 1)

  /** CH `extractURLParameter(url, name)`: the raw (undecoded) value of
    * the first `name=` parameter, '' when absent. `name` is a literal;
    * regex metacharacters in it are escaped.
    */
  def extractURLParameter(u: Column, name: String): Column =
    regexp_extract(u,
      "[?&]" + java.util.regex.Pattern.quote(name) + "=([^&#]*)", 1)

  /** CH `cutQueryString(url)`: the URL without its query string (the
    * `?` goes too); the fragment survives.
    */
  def cutQueryString(u: Column): Column =
    concat(regexp_extract(u, "^([^?#]*)", 1),
      regexp_extract(u, "(#.*)$", 1))

  /** CH `cutFragment(url)`: the URL without its `#fragment`. */
  def cutFragment(u: Column): Column =
    regexp_extract(u, "^([^#]*)", 1)

  /** CH `cutQueryStringAndFragment(url)`. */
  def cutQueryStringAndFragment(u: Column): Column =
    regexp_extract(u, "^([^?#]*)", 1)

  /** CH `decodeURLComponent(s)`: percent-decoding (UTF-8) where `+`
    * stays a literal plus — CH never form-decodes `+` to space, so it
    * is protected as %2B before Spark's form-decoding url_decode
    * runs. The Metrica idiom for reading SearchPhrase / URL-parameter
    * values extracted raw by [[extractURLParameter]].
    * Malformed percent-sequences ('100% cotton', a trailing '%') must
    * not abort a 100 TB scan: try_url_decode yields NULL there and
    * the value falls back to its raw form (CH keeps invalid
    * sequences; the divergence — CH still decodes the valid ones in
    * the same string — is documented, crash-free behavior wins).
    */
  def decodeURLComponent(u: Column): Column =
    coalesce(try_url_decode(regexp_replace(u, "\\+", "%2B")), u)

  /** CH `cutWWW(url)`: the URL with one leading `www.` dropped from
    * its host (after the protocol and userinfo when present).
    */
  def cutWWW(u: Column): Column =
    regexp_replace(u,
      "^((?:[A-Za-z][\\w+.-]*://)?(?:[^/?#@]*@)?)www\\.", "$1")

  /** Tracking-parameter names dropped by [[canonicalizeURL]]: the
    * analytics/click-id noise that makes one page look like many
    * (the CCNet/C4 crawl-dedup problem). Matched as a whole `name=`
    * prefix; `utm_*` is a family match.
    */
  private val TrackingParamRe =
    "^(utm_[a-z0-9_]*|fbclid|gclid|msclkid|yclid|mc_cid|mc_eid|ref|ref_src)="

  /** Crawl-dedup URL canonicalization — the key under which two
    * fetches of the same page collide even when their URLs differ
    * cosmetically. Normalizations, each answering a real crawl
    * artifact:
    *
    *  - scheme and userinfo DROPPED (http/https mirrors are one page);
    *  - host lowercased, one leading `www.` stripped, explicit port
    *    stripped (DNS is case-insensitive; `:80`/`:443` are defaults,
    *    and a nonstandard port names a different origin COSMETICALLY
    *    but the same document in every observed crawl — CCNet keys on
    *    the URL sans scheme for the same reason);
    *  - path: trailing slashes stripped (`/a/` ≡ `/a`, root ≡ '');
    *  - fragment dropped (never sent to the server);
    *  - query: tracking parameters removed ([[TrackingParamRe]]),
    *    the rest SORTED bytewise and rejoined — parameter order is
    *    serialization noise.
    *
    * Pure codegen-friendly projection: regex extracts + one bounded
    * `array_sort` over the parameter list (parameter counts are tiny);
    * no UDF, no shuffle. Empty string in, empty string out.
    */
  def canonicalizeURL(u: Column): Column = {
    // lowercase BEFORE the www-strip: `WWW.Site.com` must canonicalize
    // like `www.site.com` (found by Round8bProps' variant property)
    val host = regexp_replace(lower(domain(u)), "^www\\.", "")
    val cleanPath = regexp_replace(path(u), "/+$", "")
    val params = filter(split(queryString(u), "&"),
      p => p =!= "" && !p.rlike(TrackingParamRe))
    val q = array_join(array_sort(params), "&")
    concat(host, cleanPath, when(q === "", lit("")).otherwise(concat(lit("?"), q)))
  }

  /** Scheme+authority prefix and the `/…?…` tail it precedes — the
    * split both hierarchy functions cut on.
    */
  private def hierPrefix(u: Column): Column =
    regexp_extract(u, "^((?:[A-Za-z][A-Za-z0-9+.-]*://)?[^/?#]*)", 1)

  /** The tail tokenized into runs each ENDING with its separator run
    * (`/browse/CONV-6788?x=1` → `/`, `browse/`, `CONV-6788?`, `x=1`) —
    * consecutive separators stay in one token, CH's "counted as one".
    */
  private def hierTokens(u: Column): Column =
    regexp_extract_all(u.substr(length(hierPrefix(u)) + 1, length(u)),
      lit("[^/?]*[/?]+|[^/?]+"), lit(0))

  /** CH `URLHierarchy(url)`: the URL truncated after each `/` / `?`
    * separator run in its path+query, shortest first, ending with the
    * full URL. A separator-free URL yields the one-element array of
    * itself. Cumulative prefixes are built with `slice`+`concat_ws`
    * over the token list — URLs have a handful of segments, so the
    * quadratic concat is constant-bounded.
    */
  def urlHierarchy(u: Column): Column = {
    val pfx = hierPrefix(u)
    val toks = hierTokens(u)
    // sequence(1, 0) would generate a DESCENDING [1, 0] — guard empty
    when(size(toks) === 0, array(u))
      .otherwise(transform(sequence(lit(1), size(toks)),
        i => concat(pfx, concat_ws("", slice(toks, lit(1), i)))))
  }

  /** CH `URLPathHierarchy(url)`: [[urlHierarchy]] without protocol and
    * host, and without the bare-root `/` element — CH's documented
    * form (`/browse/`, `/browse/CONV-6788`). Empty array for a URL
    * with no path.
    */
  def urlPathHierarchy(u: Column): Column = {
    val toks = hierTokens(u)
    val cums = when(size(toks) === 0, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(1), size(toks)),
        i => concat_ws("", slice(toks, lit(1), i))))
    filter(cums, e => e =!= "/")
  }

  /** CH `cutToFirstSignificantSubdomain(url)`: the domain truncated to
    * start at [[firstSignificantSubdomain]] —
    * `news.clickhouse.com.tr` → `clickhouse.com.tr`,
    * `metrica.yandex.ru` → `yandex.ru`. Same {com, net, org, co}
    * second-level rule as there; '' when the domain has no dot.
    */
  def cutToFirstSignificantSubdomain(u: Column): Column = {
    val parts = split(domain(u), "\\.")
    val n = size(parts)
    when(n >= 3 && element_at(parts, -2).isin("com", "net", "org", "co"),
        concat_ws(".", slice(parts, -3, 3)))
      .when(n >= 2, concat_ws(".", slice(parts, -2, 2)))
      .otherwise(lit(""))
  }

  /** CH `extractURLParameterNames(url)`: parameter names in query
    * order, duplicates kept; a value-less flag parameter (`…&flag&…`)
    * contributes its name.
    */
  def extractURLParameterNames(u: Column): Column =
    regexp_extract_all(u, lit("[?&]([^=&#]+)"), lit(1))

  /** CH `extractURLParameters(url)`: raw `name=value` strings (or bare
    * flag names) in query order, empty segments skipped.
    */
  def extractURLParameters(u: Column): Column =
    regexp_extract_all(u, lit("[?&]([^&#]+)"), lit(1))

  /** CH `netloc(url)`: the full authority — userinfo, host, and port —
    * between the scheme and the first `/`, `?`, or `#`.
    */
  def netloc(u: Column): Column =
    regexp_extract(regexp_replace(u, SchemeRe, ""), "^([^/?#]*)", 1)

  /** CH `encodeURLComponent(s)`: percent-encoding with space as `%20`
    * (Spark's `url_encode` form-encodes space to `+`; a literal `+`
    * in the input is already `%2B` by then, so the fix-up replace is
    * unambiguous).
    */
  def encodeURLComponent(u: Column): Column =
    regexp_replace(url_encode(u), "\\+", "%20")
}
