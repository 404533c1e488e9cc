package graft.plans

/** DataLens-style `{{parameter}}` placeholders
  * (`/root/reference/README.md:80-81,111-112`: the charts' queries are
  * written with `{{interval_from}}` / `{{interval_to}}` and DataLens
  * substitutes the dashboard's date-interval parameter before the
  * query reaches ClickHouse). The engine's analogue: a JVM-wide
  * parameter registry (matching the Catalog / Dictionaries pattern)
  * consulted by the injected parser, which substitutes placeholders
  * BEFORE any other processing — so the README's chart queries run
  * byte-verbatim, placeholders included.
  *
  * Values are SQL fragments substituted verbatim (DataLens renders a
  * typed parameter to a literal the same way); [[setDate]] is the
  * date-interval convenience that renders `DATE '...'`.
  */
object QueryParams {

  private val params =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** Register `{{name}}` → the given SQL fragment (substituted
    * verbatim — quote literals yourself or use [[setDate]]).
    */
  def set(name: String, sqlFragment: String): Unit =
    params.put(name, sqlFragment)

  /** Register `{{name}}` → `DATE '<iso>'` (the date-interval type the
    * reference's charts use; README.md:73 "параметр с именем interval
    * и типом date-interval").
    */
  def setDate(name: String, isoDate: String): Unit = {
    require(isoDate.matches("""\d{4}-\d{2}-\d{2}"""),
      s"setDate expects YYYY-MM-DD, got '$isoDate'")
    set(name, s"DATE '$isoDate'")
  }

  def remove(name: String): Unit = params.remove(name)
  def clear(): Unit = params.clear()

  private val phRe = """\{\{\s*([A-Za-z_][\w.-]*)\s*\}\}""".r

  /** Replace every REGISTERED `{{name}}` in `sqlText`; unregistered
    * placeholders stay untouched — `'{{x}}'` inside a string literal
    * is valid Spark SQL that must keep meaning (DataLens texts with a
    * forgotten parameter instead fail at parse, where the parser adds
    * a QueryParams hint via [[unresolved]]). Returns the text and
    * whether any substitution happened (the gate for the CH
    * bracket-index rewrite). No-op for placeholder-free text.
    */
  def substitute(sqlText: String): (String, Boolean) =
    if (!sqlText.contains("{{")) (sqlText, false)
    else {
      var any = false
      val out = phRe.replaceAllIn(sqlText, m => {
        params.get(m.group(1)) match {
          case null => java.util.regex.Matcher.quoteReplacement(m.matched)
          case v =>
            any = true
            java.util.regex.Matcher.quoteReplacement(v)
        }
      })
      (out, any)
    }

  /** The unregistered placeholder names in `sqlText` (for the parse-
    * failure hint).
    */
  def unresolved(sqlText: String): Seq[String] =
    phRe.findAllMatchIn(sqlText).map(_.group(1)).distinct.toSeq
      .filterNot(params.containsKey)
}
