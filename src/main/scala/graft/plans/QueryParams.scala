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

  /** Replace every `{{name}}` in `sqlText`; an unregistered name is a
    * loud error (the alternative is the delegate's opaque parse
    * error on the `{{` token). No-op (zero regex work) for the usual
    * placeholder-free text.
    */
  def substitute(sqlText: String): String =
    if (!sqlText.contains("{{")) sqlText
    else phRe.replaceAllIn(sqlText, m => {
      val v = params.get(m.group(1))
      require(v != null,
        s"query parameter {{${m.group(1)}}} is not set " +
          s"(QueryParams.set/setDate); known: ${params.keySet()}")
      java.util.regex.Matcher.quoteReplacement(v)
    })
}
