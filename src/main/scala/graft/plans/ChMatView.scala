package graft.plans

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference}
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructType}

/** CH `CREATE MATERIALIZED VIEW mv ENGINE = AggregatingMergeTree AS
  * SELECT g1, g2, uniqState(k) AS st FROM src GROUP BY g1, g2` — the
  * signature ClickHouse pattern behind every always-fresh uniques
  * dashboard, with CH's exact trigger semantics:
  *
  *  - the MV updates on every INSERT into the source table (the
  *    [[ChInsertIntoCommand]] trigger), folding the inserted batch's
  *    partial sketches into the persisted state — cost
  *    O(batch + groups), never O(history)
  *    ([[graft.streaming.MatView.foldPartial]]);
  *  - data already in the source at CREATE time is NOT included
  *    (CH's rule) unless the statement says `POPULATE`;
  *  - reading the MV yields STATE rows — finish with `uniqMerge(st)`
  *    at any grain, exactly the CH query shape.
  *
  * The supported SELECT shape is the AggregatingMergeTree rollup: any
  * scalar group expressions (aliased), exactly one `uniqState(expr)`
  * aggregate, one source table. Wider MV shapes (sumState etc.) are
  * additive future work — uniqState is the one the Metrica stack
  * leans on.
  */
object ChMatView {

  final case class MvDef(
      name: String,
      srcTable: String,
      stateDir: String,
      groupItems: Seq[(String, String)], // (exprSql, alias)
      keyExprSql: String,
      sketchAlias: String,
      viewSchema: StructType)

  private val registry =
    new java.util.concurrent.ConcurrentHashMap[String, MvDef]()

  def get(name: String): Option[MvDef] = Option(registry.get(name))
  def isMv(name: String): Boolean = registry.containsKey(name)
  def onTable(src: String): Seq[MvDef] = {
    import scala.jdk.CollectionConverters._
    registry.values().asScala.filter(_.srcTable == src).toSeq
  }
  def remove(spark: SparkSession, name: String): Unit = {
    registry.remove(name)
    spark.catalog.dropTempView(name)
  }

  def register(spark: SparkSession, mv: MvDef): Unit = {
    registry.put(mv.name, mv)
    refreshView(spark, mv)
  }

  /** The MV's readable face: the persisted state rows (empty with the
    * declared shape until the first triggering insert).
    */
  def refreshView(spark: SparkSession, mv: MvDef): Unit = {
    val p = new org.apache.hadoop.fs.Path(mv.stateDir)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    val df =
      if (fs.exists(p) && fs.listStatus(p).nonEmpty)
        spark.read.parquet(mv.stateDir)
      else spark.createDataFrame(new java.util.ArrayList[Row](),
        mv.viewSchema)
    df.createOrReplaceTempView(mv.name)
  }

  /** The INSERT trigger: compute the inserted batch's partial
    * sketches with the MV's own expressions and fold them into the
    * state.
    */
  def mergeInsert(spark: SparkSession, mv: MvDef,
      inserted: DataFrame): Unit = {
    val prepared = inserted.selectExpr(
      (mv.groupItems.map { case (e, a) => s"$e AS `$a`" } :+
        s"${mv.keyExprSql} AS `__graft_mv_key`"): _*)
    val partial = prepared
      .groupBy(mv.groupItems.map { case (_, a) => col(s"`$a`") }: _*)
      .agg(hll_sketch_agg(col("`__graft_mv_key`")).as(mv.sketchAlias))
    graft.streaming.MatView.foldPartial(spark, partial, mv.stateDir,
      mv.groupItems.map(_._2), mv.sketchAlias)
    refreshView(spark, mv)
  }

  // -------------------------------------------------------------------
  // SELECT-shape parsing (command time; literals masked so keywords
  // inside strings never split the list)

  private val stringLit = """'(?:[^']|'')*'""".r
  private val uniqStateRe =
    """(?is)^uniqState\s*\((.*)\)(?:\s+AS\s+`?(\w+)`?)?$""".r
  private val aliasedRe = """(?is)^(.*\S)\s+AS\s+`?(\w+)`?$""".r
  private val bareRe = """[A-Za-z_][\w.]*""".r
  private val fromRe = """(?is)\bFROM\s+`?([\w.]+)`?""".r

  final case class ParsedMvSelect(
      groupItems: Seq[(String, String)], // (exprSql, alias)
      keyExprSql: String,
      sketchAlias: String,
      srcTable: String,
      aliasesInOrder: Seq[String]) // select-list output names, in order

  /** Split the select list / find the source table / classify items. */
  def parseSelect(selectSql: String): ParsedMvSelect = {
    val lits = stringLit.findAllIn(selectSql).toVector
    val masked = lits.zipWithIndex.foldLeft(selectSql) {
      case (acc, (l, i)) => acc.replaceFirst(
        java.util.regex.Pattern.quote(l),
        java.util.regex.Matcher.quoteReplacement("" + i + ""))
    }
    def unmask(s: String): String = lits.zipWithIndex.foldLeft(s) {
      case (acc, (l, i)) => acc.replace("" + i + "", l)
    }
    // the select list runs from after SELECT to the depth-0 FROM
    val upper = masked.toUpperCase
    val selStart = upper.indexOf("SELECT") + "SELECT".length
    var i = selStart
    var depth = 0
    var fromAt = -1
    while (i < masked.length && fromAt < 0) {
      masked.charAt(i) match {
        case '(' => depth += 1; i += 1
        case ')' => depth -= 1; i += 1
        case c if c.isLetter && depth == 0 =>
          val w = masked.substring(i).takeWhile(ch =>
            ch.isLetterOrDigit || ch == '_')
          if (w.equalsIgnoreCase("FROM")) fromAt = i else i += w.length
        case _ => i += 1
      }
    }
    require(fromAt > 0, "materialized view select needs a FROM clause")
    val items = splitTop(masked.substring(selStart, fromAt))
    val srcTable = fromRe.findFirstMatchIn(masked.substring(fromAt))
      .map(m => { val t = m.group(1); t.substring(t.lastIndexOf('.') + 1) })
      .getOrElse(throw new IllegalArgumentException(
        "cannot find the materialized view's source table"))
    // classify IN ORDER so the readable view's columns can be named
    // from the select list positionally
    val classified = items.map {
      case uniqStateRe(k, a) =>
        Right((unmask(k), Option(a).getOrElse("st")))
      case aliasedRe(e, a) => Left((unmask(e), a))
      case bare if bareRe.matches(bare) => Left((bare, bare.split('.').last))
      case other => throw new IllegalArgumentException(
        s"materialized view group expression needs an AS alias: $other")
    }
    val sketches = classified.collect { case Right(x) => x }
    require(sketches.length == 1,
      "materialized view needs exactly one uniqState(...) aggregate")
    val (keyExpr, sketchAlias) = sketches.head
    val groupItems = classified.collect { case Left(x) => x }
    require(groupItems.nonEmpty,
      "materialized view needs at least one group column")
    ParsedMvSelect(groupItems, keyExpr, sketchAlias, srcTable,
      classified.map(_.fold(_._2, _._2)))
  }

  private def splitTop(body: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    var depth = 0
    var start = 0
    for (i <- body.indices) body.charAt(i) match {
      case '(' => depth += 1
      case ')' => depth -= 1
      case ',' if depth == 0 => out += body.substring(start, i); start = i + 1
      case _ =>
    }
    out += body.substring(start)
    out.result()
      .map(_.replaceAll("^[ \t\r\n]+|[ \t\r\n]+$", ""))
      .filter(_.nonEmpty)
  }
}

/** Execute the CREATE MATERIALIZED VIEW: parse the rollup shape,
  * register the MV definition + its (initially empty) readable view.
  * `POPULATE` folds the source's CURRENT content in immediately; CH's
  * default excludes pre-existing data, and so does this.
  */
case class ChCreateMvCommand(name: String, populate: Boolean,
    selectSql: String)
    extends LeafRunnableCommand {

  override val output: Seq[Attribute] = Seq(
    AttributeReference("view", StringType, nullable = false)(),
    AttributeReference("state_path", StringType, nullable = false)())

  override def run(spark: SparkSession): Seq[Row] = {
    val ps = ChMatView.parseSelect(selectSql)
    val root = spark.conf.getOption("spark.graft.warehouse")
      .getOrElse(s"${sys.props("java.io.tmpdir")}/graft_warehouse")
    val stateDir = s"$root/$name"
    // analysis-only: the declared shape of the readable view, with
    // columns renamed to the state's names (group aliases + sketch
    // alias) so the empty view and the persisted state agree
    val analyzed = spark.sql(selectSql).schema
    require(analyzed.fields.length == ps.aliasesInOrder.length,
      "materialized view select shape mismatch")
    val viewSchema = StructType(analyzed.fields
      .zip(ps.aliasesInOrder).map { case (f, a) => f.copy(name = a) })
    val mv = ChMatView.MvDef(name, ps.srcTable, stateDir, ps.groupItems,
      ps.keyExprSql, ps.sketchAlias, viewSchema)
    ChMatView.register(spark, mv)
    if (populate)
      ChMatView.mergeInsert(spark, mv, spark.table(ps.srcTable))
    Seq(Row(name, stateDir))
  }
}
