package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.LeftAnti
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types._

/** CH clauses that cannot be expressed as a pure text rewrite because
  * their expansion needs the child's resolved schema:
  *
  *  - `LIMIT [offset,] n BY keys` — first n rows per key group under
  *    the scope's ORDER BY. Expands to window-rank + filter, with the
  *    final re-sort kept ABOVE the filter so the global order contract
  *    survives.
  *  - `ORDER BY ax WITH FILL FROM a TO b [STEP s]` — emit a row for
  *    every axis grid value in [a, b) (CH's TO is exclusive), filling
  *    the other columns with CH TYPE DEFAULTS (0 / '' / ...), which are
  *    unknowable until the child resolves.
  *
  * [[graft.plans.TotalsParser]] strips the clause from the SQL text,
  * parses the reduced text with the delegate, and wraps these MARKER
  * nodes around the right subplan; [[ChClauseRule]] (injected as a
  * resolution rule) expands each marker once its child is resolved.
  * The fill expansion is the same never-shuffle-the-data shape as
  * `Relational.fillAxis`: the axis grid is a driver-built
  * LocalRelation (bounds are constants by CH grammar), the present
  * axis values aggregate map-side, the anti-join is broadcast, and the
  * data branch streams into the Union untouched.
  */
case class ChLimitBy(n: Int, offset: Int, keys: Seq[Expression],
    child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(newChild: LogicalPlan): ChLimitBy =
    copy(child = newChild)
}

case class ChWithFill(axis: String, from: Literal, to: Literal,
    step: Option[Literal], interpolate: Seq[String],
    child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(newChild: LogicalPlan): ChWithFill =
    copy(child = newChild)
}

/** CH `FROM t SAMPLE f` (0 < f < 1): the deterministic hash-prefix
  * subset of the table declared `SAMPLE BY <key>` in its DDL
  * (`/root/reference/ddl/hits.sql:119`, `ddl/visits.sql:239`:
  * `SAMPLE BY CounterUserIDHash`). The sample-key declaration travels
  * as FIELD METADATA (`graft.sampleKey`) on the binding's schema —
  * the engine's analogue of the DDL clause — and the rule pushes the
  * sample filter down to the LEAF relation carrying the key, so the
  * scan is reduced before any join/aggregate, exactly like CH.
  * Deterministic and NESTED like CH: SAMPLE 0.1 ⊂ SAMPLE 0.3 (both
  * are prefixes of the same hash order).
  */
case class ChSample(fraction: Double, child: LogicalPlan,
    offset: Double = 0.0) extends UnaryNode {
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(newChild: LogicalPlan): ChSample =
    copy(child = newChild)
}

/** CH `FROM t FINAL` — apply the table engine's merge semantics at
  * read time (`ddl/visits.sql:229-233`:
  * `VersionedCollapsingMergeTree(Sign, Version)`): only the latest
  * LIVE version of each entity is visible. Which columns play key /
  * version / sign travels as FIELD METADATA on the binding's schema
  * (`graft.finalKey` on each key column, `graft.finalVersion`,
  * `graft.finalSign`) — the engine's analogue of the DDL's ENGINE
  * clause, mirroring how `graft.sampleKey` carries `SAMPLE BY`. With
  * no sign stamp the semantics are ReplacingMergeTree's (latest
  * version wins, nothing cancels). `tables` carries the names that
  * were marked FINAL in the text, so OTHER stamped tables in the
  * same query stay raw. The expansion reuses
  * [[graft.operators.Relational.latestVersions]] — every stage
  * clusters on the entity key (zero Exchange off a key-bucketed
  * warehouse, one fact shuffle otherwise), state bounded per (key)
  * group, the same shape `Warehouse.compact` runs at scale.
  */
case class ChFinal(tables: Seq[String], child: LogicalPlan)
    extends UnaryNode {
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(newChild: LogicalPlan): ChFinal =
    copy(child = newChild)
}

/** CH `a ASOF [LEFT] JOIN b ON a.k = b.k AND a.t >= b.t` — for every
  * left row, the single right row with the same key and the latest
  * `b.t <= a.t`. The parser strips `ASOF` (the reduced text parses as
  * a plain join) and marks the plan; the rule rewrites the Join node
  * whose condition carries the >= conjunct into
  * [[graft.operators.Relational.asofJoin]] — the two-pass prefix-scan
  * shape, never the equi-match-then-filter pair blowup. ASOF JOIN
  * (inner) drops left rows with no prior right row; ASOF LEFT JOIN
  * keeps them with NULLs, exactly CH. Only the `>=` direction is
  * expressible (CH's other directions are rare and API-reachable).
  */
case class ChAsofJoin(child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(newChild: LogicalPlan): ChAsofJoin =
    copy(child = newChild)
}

/** CH/ANSI `LIMIT n WITH TIES`: the first n rows of the scope's
  * ORDER BY plus every row tying with the nth. Expanded WITHOUT a
  * global rank window (a partition-less window funnels the relation
  * through one task): the nth key is computed once from the sorted
  * prefix — `limit(n)` then max/min, a driver-sized action — and the
  * result is a map-side `key <= boundary` filter under the original
  * sort. NULL keys order first (Spark asc default) and tie as a
  * group, so they pass the filter whenever they are reachable.
  */
case class ChLimitTies(n: Int, child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(newChild: LogicalPlan): ChLimitTies =
    copy(child = newChild)
}

/** CH `ANY` join strictness (`a ANY LEFT JOIN b` / `a LEFT ANY JOIN
  * b`): each left row matches AT MOST ONE right row per key. CH picks
  * an arbitrary matching row; this engine picks the MINIMUM right row
  * in full-column order — deterministic, so results replay across
  * engines and runs. The rule reduces the RIGHT side to one row per
  * join key (window rank = 1 — Spark's WindowGroupLimit trims it
  * map-side) and keeps the Join node untouched, which preserves
  * attribute ids and lets the planner keep broadcasting small right
  * sides. Same reduce-before-join shape as
  * [[graft.operators.Relational.anyLeftJoin]].
  */
case class ChAnyJoin(child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(newChild: LogicalPlan): ChAnyJoin =
    copy(child = newChild)
}

case class ChClauseRule(spark: SparkSession) extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.resolveOperatorsUp {
      case ChLimitBy(n, off, keys, child)
          if child.resolved && keys.forall(_.resolved) =>
        rewriteLimitBy(n, off, keys, child)
      case ChWithFill(ax, from, to, step, interp, child) if child.resolved =>
        rewriteFill(ax, from, to, step, interp, child)
      case ChSample(f, child, o) if child.resolved =>
        pushSample(f, o, child)
      case ChFinal(tables, child) if child.resolved =>
        applyFinal(tables, child)
      case ChAsofJoin(child) if child.resolved =>
        applyAsof(child)
      case ChAnyJoin(child) if child.resolved =>
        applyAny(child)
      case ChLimitTies(n, child) if child.resolved =>
        applyLimitTies(n, child)
    }

  /** Expand LIMIT WITH TIES: boundary key from the sorted n-prefix,
    * then a filter under the original Sort. Single sort axis only —
    * a lexicographic multi-key boundary comparison needs per-key
    * direction handling that CH queries in the wild don't exercise;
    * reject loudly instead of guessing.
    */
  private def applyLimitTies(n: Int, child: LogicalPlan): LogicalPlan = {
    if (n == 0) return GlobalLimit(Literal(0), LocalLimit(Literal(0), child))
    // the scope's global Sort: directly, or under the Project the
    // analyzer adds when the sort key is not in the output list
    val (sort, rebuild): (Sort, LogicalPlan => LogicalPlan) = child match {
      case s @ Sort(_, true, _, _) => (s, identity)
      case p @ Project(_, s @ Sort(_, true, _, _)) =>
        (s, x => p.copy(child = x))
      case _ => throw new IllegalArgumentException(
        "LIMIT WITH TIES needs an ORDER BY in its scope")
    }
    require(sort.order.length == 1,
      "LIMIT WITH TIES supports exactly one sort axis — stage " +
        "multi-key orders through a computed struct column")
    val ord = sort.order.head
    val keyCol = org.apache.spark.sql.GraftSqlBridge.column(ord.child)
    import org.apache.spark.sql.GraftSqlBridge.ofRows
    import org.apache.spark.sql.functions.{max, min}
    val limited = ofRows(spark,
      GlobalLimit(Literal(n), LocalLimit(Literal(n), sort)))
    import org.apache.spark.sql.functions.count
    val bRow = limited
      .agg(if (ord.direction == Ascending) max(keyCol) else min(keyCol),
        count(keyCol), count(org.apache.spark.sql.functions.lit(1)))
      .collect().head
    val boundary = bRow.get(0)
    // whether the n-prefix reached into the NULL group: under
    // nulls-last a non-null boundary alone cannot tell (max/min
    // ignore nulls), so the row counts carry the signal
    val prefixHasNull = bRow.getLong(1) < bRow.getLong(2)
    val bLit = Literal.create(boundary, ord.child.dataType)
    val cmp =
      if (ord.direction == Ascending) LessThanOrEqual(ord.child, bLit)
      else GreaterThanOrEqual(ord.child, bLit)
    // NULL keys follow the sort's null placement: nulls-first means
    // any non-null boundary sits past the whole null group, so nulls
    // always pass; nulls-last means the null group ties in only when
    // the prefix actually reached it (its last row is null — the
    // whole group is then the tie), detected via the counts above
    val cond = ord.nullOrdering match {
      case NullsFirst => Or(IsNull(ord.child), cmp)
      case NullsLast =>
        if (boundary == null) IsNull(ord.child)
        else if (prefixHasNull) Or(IsNull(ord.child), cmp)
        else cmp
    }
    rebuild(sort.copy(child = Filter(cond, sort.child)))
  }

  /** Reduce the marked join's right side to one deterministic row per
    * key. The marker wraps the whole scope, so like ASOF the target
    * is found by shape: exactly one join may be in scope, otherwise
    * the statement is rejected rather than guessing which join
    * carried ANY.
    */
  private def applyAny(child: LogicalPlan): LogicalPlan = {
    def conjuncts(e: Expression): Seq[Expression] = e match {
      case And(a, b) => conjuncts(a) ++ conjuncts(b)
      case other => Seq(other)
    }
    val joins = child.collectWithSubqueries { case j: Join => j }
    require(joins.length == 1,
      s"ANY JOIN: expected exactly one join in scope, found " +
        s"${joins.length} — stage other joins through views")
    child.transformUpWithSubqueries {
      case Join(_, _, _, None, _) => throw new IllegalArgumentException(
        "ANY JOIN needs an ON condition with equality conjuncts")
      case j @ Join(l, r, joinType, Some(cond), _) =>
        joinType match {
          case org.apache.spark.sql.catalyst.plans.Inner |
               org.apache.spark.sql.catalyst.plans.LeftOuter =>
          case other => throw new IllegalArgumentException(
            s"ANY JOIN supports inner/left, got $other")
        }
        val rKeys: Seq[Attribute] = conjuncts(cond).map {
          case EqualTo(a: Attribute, b: Attribute)
              if l.outputSet.contains(a) && r.outputSet.contains(b) => b
          case EqualTo(b: Attribute, a: Attribute)
              if l.outputSet.contains(a) && r.outputSet.contains(b) => b
          case other => throw new IllegalArgumentException(
            s"ANY JOIN supports attribute-equality conjuncts only, " +
              s"got $other")
        }
        val order = r.output.map(a => SortOrder(a, Ascending))
        val frame = SpecifiedWindowFrame(RowFrame,
          UnboundedPreceding, CurrentRow)
        val rn = Alias(WindowExpression(RowNumber(),
          WindowSpecDefinition(rKeys, order, frame)), "__graft_any_rn")()
        val windowed = Window(Seq(rn), rKeys, order, r)
        val filtered = Filter(EqualTo(rn.toAttribute, Literal(1)), windowed)
        // project back to the right side's own attributes (ids kept),
        // so the Join node and everything above it stay bound
        j.copy(right = Project(r.output, filtered))
    }
  }

  /** Rewrite the (single) marked Join into the asof operator. The
    * replacement keeps the Join's output attribute ids via forced-id
    * aliases, so references above stay bound. The marker wraps the
    * whole plan, so the target join is found by SHAPE — exactly one
    * join in scope may carry a time-bound conjunct, otherwise the
    * statement is rejected rather than risking a silent rewrite of
    * the wrong join (a query mixing ASOF with a plain range join, or
    * using two ASOF joins, must split into staged views).
    */
  private def applyAsof(child: LogicalPlan): LogicalPlan = {
    def conjuncts(e: Expression): Seq[Expression] = e match {
      case And(a, b) => conjuncts(a) ++ conjuncts(b)
      case other => Seq(other)
    }
    def isBound(e: Expression): Boolean = e match {
      case _: GreaterThanOrEqual | _: LessThanOrEqual => true
      case _ => false
    }
    val candidates = child.collectWithSubqueries {
      case j @ Join(_, _, _, Some(cond), _)
          if conjuncts(cond).exists(isBound) => j
    }
    require(candidates.length == 1,
      s"ASOF JOIN: expected exactly one join with a time-bound " +
        s"conjunct in scope, found ${candidates.length} — stage " +
        "additional range/asof joins through views")
    var done = false
    val out = child.transformUpWithSubqueries {
      case j @ Join(l, r, joinType, Some(cond), _) if !done &&
          conjuncts(cond).exists(isBound) =>
        done = true
        val lSet = l.outputSet
        val rSet = r.outputSet
        val parts = conjuncts(cond)
        val eqPairs = parts.collect {
          case EqualTo(a: Attribute, b: Attribute)
              if lSet.contains(a) && rSet.contains(b) => (a, b)
          case EqualTo(b: Attribute, a: Attribute)
              if lSet.contains(a) && rSet.contains(b) => (a, b)
        }
        val ineqs = parts.collect {
          case GreaterThanOrEqual(lt: Attribute, rt: Attribute)
              if lSet.contains(lt) && rSet.contains(rt) => (lt, rt)
          case LessThanOrEqual(rt: Attribute, lt: Attribute)
              if lSet.contains(lt) && rSet.contains(rt) => (lt, rt)
        }
        require(eqPairs.nonEmpty,
          "ASOF JOIN needs at least one equality conjunct")
        require(ineqs.length == 1,
          "ASOF JOIN needs exactly one left >= right time conjunct")
        require(parts.length == eqPairs.length + 1,
          "ASOF JOIN supports equality conjuncts plus ONE >= bound")
        val (lt, rt) = ineqs.head
        import org.apache.spark.sql.GraftSqlBridge.ofRows
        import org.apache.spark.sql.functions.{col => fcol}
        val leftDf = ofRows(spark, l)
        // right columns rename to collision-proof temp names; the key
        // columns take their LEFT partner's temp-free name so the
        // equi-join keys align
        val rAttrs = r.output
        val tmpNames = rAttrs.indices.map(i => s"__graft_asof_r$i")
        val rightDf = ofRows(spark, r).toDF(tmpNames: _*)
        def tmpOf(a: Attribute): String =
          tmpNames(rAttrs.indexWhere(_.exprId == a.exprId))
        // align key names: temp right frame gets the left key names
        val keyedRight = eqPairs.foldLeft(rightDf) { case (df, (la, ra)) =>
          df.withColumnRenamed(tmpOf(ra), la.name + "__graft_asof_k")
        }
        val keyedLeft = eqPairs.foldLeft(leftDf) { case (df, (la, _)) =>
          df.withColumn(la.name + "__graft_asof_k",
            fcol(s"`${la.name}`"))
        }
        val keyNames = eqPairs.map(_._1.name + "__graft_asof_k")
        val rightPayload = rAttrs.filterNot(a =>
          eqPairs.exists(_._2.exprId == a.exprId)).map(tmpOf)
        val joined = graft.operators.Relational.asofJoin(
          keyedLeft, keyedRight, keyNames,
          leftTime = lt.name, rightTime = tmpOf(rt),
          rightCols = rightPayload)
        // inner semantics: a left row with no prior right row drops
        val filtered = joinType match {
          case org.apache.spark.sql.catalyst.plans.Inner =>
            joined.filter(fcol(s"`${tmpOf(rt)}`").isNotNull)
          case org.apache.spark.sql.catalyst.plans.LeftOuter => joined
          case other => throw new IllegalArgumentException(
            s"ASOF JOIN supports inner/left, got $other")
        }
        // project back to the Join's own output: left attrs, then
        // right attrs. Right KEY columns re-emit from the left
        // partner (equal by the join condition) but only for MATCHED
        // rows — an unmatched ASOF LEFT row carries NULL right keys
        // like any outer join, gated on the right time column's
        // null-ness
        val analyzed = filtered.queryExecution.analyzed
        val byName = analyzed.output.map(a => a.name -> a).toMap
        val matchedRt = byName(tmpOf(rt))
        val projected = j.output.map { oa =>
          val src: Expression =
            if (lSet.contains(oa)) byName(oa.name)
            else eqPairs.find(_._2.exprId == oa.exprId) match {
              case Some((la, _)) =>
                If(IsNotNull(matchedRt),
                  byName(la.name + "__graft_asof_k"),
                  Literal(null, oa.dataType))
              case None => byName(tmpOf(oa))
            }
          Alias(src, oa.name)(exprId = oa.exprId)
        }
        Project(projected, analyzed)
    }
    require(done,
      "ASOF JOIN: no join with a left >= right conjunct found")
    out
  }

  /** Rewrite the marked tables' stamped relations into their
    * latest-live-version view. Matching is by SubqueryAlias name
    * (the view/binding name the FROM clause used), descending into
    * subquery expressions too; when no alias matches (the name was
    * rewritten away by nested views), the lowest stamped relation
    * anywhere in the plan collapses as a fallback. The rewritten
    * subtree KEEPS the relation's attribute ids (filters / anti-join
    * / window preserve the left branch's attributes), so references
    * above the marker stay bound.
    */
  private def applyFinal(tables: Seq[String],
      child: LogicalPlan): LogicalPlan = {
    val verFlag = "graft.finalVersion"
    val sumFlag = "graft.finalSum"
    val resolver = spark.sessionState.conf.resolver
    var applied = false
    def collapse(rel: LogicalPlan): LogicalPlan = {
      applied = true
      val keys = rel.output.filter(_.metadata.contains("graft.finalKey"))
        .map(_.name)
      require(keys.nonEmpty,
        "FINAL: relation declares collapsing metadata but no graft.finalKey")
      import org.apache.spark.sql.GraftSqlBridge.ofRows
      import org.apache.spark.sql.functions.{col => fcol, coalesce, lit,
        min, row_number, sum}
      import org.apache.spark.sql.expressions.{Window => W}
      val df = ofRows(spark, rel)
      val sums = rel.output.filter(_.metadata.contains(sumFlag))
      if (sums.nonEmpty) {
        // SummingMergeTree: one row per key — sum columns summed back
        // to their declared type (CH keeps the column type; overflow
        // wraps), every other non-key column takes its group MINIMUM
        // (CH leaves it "any value from the set"; a deterministic
        // choice is what lets results replay). A merged row whose sum
        // columns are ALL zero is dropped — CH's documented
        // SummingMergeTree cleanup.
        val sumNames = sums.map(_.name).toSet
        val aggs = rel.output.filterNot(a => keys.contains(a.name)).map {
          a =>
            if (sumNames(a.name))
              sum(fcol(s"`${a.name}`")).cast(a.dataType).as(a.name)
            else min(fcol(s"`${a.name}`")).as(a.name)
        }
        val grouped = df.groupBy(keys.map(c => fcol(s"`$c`")): _*)
          .agg(aggs.head, aggs.tail: _*)
        val anyNonZero = sums.map(a =>
            coalesce(fcol(s"`${a.name}`") =!= lit(0), lit(false)))
          .reduce(_ || _)
        // the Aggregate mints fresh attribute ids; outer operators
        // still reference the ORIGINAL relation's ids, so re-alias
        // each output back to its old exprId (the version path below
        // needs none of this — window+filter keep the child's attrs)
        val collapsed = grouped.filter(anyNonZero)
          .select(rel.output.map(a => fcol(s"`${a.name}`")): _*)
          .queryExecution.analyzed
        Project(rel.output.map { old =>
          val fresh = collapsed.output.find(_.name == old.name).get
          Alias(fresh, old.name)(exprId = old.exprId,
            qualifier = old.qualifier,
            explicitMetadata = Some(old.metadata))
        }, collapsed)
      } else {
        val ver = rel.output.find(_.metadata.contains(verFlag)).get.name
        val sign = rel.output.find(_.metadata.contains("graft.finalSign"))
          .map(_.name)
        val fin = sign match {
          case Some(sc) =>
            graft.operators.Relational.latestVersions(df, keys, ver, sc)
          case None => // ReplacingMergeTree: latest version, no cancels
            df.withColumn("__graft_rn", row_number().over(
                W.partitionBy(keys.map(fcol): _*).orderBy(fcol(ver).desc)))
              .filter(fcol("__graft_rn") === 1).drop("__graft_rn")
        }
        // same re-alias dance as the sum branch: the round-12
        // latestVersions is aggregation-shaped and mints fresh
        // attribute ids in its output Project, while outer operators
        // still reference the ORIGINAL relation's ids
        val collapsed = fin
          .select(rel.output.map(a => fcol(s"`${a.name}`")): _*)
          .queryExecution.analyzed
        Project(rel.output.map { old =>
          val fresh = collapsed.output.find(_.name == old.name).get
          Alias(fresh, old.name)(exprId = old.exprId,
            qualifier = old.qualifier,
            explicitMetadata = Some(old.metadata))
        }, collapsed)
      }
    }
    def stamped(p: LogicalPlan): Boolean =
      p.output.exists(a =>
        a.metadata.contains(verFlag) || a.metadata.contains(sumFlag))
    val byName = child.transformUpWithSubqueries {
      case sa @ SubqueryAlias(id, inner)
          if tables.exists(t => resolver(t, id.name)) && stamped(inner) &&
            // lowest matching alias only (nested aliases of the same
            // name would otherwise collapse twice)
            !inner.exists {
              case SubqueryAlias(id2, inner2) =>
                tables.exists(t => resolver(t, id2.name)) && stamped(inner2)
              case _ => false
            } =>
        sa.copy(child = collapse(inner))
    }
    if (applied) return byName
    // fallback: the alias was erased (nested views). Collapsing "by
    // shape" is only safe when the plan holds exactly ONE stamped
    // leaf subtree — with two stamped tables (one read FINAL through
    // a view, one joined raw) a shape-match would collapse both and
    // silently drop the raw table's pre-collapse rows. Ambiguity is
    // an error, not a guess.
    val stampedLeaves = child.collectWithSubqueries {
      case rel if stamped(rel) && rel.children.forall(c => !stamped(c)) =>
        rel
    }
    require(stampedLeaves.nonEmpty,
      "FINAL: no relation in scope declares collapsing metadata " +
        "(graft.finalVersion / graft.finalKey field metadata — the " +
        "DDL's VersionedCollapsingMergeTree clause)")
    require(stampedLeaves.size == 1,
      s"FINAL on ${tables.mkString(", ")}: the name matches no alias in " +
        s"the plan and ${stampedLeaves.size} collapsing-stamped relations " +
        "are in scope — cannot tell which one FINAL names. Alias the " +
        "FINAL table in the FROM clause (FROM t AS name FINAL) so the " +
        "marker can bind to it.")
    val target = stampedLeaves.head
    child.transformUpWithSubqueries {
      case rel if rel eq target => collapse(rel)
    }
  }

  /** Push the sample filter to the leaf relation whose output declares
    * the sample key (`graft.sampleKey` field metadata). Hash choice:
    * `graft.samplePortable` metadata selects a pure-arithmetic
    * multiplicative hash (Knuth 2654435761 on the key's low 16 bits —
    * replicable in any SQL engine, used by the correctness harness);
    * the default is xxhash64, the cheap production path.
    */
  private def pushSample(f: Double, o: Double,
      child: LogicalPlan): LogicalPlan = {
    require(f > 0 && f < 1, s"SAMPLE fraction must be in (0, 1), got $f")
    require(o >= 0 && o + f <= 1,
      s"SAMPLE OFFSET must satisfy 0 <= offset and offset+fraction <= 1," +
        s" got offset=$o fraction=$f")
    val flag = "graft.sampleKey"
    var applied = false
    // the LOWEST node exposing the stamped key takes the filter (a
    // declared-schema scan exposes it at the leaf; a view that stamps
    // via an alias exposes it at its Project) — transformUp visits
    // children first, so the scan is reduced before joins/aggregates
    val out = child.transformUp {
      case rel if !applied && rel.output.exists(_.metadata.contains(flag)) =>
        applied = true
        val key = rel.output.find(_.metadata.contains(flag)).get
        Filter(sampleCond(key, f, o), rel)
    }
    require(applied,
      "SAMPLE: no table in scope declares a sample key " +
        "(graft.sampleKey field metadata — the DDL's SAMPLE BY)")
    out
  }

  // built as RESOLVED catalyst expressions (not bridged Columns, which
  // stay unresolved until an analyzer pass — but the enclosing View's
  // invariant checks child.resolved the moment the tree is copied).
  // OFFSET shifts the kept hash window to [o, o+f) of the space —
  // disjoint offsets give DISJOINT samples over the same key (CH's
  // parallel-workers contract), and offset 0 keeps the plain-SAMPLE
  // nesting property (the o=0 lower bound folds away).
  private def sampleCond(key: Attribute, f: Double, o: Double): Expression = {
    def window(h: Expression, space: Long): Expression = {
      val hi = LessThan(h, Literal(((o + f) * space).toLong))
      if (o == 0.0) hi
      else And(GreaterThanOrEqual(h, Literal((o * space).toLong)), hi)
    }
    if (key.metadata.contains("graft.samplePortable")) {
      val h = Pmod(Multiply(Pmod(Cast(key, LongType), Literal(65536L)),
        Literal(2654435761L)), Literal(4294967296L))
      window(h, 4294967296L)
    } else
      window(Pmod(new XxHash64(Seq(key)), Literal(1L << 24)), 1L << 24)
  }

  /** CH applies LIMIT BY after ORDER BY: when the marker sits on a
    * Sort, the rank window reuses the sort order (computed on the
    * UNSORTED child — the window's partition-local sort is all it
    * needs) and the global Sort re-applies above the filter. Without
    * an ORDER BY the keys themselves order (CH would use stream
    * order, which a distributed engine cannot reproduce).
    */
  private def rewriteLimitBy(n: Int, off: Int, keys: Seq[Expression],
      child: LogicalPlan): LogicalPlan = child match {
    case Sort(order, true, inner, _) =>
      Sort(order, global = true, limitByCore(n, off, keys, order, inner))
    case _ =>
      limitByCore(n, off, keys,
        keys.map(k => SortOrder(k, Ascending)), child)
  }

  private def limitByCore(n: Int, off: Int, keys: Seq[Expression],
      order: Seq[SortOrder], child: LogicalPlan): LogicalPlan = {
    val rn = Alias(WindowExpression(RowNumber(),
      WindowSpecDefinition(keys, order, UnspecifiedFrame)), "__graft_rn")()
    val windowed = Project(child.output :+ rn, child)
    val rnRef = rn.toAttribute
    val cond =
      if (off > 0) And(GreaterThan(rnRef, Literal(off)),
        LessThanOrEqual(rnRef, Literal(off + n)))
      else LessThanOrEqual(rnRef, Literal(n))
    Project(child.output, Filter(cond, windowed))
  }

  private def rewriteFill(axName: String, from: Literal, to: Literal,
      stepOpt: Option[Literal], interp: Seq[String],
      child: LogicalPlan): LogicalPlan = {
    val resolver = spark.sessionState.conf.resolver
    val axisAttr = child.output.find(a => resolver(a.name, axName))
      .getOrElse(throw new IllegalArgumentException(
        s"WITH FILL axis `$axName` is not an output column of the query"))
    def asLong(l: Literal): Long = l.value match {
      case i: Int => i.toLong
      case l2: Long => l2
      case s: Short => s.toLong
      case b: Byte => b.toLong
      case other => throw new IllegalArgumentException(
        s"WITH FILL bound must be integral or date, got $other")
    }
    // step: plain integer, or INTERVAL n DAY on a date axis
    val step: Long = stepOpt.fold(1L) { s =>
      s.value match {
        case iv: org.apache.spark.unsafe.types.CalendarInterval
            if iv.months == 0 && iv.microseconds == 0 => iv.days.toLong
        case _ => asLong(s)
      }
    }
    require(step > 0, "WITH FILL STEP must be positive")
    // an inverted range fills nothing (matching the combinators);
    // data rows still pass through unchanged
    if (asLong(from) >= asLong(to)) return child
    // Compose the expansion through the DATASET API and hand back the
    // analyzed subtree: the fill's anti-join branch references `child`
    // a second time, and an eagerly-analyzed Dataset runs relation
    // dedup atomically — hand-building the same Union mid-fixpoint
    // leaves the duplicate ids half-rewritten (observed: the dedup pass
    // re-instanced a temp view's relation under the hand-built
    // Aggregate without remapping the Aggregate itself). The shape is
    // Relational.fillAxis's: data branch untouched, range-bounded
    // distinct, broadcast anti-join, union. The grid itself is
    // generated LAZILY executor-side (sequence + explode, like the
    // combinators) — a driver-side LocalRelation would materialize a
    // `FROM 0 TO 1e9 STEP 1` grid in analyzer heap.
    import org.apache.spark.sql.GraftSqlBridge.{column, ofRows}
    import org.apache.spark.sql.functions.{col => fcol, explode, lit,
      sequence, expr}
    val one = ofRows(spark,
      LocalRelation(Seq.empty[Attribute], Seq(InternalRow.empty)))
    val axisDf = axisAttr.dataType match {
      case DateType =>
        require(from.dataType == DateType && to.dataType == DateType,
          "WITH FILL bounds on a date axis must be DATE literals")
        one.select(explode(sequence(column(from), column(to),
            expr(s"interval $step day"))).as(axisAttr.name))
          .filter(fcol(axisAttr.name) < column(to)) // CH TO is exclusive
      case dt @ (LongType | IntegerType | ShortType) =>
        one.select(explode(sequence(lit(asLong(from)), lit(asLong(to)),
            lit(step))).as(axisAttr.name))
          .filter(fcol(axisAttr.name) < lit(asLong(to)))
          .select(fcol(axisAttr.name).cast(dt).as(axisAttr.name))
      case other => throw new IllegalArgumentException(
        s"WITH FILL supports date/integral axes, got $other")
    }
    val inRange = column(And(GreaterThanOrEqual(axisAttr, from),
      LessThan(axisAttr, to)))
    // missing grid rows carry CH TYPE DEFAULTS (0 / '' / epoch ...);
    // fall back to NULL where no default exists for the type
    val defaults = child.output.filterNot(_.exprId == axisAttr.exprId)
      .map(a => a.name -> column(
        scala.util.Try(Literal.default(a.dataType))
          .getOrElse(Literal(null, a.dataType))))
    // INTERPOLATE columns must be output columns other than the axis;
    // only the bare carry-forward form is supported (CH's `col AS
    // expr` recomputes from the PREVIOUS row — a sequential recursion
    // with no bounded relational form; reject loudly, never guess)
    val interpCols = interp.map { raw =>
      require(!raw.toUpperCase.contains(" AS "),
        "INTERPOLATE (col AS expr) is not supported — only the " +
          "carry-forward form INTERPOLATE (col, ...)")
      val name = raw.replace("`", "").trim
      require(child.output.exists(a => resolver(a.name, name)),
        s"INTERPOLATE column `$name` is not an output column")
      require(!resolver(name, axisAttr.name),
        s"INTERPOLATE column `$name` is the fill axis itself")
      name
    }
    graft.operators.Relational.fillAxis(ofRows(spark, child),
        axisAttr.name, axisDf, inRange, defaults, interpCols)
      .queryExecution.analyzed
  }
}
