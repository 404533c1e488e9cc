package graft.plans

import java.nio.ByteBuffer

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.types.{DataType, DoubleType, LongType}

/** Rank-based statistical test aggregates backing the engine's
  * `mannWhitneyUTest`, `kolmogorovSmirnovTest`, and `rankCorr` —
  * ClickHouse's nonparametric test family
  * (`clickhouse.com/docs/sql-reference/aggregate-functions/reference/
  * mannwhitneyutest`, `…/kolmogorovsmirnovtest`, `…/rankCorr`).
  *
  * Determinism policy (the q137 lesson, applied preemptively): every
  * statistic here is a pure function of EXACT integers — rank sums
  * over Long inputs with ties at mid-rank (tracked ×2 so they stay
  * integral), cumulative-count differences, squared rank deltas — all
  * folded in BigInt, converted to Double only in the FINAL one or two
  * IEEE operations. The DuckDB oracle derives the same integers with
  * window functions and applies the same final ops, so both engines
  * produce bit-identical doubles: no tolerance, no round-boundary
  * flake in the hashed surface.
  *
  * Departure from CH, documented: CH returns `(statistic, p_value)`
  * tuples; the p-values come from asymptotic-approximation families
  * (normal / Kolmogorov / Student-t CDFs) whose polynomial
  * implementations differ across libraries, so they can never be in
  * an exactly-hashed surface. This engine returns the STATISTIC only;
  * a caller needing significance applies their own CDF downstream.
  *
  * Inputs are cast to Long (integer-valued analysis columns — the
  * engine's deterministic-hash policy; a float measurement column
  * should be quantized by the caller first, which any reproducible
  * pipeline wants anyway).
  *
  * Scale: the buffer is the group's (x, y) pair list — rank tests are
  * whole-group statistics with no sublinear sufficient statistic (the
  * windowFunnel caveat: per-GROUP state, bounded by the group, not
  * the table). Partials merge by concatenation, so map-side combine
  * still cuts shuffle rows when a group spans partitions; the 100 TB
  * shape is many bounded groups (per-cohort tests), not one
  * corpus-sized group.
  */
case class RankTestAgg(
    left: Expression,
    right: Expression,
    kind: String,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ArrayBuffer[(Long, Long)]]
  with ImplicitCastInputTypes with BinaryLike[Expression] {

  require(RankTestAgg.Kinds.contains(kind),
    s"RankTestAgg kind must be one of ${RankTestAgg.Kinds.mkString(", ")}, got $kind")

  override def inputTypes: Seq[DataType] = Seq(LongType, LongType)
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = kind

  override def createAggregationBuffer(): ArrayBuffer[(Long, Long)] =
    ArrayBuffer.empty

  override def update(buf: ArrayBuffer[(Long, Long)],
      input: InternalRow): ArrayBuffer[(Long, Long)] = {
    val a = left.eval(input)
    val b = right.eval(input)
    if (a != null && b != null)
      buf += ((a.asInstanceOf[Long], b.asInstanceOf[Long]))
    buf
  }

  override def merge(b1: ArrayBuffer[(Long, Long)],
      b2: ArrayBuffer[(Long, Long)]): ArrayBuffer[(Long, Long)] = b1 ++= b2

  override def eval(buf: ArrayBuffer[(Long, Long)]): Any = kind match {
    case "mannWhitneyUTest"      => RankTestAgg.mannWhitneyU(buf)
    case "kolmogorovSmirnovTest" => RankTestAgg.ksD(buf)
    case "rankCorr"              => RankTestAgg.rankCorr(buf)
  }

  override def serialize(buf: ArrayBuffer[(Long, Long)]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 16 * buf.length)
    bb.putInt(buf.length)
    buf.foreach { case (a, b) => bb.putLong(a); bb.putLong(b) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): ArrayBuffer[(Long, Long)] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new ArrayBuffer[(Long, Long)](n)
    var i = 0
    while (i < n) { buf += ((bb.getLong, bb.getLong)); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): RankTestAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): RankTestAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): RankTestAgg =
    copy(left = newLeft, right = newRight)
}

/** Largest-Triangle-Three-Buckets downsampling — CH's
  * `largestTriangleThreeBuckets(n)(x, y)` (Steinarsson 2013, the
  * dashboard-series decimator): keep the first and last points, split
  * the rest into n−2 equal buckets, and from each bucket keep the
  * point forming the largest triangle with the PREVIOUSLY SELECTED
  * point and the next bucket's centroid. The selection is sequential
  * (each pick depends on the previous), so it folds in eval() over the
  * collected group — per-GROUP state (the windowFunnel caveat; the
  * 100 TB shape is one series per group key, not one corpus-group).
  *
  * Determinism (NativeStats policy): Long inputs; points sort by
  * (x, y); the doubled-triangle-area comparison is cleared of the
  * centroid denominator — `|(px·c − Σx)(yc − yp) − (xp − xc)(Σy − py·c)|`
  * in BigInt — so the argmax is exact integer arithmetic with
  * first-of-max tie-break, and a DuckDB recursive CTE replays the
  * identical selection.
  */
case class LttbAgg(
    xChild: Expression,
    yChild: Expression,
    n: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ArrayBuffer[(Long, Long)]]
  with ImplicitCastInputTypes with BinaryLike[Expression] {

  require(n >= 3, s"largestTriangleThreeBuckets needs n >= 3, got $n")

  override def left: Expression = xChild
  override def right: Expression = yChild
  override def inputTypes: Seq[DataType] = Seq(LongType, LongType)
  override def dataType: DataType = org.apache.spark.sql.types.ArrayType(
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("x", LongType, nullable = false),
      org.apache.spark.sql.types.StructField("y", LongType, nullable = false))))
  override def nullable: Boolean = true
  override def prettyName: String = "largestTriangleThreeBuckets"

  override def createAggregationBuffer(): ArrayBuffer[(Long, Long)] =
    ArrayBuffer.empty

  override def update(buf: ArrayBuffer[(Long, Long)],
      input: InternalRow): ArrayBuffer[(Long, Long)] = {
    val a = xChild.eval(input)
    val b = yChild.eval(input)
    if (a != null && b != null)
      buf += ((a.asInstanceOf[Long], b.asInstanceOf[Long]))
    buf
  }

  override def merge(b1: ArrayBuffer[(Long, Long)],
      b2: ArrayBuffer[(Long, Long)]): ArrayBuffer[(Long, Long)] = b1 ++= b2

  override def eval(buf: ArrayBuffer[(Long, Long)]): Any = {
    if (buf.isEmpty) return null
    val pts = buf.toArray.sorted
    val sel = LttbAgg.select(pts, n)
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      sel.map { case (x, y) => InternalRow(x, y) })
  }

  override def serialize(buf: ArrayBuffer[(Long, Long)]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 16 * buf.length)
    bb.putInt(buf.length)
    buf.foreach { case (a, b) => bb.putLong(a); bb.putLong(b) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): ArrayBuffer[(Long, Long)] = {
    val bb = ByteBuffer.wrap(bytes)
    val cnt = bb.getInt
    val buf = new ArrayBuffer[(Long, Long)](cnt)
    var i = 0
    while (i < cnt) { buf += ((bb.getLong, bb.getLong)); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): LttbAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): LttbAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): LttbAgg =
    copy(xChild = newLeft, yChild = newRight)
}

object LttbAgg {
  /** The LTTB selection over (x, y)-sorted points — exact integer
    * arithmetic throughout, first-of-max tie-break.
    */
  def select(pts: Array[(Long, Long)], n: Int): Array[(Long, Long)] = {
    val N = pts.length
    if (N <= n) return pts
    val nb = n - 2
    val out = ArrayBuffer(pts(0))
    var i = 0
    while (i < nb) {
      val lo = 1 + i.toLong * (N - 2) / nb
      val hi = 1 + (i + 1).toLong * (N - 2) / nb
      val (nlo, nhi) =
        if (i == nb - 1) (N - 1L, N.toLong)
        else (hi, 1 + (i + 2).toLong * (N - 2) / nb)
      var sx = BigInt(0); var sy = BigInt(0)
      var j = nlo
      while (j < nhi) { sx += pts(j.toInt)._1; sy += pts(j.toInt)._2; j += 1 }
      val c = BigInt(nhi - nlo)
      val (px, py) = out.last
      var bestArea = BigInt(-1)
      var best = lo
      j = lo
      while (j < hi) {
        val (xc, yc) = pts(j.toInt)
        val area = ((BigInt(px) * c - sx) * (BigInt(yc) - py) -
          (BigInt(px) - xc) * (sy - BigInt(py) * c)).abs
        if (area > bestArea) { bestArea = area; best = j }
        j += 1
      }
      out += pts(best.toInt)
      i += 1
    }
    out += pts(N - 1)
    out.toArray
  }
}

object RankTestAgg {
  val Kinds: Set[String] =
    Set("mannWhitneyUTest", "kolmogorovSmirnovTest", "rankCorr")

  /** 2×mid-ranks of `vals` in input order (×2 keeps tied mid-ranks
    * integral: a run spanning 1-based positions a..b has
    * 2·midrank = a + b).
    */
  private def doubledMidRanks(vals: Array[Long]): Array[Long] = {
    val n = vals.length
    val idx = Array.range(0, n).sortBy(vals)
    val r2 = new Array[Long](n)
    var i = 0
    while (i < n) {
      var j = i
      while (j + 1 < n && vals(idx(j + 1)) == vals(idx(i))) j += 1
      val sum2 = (i + 1).toLong + (j + 1).toLong // a + b, 1-based
      var p = i
      while (p <= j) { r2(idx(p)) = sum2; p += 1 }
      i = j + 1
    }
    r2
  }

  /** Mann–Whitney U of the sample with index 0 (pairs are
    * (value, sampleIndex); any nonzero index is "the other sample").
    * 2·U₁ = 2·R₁ − n₁(n₁+1) is an exact integer even under ties;
    * the single final IEEE op is the division by 2.
    */
  def mannWhitneyU(buf: ArrayBuffer[(Long, Long)]): Any = {
    if (buf.isEmpty) return null
    val vals = buf.map(_._1).toArray
    val r2 = doubledMidRanks(vals)
    var r2sum = BigInt(0)
    var n1 = 0L
    var i = 0
    while (i < buf.length) {
      if (buf(i)._2 == 0L) { r2sum += r2(i); n1 += 1 }
      i += 1
    }
    val u2 = r2sum - BigInt(n1) * (n1 + 1) // = 2·U₁
    u2.toDouble / 2.0
  }

  /** Two-sample Kolmogorov–Smirnov D: max over the merged support of
    * |F₁ − F₂| = dnum / (n₁·n₂) with dnum = max |n₂·c₁ − n₁·c₂|
    * evaluated AFTER each full run of equal values (both CDFs step
    * together at a tied value). One exact integer, one final IEEE
    * division.
    */
  def ksD(buf: ArrayBuffer[(Long, Long)]): Any = {
    val s1 = buf.iterator.filter(_._2 == 0L).map(_._1).toArray.sorted
    val s2 = buf.iterator.filter(_._2 != 0L).map(_._1).toArray.sorted
    val n1 = s1.length.toLong
    val n2 = s2.length.toLong
    if (n1 == 0 || n2 == 0) return null
    var i = 0
    var j = 0
    var dnum = BigInt(0)
    while (i < s1.length || j < s2.length) {
      val v =
        if (i >= s1.length) s2(j)
        else if (j >= s2.length) s1(i)
        else math.min(s1(i), s2(j))
      while (i < s1.length && s1(i) == v) i += 1
      while (j < s2.length && s2(j) == v) j += 1
      val d = (BigInt(n2) * i - BigInt(n1) * j).abs
      if (d > dnum) dnum = d
    }
    dnum.toDouble / (BigInt(n1) * n2).toDouble
  }

  /** Spearman's rank correlation: Pearson over 2×mid-ranks, folded in
    * BigInt — cov2 = n·Σrxry − Σrx·Σry and the two variance terms are
    * exact; the final three IEEE ops (two BigInt→Double casts already
    * exact-rounded, one multiply, one sqrt, one divide) are replayed
    * in the same order by the oracle's HUGEINT arithmetic.
    */
  def rankCorr(buf: ArrayBuffer[(Long, Long)]): Any = {
    val n = buf.length
    if (n < 2) return null
    val rx = doubledMidRanks(buf.map(_._1).toArray)
    val ry = doubledMidRanks(buf.map(_._2).toArray)
    var sxy, sx, sy, sxx, syy = BigInt(0)
    var i = 0
    while (i < n) {
      val a = BigInt(rx(i)); val b = BigInt(ry(i))
      sxy += a * b; sx += a; sy += b; sxx += a * a; syy += b * b
      i += 1
    }
    val cov2 = BigInt(n) * sxy - sx * sy
    val vx2 = BigInt(n) * sxx - sx * sx
    val vy2 = BigInt(n) * syy - sy * sy
    if (vx2.signum == 0 || vy2.signum == 0) return null // constant side
    cov2.toDouble / math.sqrt(vx2.toDouble * vy2.toDouble)
  }
}

/** Categorical-association aggregates backing the engine's `cramersV`,
  * `cramersVBiasCorrected`, `theilsU`, `contingency`, and
  * `categoricalInformationValue` — ClickHouse's contingency-table
  * family (`clickhouse.com/docs/sql-reference/aggregate-functions/
  * reference/cramersv`, `…/theilsu`, `…/contingency`,
  * `…/categoricalinformationvalue`).
  *
  * Scale shape: the buffer is the (a, b) CONTINGENCY TABLE — a count
  * map bounded by distinct category-pair cardinality, NOT group size.
  * Partials merge by count addition, so map-side combine reduces a
  * 100 TB scan to |categories|²-sized partials per mapper; nothing
  * row-sized ever serializes.
  *
  * Determinism policy: all counts and marginals are exact longs; the
  * final statistic folds cells in SORTED category order, so the result
  * is a pure function of the contingency table — independent of row
  * order, partitioning, and merge order. The handful of final IEEE ops
  * (per-cell χ² terms, `ln` ratios) can differ from the DuckDB
  * oracle's fold order by ~1 ulp, so compared surfaces round to 6 dp
  * (the engine's transcendental policy; these are NOT hashed as
  * integers — the q137 lesson).
  *
  * Departures from CH, documented: `categoricalInformationValue` takes
  * exactly one category column and returns its IV as a Double (CH's
  * n-column tuple form collapses to per-column calls); categories
  * where either tag class has zero count are SKIPPED (CH's float
  * accumulation yields ±inf there — unusable in any compared surface);
  * `theilsU(a, b)` is U(a|b) = (H(a) − H(a|b)) / H(a), 0 when
  * H(a) = 0.
  */
case class CatAssocAgg(
    left: Expression,
    right: Expression,
    kind: String,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[
    scala.collection.mutable.HashMap[(String, String), Long]]
  with ImplicitCastInputTypes with BinaryLike[Expression] {

  require(CatAssocAgg.Kinds.contains(kind),
    s"CatAssocAgg kind must be one of ${CatAssocAgg.Kinds.mkString(", ")}, got $kind")

  private type Buf = scala.collection.mutable.HashMap[(String, String), Long]

  override def inputTypes: Seq[DataType] =
    Seq(org.apache.spark.sql.types.StringType,
      org.apache.spark.sql.types.StringType)
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = kind

  override def createAggregationBuffer(): Buf =
    scala.collection.mutable.HashMap.empty

  override def update(buf: Buf, input: InternalRow): Buf = {
    val a = left.eval(input)
    val b = right.eval(input)
    if (a != null && b != null) {
      val k = (a.toString, b.toString)
      buf.update(k, buf.getOrElse(k, 0L) + 1L)
    }
    buf
  }

  override def merge(b1: Buf, b2: Buf): Buf = {
    b2.foreach { case (k, v) => b1.update(k, b1.getOrElse(k, 0L) + v) }
    b1
  }

  override def eval(buf: Buf): Any =
    if (buf.isEmpty) null
    else kind match {
      case "cramersV" => CatAssocAgg.cramersV(buf, corrected = false)
      case "cramersVBiasCorrected" =>
        CatAssocAgg.cramersV(buf, corrected = true)
      case "theilsU" => CatAssocAgg.theilsU(buf)
      case "contingency" => CatAssocAgg.contingency(buf)
      case "categoricalInformationValue" => CatAssocAgg.infoValue(buf)
    }

  override def serialize(buf: Buf): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case ((a, b), n) =>
      out.writeUTF(a); out.writeUTF(b); out.writeLong(n)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): Buf = {
    val in = new java.io.DataInputStream(
      new java.io.ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) {
      val a = in.readUTF(); val b = in.readUTF(); val c = in.readLong()
      buf.update((a, b), c)
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CatAssocAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CatAssocAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CatAssocAgg =
    copy(left = newLeft, right = newRight)
}

object CatAssocAgg {
  val Kinds: Set[String] = Set("cramersV", "cramersVBiasCorrected",
    "theilsU", "contingency", "categoricalInformationValue")

  private type Buf = scala.collection.mutable.HashMap[(String, String), Long]

  /** Sorted cells + exact marginals — the deterministic fold order. */
  private def table(buf: Buf):
      (Array[((String, String), Long)], Map[String, Long],
        Map[String, Long], Long) = {
    val cells = buf.toArray.sortBy(_._1)
    val ra = cells.groupBy(_._1._1).map { case (k, v) =>
      k -> v.map(_._2).sum }
    val cb = cells.groupBy(_._1._2).map { case (k, v) =>
      k -> v.map(_._2).sum }
    (cells, ra, cb, cells.map(_._2).sum)
  }

  /** χ² folded per-cell over the FULL r×c grid (absent cells have
    * n_ij = 0 but still contribute e_ij), in sorted (a, b) order.
    */
  private def chi2(buf: Buf): (Double, Long, Int, Int) = {
    val (cells, ra, cb, n) = table(buf)
    val present = cells.map { case (k, v) => k -> v }.toMap
    var x2 = 0.0
    for (a <- ra.keys.toArray.sorted; b <- cb.keys.toArray.sorted) {
      val e = ra(a).toDouble * cb(b).toDouble / n.toDouble
      val o = present.getOrElse((a, b), 0L).toDouble
      x2 += (o - e) * (o - e) / e
    }
    (x2, n, ra.size, cb.size)
  }

  def cramersV(buf: Buf, corrected: Boolean): Any = {
    val (x2, n, r, c) = chi2(buf)
    if (r < 2 || c < 2) return 0.0
    if (!corrected) {
      math.sqrt(x2 / (n.toDouble * math.min(r - 1, c - 1)))
    } else {
      if (n <= 1) return 0.0
      val phi2 = math.max(0.0,
        x2 / n - (r - 1.0) * (c - 1.0) / (n - 1.0))
      val rr = r - (r - 1.0) * (r - 1.0) / (n - 1.0)
      val cc = c - (c - 1.0) * (c - 1.0) / (n - 1.0)
      val d = math.min(rr - 1.0, cc - 1.0)
      if (d <= 0.0) 0.0 else math.sqrt(phi2 / d)
    }
  }

  def contingency(buf: Buf): Any = {
    val (x2, n, _, _) = chi2(buf)
    math.sqrt(x2 / (x2 + n.toDouble))
  }

  /** U(a|b) — entropies as ln(n) − (Σ c·ln c)/n over exact counts,
    * folded in sorted order.
    */
  def theilsU(buf: Buf): Any = {
    val (cells, ra, cb, n) = table(buf)
    def hOfCounts(counts: Array[Long], total: Long): Double = {
      var s = 0.0
      counts.foreach(c => s += c.toDouble * math.log(c.toDouble))
      math.log(total.toDouble) - s / total.toDouble
    }
    val ha = hOfCounts(ra.keys.toArray.sorted.map(ra), n)
    if (ha == 0.0) return 0.0
    // H(a|b) = Σ_b (n_b/n) · H(a | B=b), folded in sorted b order
    var hab = 0.0
    val byB = cells.groupBy(_._1._2)
    cb.keys.toArray.sorted.foreach { b =>
      val sub = byB(b).sortBy(_._1._1)
      hab += cb(b).toDouble / n.toDouble *
        hOfCounts(sub.map(_._2), cb(b))
    }
    (ha - hab) / ha
  }

  /** IV of the category column vs a binary tag ("0" = bad, anything
    * else = good); zero-count-on-either-side categories are skipped.
    */
  def infoValue(buf: Buf): Any = {
    val (cells, ra, _, _) = table(buf)
    val byA = cells.groupBy(_._1._1)
    def split(a: String): (Long, Long) = {
      var bad = 0L; var good = 0L
      byA(a).foreach { case ((_, b), c) =>
        if (b == "0") bad += c else good += c }
      (bad, good)
    }
    val keys = ra.keys.toArray.sorted
    var tBad = 0L; var tGood = 0L
    keys.foreach { a =>
      val (b, g) = split(a); tBad += b; tGood += g }
    if (tBad == 0L || tGood == 0L) return null
    var iv = 0.0
    keys.foreach { a =>
      val (b, g) = split(a)
      if (b > 0L && g > 0L) {
        val p = g.toDouble / tGood.toDouble
        val q = b.toDouble / tBad.toDouble
        iv += (p - q) * math.log(p / q)
      }
    }
    iv
  }
}

/** ClickHouse `quantileTiming` / `quantilesTiming` /
  * `quantileTimingWeighted` (`clickhouse.com/docs/sql-reference/
  * aggregate-functions/reference/quantiletiming`): the
  * fixed-bin timing-quantile sketch — CH's determinism-by-design
  * quantile ("the result is deterministic, it does not depend on the
  * order of the data") and the right 100 TB shape: state is a count
  * map over AT MOST 2837 fixed bins regardless of input size, fully
  * mergeable and map-side combined.
  *
  * Bin rule (CH's documented precision contract): values < 1024 ms
  * are exact (1 ms bins); 1024 ≤ v < 30000 in 16 ms bins (represented
  * by the bin's LOWER bound); v ≥ 30000 clamps to 30000; negatives
  * clamp to 0. Quantile selection: 0-based rank ⌊level·(n−1)⌋, first
  * bin whose cumulative count exceeds the rank — every step integer
  * arithmetic, so the DuckDB oracle replays it exactly (CASE-map each
  * value to its representative, ORDER BY + OFFSET). Departure from
  * CH, documented: returns Double (CH Float32), and empty input is
  * NULL (CH NaN).
  */
case class QuantileTimingAgg(
    child: Expression,
    weight: Option[Expression],
    levels: Seq[Double],
    returnArray: Boolean,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[
    scala.collection.mutable.HashMap[Int, Long]]
  with ImplicitCastInputTypes {

  require(levels.nonEmpty && levels.forall(l => l >= 0.0 && l <= 1.0),
    s"quantileTiming levels must be in [0, 1], got $levels")

  private type Buf = scala.collection.mutable.HashMap[Int, Long]

  override def children: Seq[Expression] = child +: weight.toSeq
  override def inputTypes: Seq[DataType] =
    children.map(_ => LongType)
  override def dataType: DataType =
    if (returnArray) org.apache.spark.sql.types.ArrayType(
      DoubleType, containsNull = false)
    else DoubleType
  override def nullable: Boolean = true
  override def prettyName: String =
    if (returnArray) "quantilesTiming" else "quantileTiming"

  override def createAggregationBuffer(): Buf =
    scala.collection.mutable.HashMap.empty

  override def update(buf: Buf, input: InternalRow): Buf = {
    val v = child.eval(input)
    if (v != null) {
      val w = weight match {
        case None => 1L
        case Some(we) =>
          val x = we.eval(input)
          if (x == null) 0L else x.asInstanceOf[Long]
      }
      if (w > 0L) {
        val b = QuantileTimingAgg.bin(v.asInstanceOf[Long])
        buf.update(b, buf.getOrElse(b, 0L) + w)
      }
    }
    buf
  }

  override def merge(b1: Buf, b2: Buf): Buf = {
    b2.foreach { case (k, v) => b1.update(k, b1.getOrElse(k, 0L) + v) }
    b1
  }

  override def eval(buf: Buf): Any = {
    if (buf.isEmpty) return null
    val bins = buf.toArray.sortBy(_._1)
    val n = bins.map(_._2).sum
    val qs = levels.map { level =>
      val rank = math.floor(level * (n - 1).toDouble).toLong
      var cum = 0L
      var i = 0
      var out = QuantileTimingAgg.rep(bins.last._1)
      var found = false
      while (i < bins.length && !found) {
        cum += bins(i)._2
        if (cum > rank) { out = QuantileTimingAgg.rep(bins(i)._1); found = true }
        i += 1
      }
      out.toDouble
    }
    if (returnArray)
      org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(qs.toArray)
    else qs.head
  }

  override def serialize(buf: Buf): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 12 * buf.size)
    bb.putInt(buf.size)
    buf.foreach { case (k, v) => bb.putInt(k); bb.putLong(v) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Buf = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) { buf.update(bb.getInt, bb.getLong); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(
      newOffset: Int): QuantileTimingAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(
      newOffset: Int): QuantileTimingAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): QuantileTimingAgg =
    copy(child = newChildren.head,
      weight = if (newChildren.length > 1) Some(newChildren(1)) else None)
}

object QuantileTimingAgg {
  /** 0..1023 exact; 1024..2834 are 16 ms bins; 2835 is the ≥30000
    * overflow bin.
    */
  def bin(v: Long): Int =
    if (v < 0L) 0
    else if (v < 1024L) v.toInt
    else if (v < 30000L) 1024 + ((v - 1024L) / 16L).toInt
    else 2835

  def rep(b: Int): Long =
    if (b < 1024) b.toLong
    else if (b < 2835) 1024L + (b - 1024).toLong * 16L
    else 30000L
}

/** ClickHouse `sparkbar(buckets[, min_x, max_x])(x, y)`
  * (`clickhouse.com/docs/sql-reference/aggregate-functions/reference/
  * sparkbar`): the inline-dashboard frequency histogram rendered as a
  * Unicode block-character string. State is the x → Σy count map
  * (bounded by distinct-x cardinality, mergeable, map-side combined);
  * rendering buckets the x range into `buckets` equal integer spans
  * and scales bucket heights to the eight lower-block glyphs
  * U+2581…U+2588 with exact integer arithmetic — level =
  * ⌈8·h / maxh⌉ via (8h + maxh − 1) div maxh, empty bucket = space —
  * so the DuckDB oracle rebuilds the identical string with chr().
  */
case class SparkbarAgg(
    xChild: Expression,
    yChild: Expression,
    buckets: Int,
    bounds: Option[(Long, Long)],
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[
    scala.collection.mutable.HashMap[Long, Long]]
  with ImplicitCastInputTypes with BinaryLike[Expression] {

  require(buckets > 0, s"sparkbar: buckets must be positive, got $buckets")

  private type Buf = scala.collection.mutable.HashMap[Long, Long]

  override def left: Expression = xChild
  override def right: Expression = yChild
  override def inputTypes: Seq[DataType] = Seq(LongType, LongType)
  override def dataType: DataType =
    org.apache.spark.sql.types.StringType
  override def nullable: Boolean = true
  override def prettyName: String = "sparkbar"

  override def createAggregationBuffer(): Buf =
    scala.collection.mutable.HashMap.empty

  override def update(buf: Buf, input: InternalRow): Buf = {
    val x = xChild.eval(input)
    val y = yChild.eval(input)
    if (x != null && y != null) {
      val xv = x.asInstanceOf[Long]
      if (bounds.forall { case (lo, hi) => xv >= lo && xv <= hi }) {
        buf.update(xv, buf.getOrElse(xv, 0L) + y.asInstanceOf[Long])
      }
    }
    buf
  }

  override def merge(b1: Buf, b2: Buf): Buf = {
    b2.foreach { case (k, v) => b1.update(k, b1.getOrElse(k, 0L) + v) }
    b1
  }

  override def eval(buf: Buf): Any = {
    if (buf.isEmpty) return null
    val lo = bounds.map(_._1).getOrElse(buf.keys.min)
    val hi = bounds.map(_._2).getOrElse(buf.keys.max)
    val span = hi - lo + 1
    val heights = new Array[Long](buckets)
    buf.foreach { case (x, y) =>
      // i = (x − lo)·buckets / span — exact integer bucketing
      val i = ((x - lo) * buckets / span).toInt
      if (i >= 0 && i < buckets) heights(i) += y
    }
    val maxh = heights.max
    val sb = new java.lang.StringBuilder(buckets)
    heights.foreach { h =>
      if (maxh <= 0L || h <= 0L) sb.append(' ')
      else sb.append((0x2580 + ((8L * h + maxh - 1L) / maxh).toInt).toChar)
    }
    org.apache.spark.unsafe.types.UTF8String.fromString(sb.toString)
  }

  override def serialize(buf: Buf): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 16 * buf.size)
    bb.putInt(buf.size)
    buf.foreach { case (k, v) => bb.putLong(k); bb.putLong(v) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Buf = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) { buf.update(bb.getLong, bb.getLong); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): SparkbarAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): SparkbarAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SparkbarAgg =
    copy(xChild = newLeft, yChild = newRight)
}

/** ClickHouse window family `exponentialTimeDecayedSum/Count/Avg/Max`
  * (`clickhouse.com/docs/sql-reference/window-functions`): at row i
  * (frame-ordered by time), Σ_{j≤i} v_j · exp(−(t_i − t_j)/decay) and
  * its count/avg/max siblings. State is O(1) — the running decayed
  * (value, weight, lastT) triple advanced by
  * `S_i = v_i + exp(−Δ/decay)·S_{i−1}` — so a growing window frame
  * updates in constant time per row instead of refolding the frame.
  *
  * ORDER CONTRACT: the recurrence folds rows in ARRIVAL order, which
  * is only deterministic under a window frame's ORDER BY (CH defines
  * these as window functions for the same reason). Using them as a
  * plain GROUP BY aggregate is rejected nowhere but documented
  * nondeterministic — same stance as CH's own deltaSum caveat.
  * exp() is transcendental: compared surfaces round (the policy).
  */
case class ExpDecayAgg(
    xChild: Expression,
    tChild: Expression,
    decay: Double,
    kind: String,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ExpDecayAgg.State]
  with ImplicitCastInputTypes with BinaryLike[Expression] {

  require(ExpDecayAgg.Kinds.contains(kind),
    s"ExpDecayAgg kind must be one of ${ExpDecayAgg.Kinds.mkString(", ")}")
  require(decay > 0.0, "exponentialTimeDecayed*: decay must be positive")

  override def left: Expression = xChild
  override def right: Expression = tChild
  override def inputTypes: Seq[DataType] = Seq(DoubleType, DoubleType)
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = kind

  override def createAggregationBuffer(): ExpDecayAgg.State =
    ExpDecayAgg.State(0.0, 0.0, Double.NegativeInfinity, Double.NaN,
      empty = true)

  override def update(b: ExpDecayAgg.State,
      input: InternalRow): ExpDecayAgg.State = {
    val xv = xChild.eval(input)
    val tv = tChild.eval(input)
    if (xv == null || tv == null) return b
    val x = xv.asInstanceOf[Double]
    val t = tv.asInstanceOf[Double]
    if (b.empty) ExpDecayAgg.State(x, 1.0, t, x, empty = false)
    else {
      // frames deliver rows time-ordered; tolerate equal stamps
      val f = math.exp(-(t - b.lastT) / decay)
      ExpDecayAgg.State(x + f * b.sum, 1.0 + f * b.weight, t,
        math.max(x, f * b.mx), empty = false)
    }
  }

  override def merge(a: ExpDecayAgg.State,
      b: ExpDecayAgg.State): ExpDecayAgg.State =
    if (a.empty) b
    else if (b.empty) a
    else {
      // a partial's state is relative to ITS lastT; rebasing the
      // earlier partial onto the later one's clock is one decay
      // multiply (order-aware: later lastT wins, so the merge result
      // does not depend on which side Spark passes first)
      val (early, late) =
        if (b.lastT >= a.lastT) (a, b) else (b, a)
      val f = math.exp(-(late.lastT - early.lastT) / decay)
      ExpDecayAgg.State(late.sum + f * early.sum,
        late.weight + f * early.weight, late.lastT,
        math.max(late.mx, f * early.mx), empty = false)
    }

  override def eval(b: ExpDecayAgg.State): Any =
    if (b.empty) null
    else kind match {
      case "exponentialTimeDecayedSum" => b.sum
      case "exponentialTimeDecayedCount" => b.weight
      case "exponentialTimeDecayedAvg" => b.sum / b.weight
      case "exponentialTimeDecayedMax" => b.mx
    }

  override def serialize(b: ExpDecayAgg.State): Array[Byte] = {
    val bb = ByteBuffer.allocate(33)
    bb.putDouble(b.sum); bb.putDouble(b.weight)
    bb.putDouble(b.lastT); bb.putDouble(b.mx)
    bb.put(if (b.empty) 1.toByte else 0.toByte)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): ExpDecayAgg.State = {
    val bb = ByteBuffer.wrap(bytes)
    ExpDecayAgg.State(bb.getDouble, bb.getDouble, bb.getDouble,
      bb.getDouble, bb.get() == 1.toByte)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): ExpDecayAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ExpDecayAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ExpDecayAgg =
    copy(xChild = newLeft, tChild = newRight)
}

object ExpDecayAgg {
  val Kinds: Set[String] = Set("exponentialTimeDecayedSum",
    "exponentialTimeDecayedCount", "exponentialTimeDecayedAvg",
    "exponentialTimeDecayedMax")

  /** Running decayed (sum, weight, max) as of `lastT`. */
  final case class State(sum: Double, weight: Double, lastT: Double,
      mx: Double, empty: Boolean)
}

/** ClickHouse window function `nonNegativeDerivative(metric, ts
  * [, interval])` (X182, round 11): at row i of the frame,
  * `max(0, (mᵢ − mᵢ₋₁) / (tᵢ − tᵢ₋₁) · interval_seconds)` — the
  * rate-of-change-per-interval, clamped at zero (counters that reset
  * must never report a negative rate). The first frame row, a
  * non-positive time step, and NULL inputs all yield 0.0 (the
  * runningDifference first-row convention; NULL rows are skipped and
  * do not advance the previous point).
  *
  * State is the last two (metric, ts) points — O(1) per row of a
  * growing window frame, same as [[ExpDecayAgg]]. ORDER CONTRACT:
  * window-frame use only (CH defines it as a window function);
  * GROUP BY use is documented nondeterministic, same stance as CH's
  * deltaSum caveat.
  */
case class NonNegDerivAgg(
    xChild: Expression,
    tChild: Expression,
    intervalSec: Double,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[NonNegDerivAgg.State]
  with ImplicitCastInputTypes with BinaryLike[Expression] {

  require(intervalSec > 0.0,
    "nonNegativeDerivative: interval must be positive")

  override def left: Expression = xChild
  override def right: Expression = tChild
  override def inputTypes: Seq[DataType] = Seq(DoubleType, DoubleType)
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = false
  override def prettyName: String = "nonNegativeDerivative"

  override def createAggregationBuffer(): NonNegDerivAgg.State =
    NonNegDerivAgg.State(Double.NaN, Double.NaN, Double.NaN, Double.NaN, 0)

  override def update(b: NonNegDerivAgg.State,
      input: InternalRow): NonNegDerivAgg.State = {
    val xv = xChild.eval(input)
    val tv = tChild.eval(input)
    if (xv == null || tv == null) return b
    val x = xv.asInstanceOf[Double]
    val t = tv.asInstanceOf[Double]
    if (b.n == 0) NonNegDerivAgg.State(Double.NaN, Double.NaN, x, t, 1)
    else NonNegDerivAgg.State(b.cx, b.ct, x, t, 2)
  }

  /** Merge keeps time order by the states' newest points — exact for
    * time-split partials; the GROUP BY caveat above applies.
    */
  override def merge(a: NonNegDerivAgg.State,
      b: NonNegDerivAgg.State): NonNegDerivAgg.State = {
    if (a.n == 0) return b
    if (b.n == 0) return a
    val (early, late) = if (a.ct <= b.ct) (a, b) else (b, a)
    if (late.n >= 2) late
    else NonNegDerivAgg.State(early.cx, early.ct, late.cx, late.ct, 2)
  }

  override def eval(b: NonNegDerivAgg.State): Any =
    if (b.n < 2) 0.0
    else {
      val dt = b.ct - b.pt
      if (dt <= 0.0) 0.0
      else math.max(0.0, (b.cx - b.px) / dt * intervalSec)
    }

  override def serialize(b: NonNegDerivAgg.State): Array[Byte] = {
    val bb = ByteBuffer.allocate(36)
    bb.putDouble(b.px); bb.putDouble(b.pt)
    bb.putDouble(b.cx); bb.putDouble(b.ct)
    bb.putInt(b.n)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): NonNegDerivAgg.State = {
    val bb = ByteBuffer.wrap(bytes)
    NonNegDerivAgg.State(bb.getDouble, bb.getDouble, bb.getDouble,
      bb.getDouble, bb.getInt)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): NonNegDerivAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): NonNegDerivAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): NonNegDerivAgg =
    copy(xChild = newLeft, tChild = newRight)
}

object NonNegDerivAgg {
  /** The frame's last two accepted (metric, ts) points; n counts
    * accepted rows, capped at 2.
    */
  final case class State(px: Double, pt: Double, cx: Double, ct: Double,
      n: Int)
}

/** t-digest quantile sketch (X176, round 11) — Dunning & Ertl,
  * "Computing Extremely Accurate Quantiles Using t-Digests"
  * (arXiv:1902.04023): centroids sized by the k1 scale function, so
  * rank resolution concentrates at the tails (the property CH's
  * `quantileTDigest` family exists for, and the complement to the
  * GK sketch's uniform rank error). Fixed-size mergeable state
  * (≤ ~2δ centroids after compression), map-side partial aggregation,
  * byte-serialized (mean, weight) pairs — the 100 TB sketch shape.
  *
  * Determinism policy: a t-digest's ESTIMATE depends on merge order
  * (in ClickHouse too) — so, like the theta/HLL/GK family, compared
  * surfaces must BRACKET the estimate between exact quantiles at
  * level ∓ rank-error-band rather than hash it. The k1 bound keeps
  * per-cluster rank mass ≤ 1/δ of total, so with δ = 100 a ±0.02
  * rank band is safe under ANY merge order (Round11Spec pins the
  * bracket property across repartitionings; the q266 oracle compares
  * bracket booleans and exact count/min/max).
  *
  * The buffer holds unmerged (value, weight) pairs plus compressed
  * centroids; compression triggers at 8δ entries, keeping update
  * amortized O(log) and the serialized state ≤ 8δ pairs.
  */
case class TDigestAgg(
    child: Expression,
    delta: Int,
    levels: Seq[Double],
    returnArray: Boolean,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ArrayBuffer[(Double, Long)]]
  with ImplicitCastInputTypes {

  require(delta >= 20 && delta <= 10000,
    s"quantileTDigest delta must be in [20, 10000], got $delta")
  require(levels.nonEmpty && levels.forall(l => l >= 0.0 && l <= 1.0),
    s"quantileTDigest levels must be in [0, 1], got $levels")

  private type Buf = ArrayBuffer[(Double, Long)]

  override def children: Seq[Expression] = Seq(child)
  override def inputTypes: Seq[DataType] = Seq(DoubleType)
  override def dataType: DataType =
    if (returnArray) org.apache.spark.sql.types.ArrayType(
      DoubleType, containsNull = false)
    else DoubleType
  override def nullable: Boolean = true
  override def prettyName: String =
    if (returnArray) "quantilesTDigest" else "quantileTDigest"

  override def createAggregationBuffer(): Buf = ArrayBuffer.empty

  override def update(buf: Buf, input: InternalRow): Buf = {
    val v = child.eval(input)
    if (v != null) {
      val x = v.asInstanceOf[Double]
      if (!x.isNaN) {
        buf += ((x, 1L))
        if (buf.length > 8 * delta) TDigestAgg.compressInto(buf, delta)
      }
    }
    buf
  }

  override def merge(b1: Buf, b2: Buf): Buf = {
    b1 ++= b2
    if (b1.length > 8 * delta) TDigestAgg.compressInto(b1, delta)
    b1
  }

  override def eval(buf: Buf): Any = {
    if (buf.isEmpty) return null
    TDigestAgg.compressInto(buf, delta)
    val cs = buf.toArray
    val qs = levels.map(l => TDigestAgg.quantile(cs, l))
    if (returnArray)
      org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(qs.toArray)
    else qs.head
  }

  override def serialize(buf: Buf): Array[Byte] = {
    TDigestAgg.compressInto(buf, delta)
    val bb = ByteBuffer.allocate(4 + 16 * buf.length)
    bb.putInt(buf.length)
    buf.foreach { case (m, w) => bb.putDouble(m); bb.putLong(w) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Buf = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) { buf += ((bb.getDouble, bb.getLong)); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TDigestAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TDigestAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TDigestAgg =
    copy(child = newChildren.head)
}

object TDigestAgg {

  /** k1 scale: k(q) = δ·(asin(2q−1)/2π + 1/4); a cluster may span
    * [qL, qR] only while k(qR) − k(qL) ≤ 1 — tail clusters stay tiny,
    * mid clusters carry ≤ ~π/δ of the rank mass.
    */
  private def kFn(q: Double, delta: Int): Double =
    delta * (math.asin(2.0 * math.min(1.0, math.max(0.0, q)) - 1.0) /
      (2.0 * math.Pi) + 0.25)

  /** Dunning's one-pass merging compression, in place: sort by
    * (mean, weight) — a total, deterministic order — then greedily
    * coalesce neighbours while the k1 bound allows.
    */
  def compressInto(buf: ArrayBuffer[(Double, Long)], delta: Int): Unit = {
    if (buf.length <= 1) return
    val sorted = buf.toArray
    java.util.Arrays.sort(sorted, Ordering.Tuple2[Double, Long])
    val total = sorted.map(_._2).sum.toDouble
    buf.clear()
    var curSum = sorted(0)._1 * sorted(0)._2
    var curW = sorted(0)._2
    var emitted = 0L
    var kLeft = kFn(0.0, delta)
    var i = 1
    while (i < sorted.length) {
      val (m, w) = sorted(i)
      val qRight = (emitted + curW + w).toDouble / total
      if (kFn(qRight, delta) - kLeft <= 1.0) {
        curSum += m * w; curW += w
      } else {
        buf += ((curSum / curW, curW))
        emitted += curW
        kLeft = kFn(emitted / total, delta)
        curSum = m * w; curW = w
      }
      i += 1
    }
    buf += ((curSum / curW, curW))
  }

  /** Standard centroid-midpoint interpolation over the compressed,
    * mean-sorted digest.
    */
  def quantile(cs: Array[(Double, Long)], level: Double): Double = {
    val total = cs.map(_._2).sum.toDouble
    val target = level * total
    if (cs.length == 1 || target <= cs.head._2 / 2.0) return cs.head._1
    var cum = 0.0
    var i = 0
    while (i < cs.length - 1) {
      val mid = cum + cs(i)._2 / 2.0
      val nextMid = cum + cs(i)._2 + cs(i + 1)._2 / 2.0
      if (target < nextMid) {
        if (nextMid == mid) return cs(i)._1
        val f = (target - mid) / (nextMid - mid)
        return cs(i)._1 + f * (cs(i + 1)._1 - cs(i)._1)
      }
      cum += cs(i)._2
      i += 1
    }
    cs.last._1
  }
}
