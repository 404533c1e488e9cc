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
