package graft.plans

import java.nio.ByteBuffer
import java.security.MessageDigest

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** KMV (k-minimum-values) distinct-count sketch backing the engine's
  * `uniqTheta` — CH's theta-sketch approximate distinct aggregate
  * (`uniqTheta` in `clickhouse.com/docs/sql-reference/aggregate-functions/
  * reference/uniqthetasketch`). The KMV estimator IS the theta sketch
  * in its simplest form: keep the k smallest distinct hash values;
  * with fewer than k the count is exact, otherwise the kth-smallest
  * hash h estimates the cardinality as `(k-1) * 2^48 / h` (the
  * classic KMV unbiased form, integer division so the result is a
  * pure function of h — no float rounding to flake a comparison).
  *
  * Hash: the first 48 bits of MD5 over the value's UTF-8 string
  * rendering. MD5 exists bit-identically in Spark SQL
  * (`conv(substring(md5(v),1,12),16,10)`) and DuckDB
  * (`CAST('0x' || substring(md5(v),1,12) AS BIGINT)`), which is what
  * makes the sketch's exact output REPLAYABLE by the oracle — a
  * deliberate departure from CH's private hash family (any uniform
  * family gives the same estimator guarantees). 48 bits keeps the
  * division in exact Long range ((k−1)·2^48 < 2^63 for k ≤ 32768).
  *
  * Scale: the buffer is a bounded sorted set (≤ k longs ≈ 2 KB at the
  * default k=256) and MERGES associatively — partial aggregation
  * (map-side combine) works, the whole point of a sketch at 100 TB:
  * one bounded buffer per group per partition, never a distinct-set
  * shuffle. Contrast `uniqExact`, whose state is the value set
  * itself.
  */
case class UniqThetaAgg(
    child: Expression,
    k: Int,
    asState: Boolean = false,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]]
  with ImplicitCastInputTypes with UnaryLike[Expression] {

  require(k >= 2 && k <= 32768, s"uniqTheta k must be in [2, 32768], got $k")

  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType =
    if (asState) org.apache.spark.sql.types.ArrayType(LongType,
      containsNull = false)
    else LongType
  override def nullable: Boolean = false
  override def prettyName: String =
    if (asState) "uniqThetaState" else "uniqTheta"

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  private def add(buf: java.util.TreeSet[java.lang.Long], h: Long): Unit = {
    if (buf.size < k) { buf.add(h); () }
    else if (h < buf.last) {
      if (buf.add(h)) { buf.pollLast(); () }
    }
  }

  override def update(buf: java.util.TreeSet[java.lang.Long],
      input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) add(buf, UniqThetaAgg.hash48(v.asInstanceOf[UTF8String]))
    buf
  }

  override def merge(b1: java.util.TreeSet[java.lang.Long],
      b2: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] = {
    val it = b2.iterator()
    while (it.hasNext) add(b1, it.next())
    b1
  }

  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any =
    if (asState) {
      // the raw KMV state (ascending k-min hashes) — the currency of
      // the set-algebra estimators uniqThetaUnion/Intersect/Not
      import scala.jdk.CollectionConverters._
      new org.apache.spark.sql.catalyst.util.GenericArrayData(
        buf.iterator().asScala.map(_.longValue()).toArray)
    } else if (buf.size < k) buf.size.toLong
    else {
      val kth = buf.last.longValue()
      // kth = 0 needs all k min-hashes to collide at zero — guard anyway
      if (kth <= 0) k.toLong
      else ((k - 1).toLong * UniqThetaAgg.HashSpace) / kth
    }

  override def serialize(buf: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 * buf.size)
    bb.putInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new java.util.TreeSet[java.lang.Long]()
    var i = 0
    while (i < n) { buf.add(bb.getLong); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): UniqThetaAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): UniqThetaAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): UniqThetaAgg =
    copy(child = newChild)
}

/** HyperLogLog distinct-count sketch backing `uniqHLL12` (and the
  * `uniqCombined` spelling) — CH's classic HLL aggregate with 2^12
  * registers. Same replayable-hash departure as [[UniqThetaAgg]]:
  * the value hashes with MD5-48 (bit-identical in Spark SQL and
  * DuckDB), bucket = top 12 bits, rank = leading zeros of the
  * remaining 36-bit field + 1 (so rank ∈ [1, 37], rank 37 = all-zero
  * remainder). DuckDB replays a register exactly as
  * `CASE WHEN rem = 0 THEN 37 ELSE 37 - len(bin(rem)) END`.
  *
  * Estimator: Σ 2^(−M[j]) is kept as the EXACT integer
  * S = Σ 2^(37−M[j]) ≤ 4096·2^37 < 2^50 (float summation order can
  * flip the last ulp between engines; an integer sum cannot), so the
  * raw estimate α·m²·2^37/S is one deterministic IEEE chain. The
  * small-range linear-counting correction m·ln(m/V) (E ≤ 2.5m, V > 0)
  * uses ln — NOT correctly-rounded across libms — so per the
  * transcendental policy the CORRECTED estimate never sits on a
  * hashed surface: compared entries hash S, V, and the raw estimate
  * (exact), and BRACKET the corrected one against uniqExact.
  *
  * Scale: a FIXED 4 KB register array per group per partition,
  * elementwise-max merge (associative, commutative) — map-side
  * combine works; contrast uniqExact's value-set state.
  */
case class UniqHll12Agg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Byte]]
  with ImplicitCastInputTypes with UnaryLike[Expression] {

  private val m = 4096

  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def prettyName: String = "uniqHLL12"

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](m)

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) {
      val h = UniqThetaAgg.hash48(v.asInstanceOf[UTF8String])
      val bucket = (h >>> 36).toInt
      val rem = h & ((1L << 36) - 1)
      val rank =
        if (rem == 0L) 37
        else 36 - (63 - java.lang.Long.numberOfLeadingZeros(rem))
      if (rank > buf(bucket)) buf(bucket) = rank.toByte
    }
    buf
  }

  override def merge(b1: Array[Byte], b2: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < m) { if (b2(i) > b1(i)) b1(i) = b2(i); i += 1 }
    b1
  }

  override def eval(buf: Array[Byte]): Any = {
    var s = 0L
    var zeros = 0
    var i = 0
    while (i < m) {
      s += 1L << (37 - buf(i))
      if (buf(i) == 0) zeros += 1
      i += 1
    }
    // α_m · m² · 2^37 / S, one deterministic IEEE chain off exact ints
    val raw = 0.7213 / (1.0 + 1.079 / 4096.0) * 16777216.0 *
      137438953472.0 / s.toDouble
    val est =
      if (raw <= 2.5 * m && zeros > 0)
        m * math.log(m.toDouble / zeros) // linear counting (bracketed
      else raw                           // only — never hashed)
    math.floor(est).toLong
  }

  override def serialize(buf: Array[Byte]): Array[Byte] = buf.clone()
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes.clone()

  override def withNewMutableAggBufferOffset(newOffset: Int): UniqHll12Agg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): UniqHll12Agg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(
      newChild: Expression): UniqHll12Agg = copy(child = newChild)
}

/** Raw-state sibling of [[UniqHll12Agg]]: returns (S, zero-register
  * count, raw floor estimate) so compared surfaces can hash the EXACT
  * parts of the sketch — see the transcendental note above.
  */
case class UniqHll12StateAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Byte]]
  with ImplicitCastInputTypes with UnaryLike[Expression] {

  private val inner = UniqHll12Agg(child)

  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = org.apache.spark.sql.types.StructType(
    Seq(org.apache.spark.sql.types.StructField("s", LongType, false),
      org.apache.spark.sql.types.StructField("zeros", LongType, false),
      org.apache.spark.sql.types.StructField("raw", LongType, false)))
  override def nullable: Boolean = false
  override def prettyName: String = "uniqHLL12State"

  override def createAggregationBuffer(): Array[Byte] =
    inner.createAggregationBuffer()
  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] =
    inner.update(buf, input)
  override def merge(b1: Array[Byte], b2: Array[Byte]): Array[Byte] =
    inner.merge(b1, b2)

  override def eval(buf: Array[Byte]): Any = {
    var s = 0L
    var zeros = 0L
    var i = 0
    while (i < 4096) {
      s += 1L << (37 - buf(i))
      if (buf(i) == 0) zeros += 1
      i += 1
    }
    val raw = math.floor(0.7213 / (1.0 + 1.079 / 4096.0) * 16777216.0 *
      137438953472.0 / s.toDouble).toLong
    InternalRow(s, zeros, raw)
  }

  override def serialize(buf: Array[Byte]): Array[Byte] = buf.clone()
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes.clone()

  override def withNewMutableAggBufferOffset(
      newOffset: Int): UniqHll12StateAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(
      newOffset: Int): UniqHll12StateAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(
      newChild: Expression): UniqHll12StateAgg = copy(child = newChild)
}

object UniqThetaAgg {
  /** 2^48 — the hash space the 48-bit MD5 prefix draws from. */
  val HashSpace: Long = 1L << 48

  private val md5 = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest =
      MessageDigest.getInstance("MD5")
  }

  /** First 48 bits of MD5 over the UTF-8 bytes, big-endian — exactly
    * the numeric value of the first 12 hex chars of the standard MD5
    * hex digest, the form both SQL engines can replay.
    */
  def hash48(s: UTF8String): Long = {
    val d = md5.get()
    d.reset()
    val digest = d.digest(s.getBytes)
    ((digest(0) & 0xffL) << 40) | ((digest(1) & 0xffL) << 32) |
      ((digest(2) & 0xffL) << 24) | ((digest(3) & 0xffL) << 16) |
      ((digest(4) & 0xffL) << 8) | (digest(5) & 0xffL)
  }
}
