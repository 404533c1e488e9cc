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
