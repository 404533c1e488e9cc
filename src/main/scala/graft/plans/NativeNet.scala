package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Network / encoding vocabulary kernels backing the engine's
  * `isIPv6String`, `MACNumToString`/`MACStringToNum`,
  * `base58Encode`/`base58Decode`, `soundex`, and
  * `idnaEncode`/`idnaDecode` (ClickHouse string/network families:
  * `clickhouse.com/docs/sql-reference/functions/ip-address-functions`,
  * `…/string-functions`). Pure deterministic string algorithms — no
  * I/O, no DNS (`java.net.IDN` is the offline IDNA algorithm), no
  * locale dependence — evaluated as codegen'd static calls.
  *
  * Malformed-input policy (the OrDefault contract used across the
  * dialect): predicates return 0, parsers return 0 / NULL — a
  * full-scan pipeline has no place for throwing variants.
  */
object NetKernels {

  /** RFC-4291 textual IPv6 validation: up to 8 hex16 groups, at most
    * one `::` compression (required iff fewer than 8 groups), an
    * optional trailing dotted-quad IPv4 (counts as 2 groups).
    */
  def isIpv6(s: UTF8String): Long = {
    val str = s.toString
    if (str.isEmpty) return 0L
    val dc = str.indexOf("::")
    if (dc >= 0 && str.indexOf("::", dc + 1) >= 0) return 0L // one :: max
    def groups(part: String): Option[Int] = {
      if (part.isEmpty) return Some(0)
      var n = 0
      val it = part.split(":", -1)
      var i = 0
      while (i < it.length) {
        val g = it(i)
        val isLast = i == it.length - 1
        if (g.isEmpty) return None // stray ':' (the '::' was split off)
        else if (isLast && g.contains('.')) {
          // embedded IPv4 tail: exactly 4 octets 0..255
          val o = g.split("\\.", -1)
          if (o.length != 4 || o.exists(x => x.isEmpty || x.length > 3 ||
              !x.forall(_.isDigit) || x.toInt > 255)) return None
          n += 2
        } else if (g.length <= 4 && g.forall(c =>
            Character.digit(c, 16) >= 0)) n += 1
        else return None
        i += 1
      }
      Some(n)
    }
    val ok = if (dc >= 0) {
      val (l, r) = (str.substring(0, dc), str.substring(dc + 2))
      (groups(l), groups(r)) match {
        case (Some(a), Some(b)) => a + b < 8
        case _ => false
      }
    } else groups(str).contains(8)
    if (ok) 1L else 0L
  }

  def macNumToString(n: Long): UTF8String = {
    val sb = new java.lang.StringBuilder(17)
    var i = 5
    while (i >= 0) {
      val b = (n >>> (8 * i)) & 0xffL
      sb.append(Character.forDigit((b >>> 4).toInt, 16))
      sb.append(Character.forDigit((b & 0xf).toInt, 16))
      if (i > 0) sb.append(':')
      i -= 1
    }
    UTF8String.fromString(sb.toString)
  }

  def macStringToNum(s: UTF8String): Long = {
    val parts = s.toString.split(":", -1)
    if (parts.length != 6) return 0L
    var acc = 0L
    var i = 0
    while (i < 6) {
      val p = parts(i)
      if (p.length != 2 || Character.digit(p.charAt(0), 16) < 0 ||
        Character.digit(p.charAt(1), 16) < 0) return 0L
      acc = (acc << 8) | java.lang.Integer.parseInt(p, 16).toLong
      i += 1
    }
    acc
  }

  private val B58 =
    "123456789ABCDEFGHJKLMNPQRSTUVWXYZabcdefghijkmnopqrstuvwxyz"

  def base58Encode(s: UTF8String): UTF8String = {
    val bytes = s.getBytes
    if (bytes.isEmpty) return UTF8String.fromString("")
    var zeros = 0
    while (zeros < bytes.length && bytes(zeros) == 0) zeros += 1
    var num = new java.math.BigInteger(1, bytes)
    val sb = new java.lang.StringBuilder()
    val fiftyEight = java.math.BigInteger.valueOf(58)
    while (num.signum() > 0) {
      val qr = num.divideAndRemainder(fiftyEight)
      sb.append(B58.charAt(qr(1).intValue()))
      num = qr(0)
    }
    var i = 0
    while (i < zeros) { sb.append('1'); i += 1 }
    UTF8String.fromString(sb.reverse.toString)
  }

  /** Inverse of [[base58Encode]]; NULL (boxed) on any non-alphabet
    * character.
    */
  def base58Decode(s: UTF8String): UTF8String = {
    val str = s.toString
    if (str.isEmpty) return UTF8String.fromString("")
    var num = java.math.BigInteger.ZERO
    val fiftyEight = java.math.BigInteger.valueOf(58)
    var zeros = 0
    var counting = true
    var i = 0
    while (i < str.length) {
      val idx = B58.indexOf(str.charAt(i).toInt)
      if (idx < 0) return null
      if (counting && str.charAt(i) == '1') zeros += 1 else counting = false
      num = num.multiply(fiftyEight)
        .add(java.math.BigInteger.valueOf(idx.toLong))
      i += 1
    }
    val body = num.toByteArray match {
      // BigInteger prepends a sign byte when the high bit is set
      case a if a.length > 1 && a(0) == 0 => a.drop(1)
      case a if num.signum() == 0 => Array.empty[Byte]
      case a => a
    }
    val out = new Array[Byte](zeros + body.length)
    System.arraycopy(body, 0, out, zeros, body.length)
    UTF8String.fromBytes(out)
  }

  /** American Soundex (the classic 4-char code): first letter kept,
    * B F P V→1, C G J K Q S X Z→2, D T→3, L→4, M N→5, R→6; H and W
    * are transparent for adjacency, vowels separate; padded/truncated
    * to 4. Non-alphabetic leading input → empty string.
    */
  def soundex(s: UTF8String): UTF8String = {
    val str = s.toString.toUpperCase(java.util.Locale.ROOT)
    def code(c: Char): Int = c match {
      case 'B' | 'F' | 'P' | 'V' => 1
      case 'C' | 'G' | 'J' | 'K' | 'Q' | 'S' | 'X' | 'Z' => 2
      case 'D' | 'T' => 3
      case 'L' => 4
      case 'M' | 'N' => 5
      case 'R' => 6
      case _ => 0
    }
    var i = 0
    while (i < str.length && !str.charAt(i).isLetter) i += 1
    if (i >= str.length) return UTF8String.fromString("")
    val first = str.charAt(i)
    val sb = new java.lang.StringBuilder(4)
    sb.append(first)
    var prev = code(first)
    i += 1
    while (i < str.length && sb.length < 4) {
      val c = str.charAt(i)
      if (c.isLetter) {
        val d = code(c)
        if (d > 0 && d != prev) sb.append(('0' + d).toChar)
        // H/W transparent: prev unchanged; vowels break runs
        if (c != 'H' && c != 'W') prev = d
      }
      i += 1
    }
    while (sb.length < 4) sb.append('0')
    UTF8String.fromString(sb.toString)
  }

  /** Offline IDNA (java.net.IDN — pure algorithm, no resolution);
    * NULL on inputs the algorithm rejects.
    */
  def idnaEncode(s: UTF8String): UTF8String =
    try UTF8String.fromString(java.net.IDN.toASCII(s.toString))
    catch { case _: IllegalArgumentException => null }

  def idnaDecode(s: UTF8String): UTF8String =
    try UTF8String.fromString(java.net.IDN.toUnicode(s.toString))
    catch { case _: IllegalArgumentException => null }
}

abstract class NetStringExpr extends UnaryExpression
    with ImplicitCastInputTypes {
  def kernel: String
  override def inputTypes = Seq(StringType)
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override protected def nullSafeEval(input: Any): Any
  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val tmp = ctx.freshName("net")
    nullSafeCodeGen(ctx, ev, c => s"""
      UTF8String $tmp = graft.plans.NetKernels.$kernel($c);
      if ($tmp == null) { ${ev.isNull} = true; }
      else { ${ev.value} = $tmp; }
    """)
  }
}

case class IsIpv6StringExpr(child: Expression) extends UnaryExpression
    with ImplicitCastInputTypes {
  override def inputTypes = Seq(StringType)
  override def dataType: DataType = LongType
  override def prettyName: String = "isIPv6String"
  override protected def nullSafeEval(input: Any): Any =
    NetKernels.isIpv6(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.NetKernels.isIpv6($c)")
  override protected def withNewChildInternal(newChild: Expression) =
    copy(child = newChild)
}

case class MacNumToStringExpr(child: Expression) extends UnaryExpression
    with ImplicitCastInputTypes {
  override def inputTypes = Seq(LongType)
  override def dataType: DataType = StringType
  override def prettyName: String = "MACNumToString"
  override protected def nullSafeEval(input: Any): Any =
    NetKernels.macNumToString(input.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.NetKernels.macNumToString($c)")
  override protected def withNewChildInternal(newChild: Expression) =
    copy(child = newChild)
}

case class MacStringToNumExpr(child: Expression) extends UnaryExpression
    with ImplicitCastInputTypes {
  override def inputTypes = Seq(StringType)
  override def dataType: DataType = LongType
  override def prettyName: String = "MACStringToNum"
  override protected def nullSafeEval(input: Any): Any =
    NetKernels.macStringToNum(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.NetKernels.macStringToNum($c)")
  override protected def withNewChildInternal(newChild: Expression) =
    copy(child = newChild)
}

case class Base58EncodeExpr(child: Expression) extends NetStringExpr {
  override def kernel: String = "base58Encode"
  override def prettyName: String = "base58Encode"
  override protected def nullSafeEval(input: Any): Any =
    NetKernels.base58Encode(input.asInstanceOf[UTF8String])
  override protected def withNewChildInternal(newChild: Expression) =
    copy(child = newChild)
}

case class Base58DecodeExpr(child: Expression) extends NetStringExpr {
  override def kernel: String = "base58Decode"
  override def prettyName: String = "base58Decode"
  override protected def nullSafeEval(input: Any): Any =
    NetKernels.base58Decode(input.asInstanceOf[UTF8String])
  override protected def withNewChildInternal(newChild: Expression) =
    copy(child = newChild)
}

case class SoundexExpr(child: Expression) extends NetStringExpr {
  override def kernel: String = "soundex"
  override def prettyName: String = "soundex"
  override protected def nullSafeEval(input: Any): Any =
    NetKernels.soundex(input.asInstanceOf[UTF8String])
  override protected def withNewChildInternal(newChild: Expression) =
    copy(child = newChild)
}

case class IdnaEncodeExpr(child: Expression) extends NetStringExpr {
  override def kernel: String = "idnaEncode"
  override def prettyName: String = "idnaEncode"
  override protected def nullSafeEval(input: Any): Any =
    NetKernels.idnaEncode(input.asInstanceOf[UTF8String])
  override protected def withNewChildInternal(newChild: Expression) =
    copy(child = newChild)
}

case class IdnaDecodeExpr(child: Expression) extends NetStringExpr {
  override def kernel: String = "idnaDecode"
  override def prettyName: String = "idnaDecode"
  override protected def nullSafeEval(input: Any): Any =
    NetKernels.idnaDecode(input.asInstanceOf[UTF8String])
  override protected def withNewChildInternal(newChild: Expression) =
    copy(child = newChild)
}
