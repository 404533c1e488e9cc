package graft

import org.scalacheck.{Gen, Prop, Properties, Test}
import org.scalacheck.Prop.propBoolean

/** Round-9 property pins over the new kernels — the invariants that
  * must hold for ARBITRARY input, beyond the hand-computed fixtures:
  *  - base58 encode/decode round-trips any ASCII payload;
  *  - soundex always emits letter + 3 digits (or empty) and is
  *    case-insensitive;
  *  - Damerau–Levenshtein is symmetric, bounded by max length, and
  *    zero iff equal;
  *  - Jaro–Winkler stays in [0, 1] and equals 1 iff equal
  *    (non-empty);
  *  - quantileTiming is partition-invariant and brackets min/max;
  *  - arrayAUC is complement-symmetric (flipping labels mirrors the
  *    score around 0.5).
  */
object Round9Props extends Properties("round9") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(20)

  private val asciiWord: Gen[String] =
    Gen.chooseNum(1, 12).flatMap(n =>
      Gen.listOfN(n, Gen.alphaNumChar)).map(_.mkString)

  property("base58 round-trips arbitrary ASCII payloads") =
    Prop.forAll(asciiWord) { w =>
      val spark = SparkSpec.spark
      val r = spark.sql(
        s"SELECT base58Decode(base58Encode('$w')) AS d").collect().head
      r.getString(0) == w
    }

  property("soundex: letter + 3 digits, case-insensitive") =
    Prop.forAll(asciiWord) { w =>
      val spark = SparkSpec.spark
      val r = spark.sql(
        s"SELECT soundex('$w') AS a, soundex(upper('$w')) AS b")
        .collect().head
      val a = r.getString(0)
      (a == r.getString(1)) &&
        (a.isEmpty || (a.length == 4 && a.head.isLetter &&
          a.tail.forall(_.isDigit)))
    }

  property("damerauLevenshtein: symmetric, bounded, zero iff equal") =
    Prop.forAll(asciiWord, asciiWord) { (a, b) =>
      val spark = SparkSpec.spark
      val r = spark.sql(s"""
        SELECT damerauLevenshteinDistance('$a', '$b') AS ab,
               damerauLevenshteinDistance('$b', '$a') AS ba""")
        .collect().head
      val d = r.getLong(0)
      d == r.getLong(1) && d <= math.max(a.length, b.length) &&
        ((d == 0L) == (a == b))
    }

  property("jaroWinkler in [0,1], 1 iff equal (non-empty)") =
    Prop.forAll(asciiWord, asciiWord) { (a, b) =>
      val spark = SparkSpec.spark
      val r = spark.sql(
        s"SELECT jaroWinklerSimilarity('$a', '$b') AS j").collect().head
      val j = r.getDouble(0)
      j >= 0.0 && j <= 1.0 && ((j == 1.0) == (a == b))
    }

  property("quantileTiming: partition-invariant, brackets the " +
      "clamped domain") =
    Prop.forAll(Gen.chooseNum(5, 60),
      Gen.listOfN(40, Gen.chooseNum(0L, 40000L))) { (parts, vs) =>
      val spark = SparkSpec.spark
      import spark.implicits._
      vs.toDF("v").repartition(parts % 13 + 1)
        .createOrReplaceTempView("r9p_qt")
      val r = spark.sql("""
        SELECT quantileTiming(0.5)(v) AS m,
               quantileTiming(0.0)(v) AS lo,
               quantileTiming(1.0)(v) AS hi FROM r9p_qt""")
        .collect().head
      val r2 = spark.sql("""
        SELECT quantileTiming(0.5)(v) AS m
        FROM (SELECT v FROM r9p_qt ORDER BY v DESC)""").collect().head
      val clampedMin = math.min(vs.min, 30000L).toDouble
      r.getDouble(0) == r2.getDouble(0) &&
        r.getDouble(1) <= clampedMin + 16.0 &&
        r.getDouble(2) <= 30000.0 && r.getDouble(0) <= r.getDouble(2)
    }

  property("arrayAUC: complement symmetry AUC(s, l) + AUC(s, !l) = 1") =
    Prop.forAll(Gen.listOfN(6, Gen.chooseNum(0.0, 10.0)),
      Gen.listOfN(6, Gen.oneOf(0L, 1L))) { (scores, labels) =>
      (labels.contains(0L) && labels.contains(1L)) ==> {
        val spark = SparkSpec.spark
        val sArr = scores.map(s => f"CAST($s%.4f AS DOUBLE)")
          .mkString("array(", ", ", ")")
        val lArr = labels.mkString("array(", "L, ", "L)")
        val flip = labels.map(1L - _).mkString("array(", "L, ", "L)")
        val r = spark.sql(s"""
          SELECT arrayAUC($sArr, $lArr) AS a,
                 arrayAUC($sArr, $flip) AS b""").collect().head
        math.abs(r.getDouble(0) + r.getDouble(1) - 1.0) < 1e-12
      }
    }
}
