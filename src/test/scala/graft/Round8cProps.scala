package graft

import org.scalacheck.{Gen, Prop, Properties, Test}
import org.scalacheck.Prop.propBoolean

import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** ScalaCheck properties for the round-8 third wave:
  *
  *  - [[Dedup.containmentPairs]] is SOUND (every emitted pair really
  *    has containment ≥ threshold on the full shingle sets, and ≥
  *    minShared shared shingles — recomputed independently in plain
  *    Scala) for arbitrary corpora.
  *  - [[Dedup.corpusDiff]] statuses PARTITION the id universe, and
  *    diffing a corpus against itself is all-"same".
  *  - dialect `deltaSumTimestamp` equals the manual sorted fold for
  *    arbitrary (ts, value) multisets.
  */
object Round8cProps extends Properties("round8c") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(10)

  private val word: Gen[String] =
    Gen.oneOf("alpha", "beta", "gamma", "delta", "kappa", "omega",
      "sigma", "tau")

  private val doc: Gen[String] =
    Gen.choose(3, 20).flatMap(n => Gen.listOfN(n, word))
      .map(_.mkString(" "))

  private val corpus: Gen[List[String]] =
    Gen.choose(2, 8).flatMap(n => Gen.listOfN(n, doc))

  private def shingles(t: String): Set[String] = {
    val toks = t.trim.toLowerCase.split("\\s+").toSeq
    if (toks.length < 3) Set.empty
    else toks.sliding(3).map(_.mkString(" ")).toSet
  }

  property("containmentPairs is sound: emitted pairs re-verify on " +
      "full sets, shared-uncommon-shingle support holds") =
    Prop.forAll(corpus) { docs =>
      val spark = SparkSpec.spark
      import spark.implicits._
      val df = docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val minShared = 2
      val got = Dedup.containmentPairs(df, "doc_id", "text",
          shingleN = 3, minSharedShingles = minShared, maxDf = 1000,
          minContainment = 0.8)
        .select($"id_a", $"id_b", $"n_inter", $"containment")
        .as[(Long, Long, Long, Double)].collect()
      val sh = docs.map(shingles)
      got.forall { case (a, b, ni, cont) =>
        val (sa, sb) = (sh(a.toInt), sh(b.toInt))
        val inter = (sa intersect sb).size
        val exactCont = inter.toDouble / math.min(sa.size, sb.size)
        inter == ni && inter >= minShared && cont >= 0.8 &&
          math.min(sa.size, sb.size) > 0 &&
          math.abs(cont - exactCont) < 1e-9
      } :| s"unsound pair among ${got.mkString(",")}"
    }

  property("corpusDiff: statuses partition the id universe; " +
      "self-diff is all same") =
    Prop.forAll(corpus, corpus) { (prevDocs, curDocs) =>
      val spark = SparkSpec.spark
      import spark.implicits._
      val prev = prevDocs.zipWithIndex
        .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      val cur = curDocs.zipWithIndex
        .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      val got = Dedup.corpusDiff(cur, prev, "doc_id", "text")
        .as[(Long, String)].collect()
      val ids = got.map(_._1).toSeq
      val universe = (0L until math.max(prevDocs.size, curDocs.size))
      val partition = ids.sorted == universe.toSeq &&
        ids.distinct.length == ids.length
      val classes = got.toMap
      val classified = universe.forall { i =>
        val inP = i < prevDocs.size
        val inC = i < curDocs.size
        classes(i) match {
          case "added" => inC && !inP
          case "removed" => inP && !inC
          case "changed" => inP && inC && prevDocs(i.toInt) != curDocs(i.toInt)
          case "same" => inP && inC && prevDocs(i.toInt) == curDocs(i.toInt)
          case _ => false
        }
      }
      val self = Dedup.corpusDiff(cur, cur, "doc_id", "text")
        .as[(Long, String)].collect().forall(_._2 == "same")
      partition :| "partition" && classified :| "classes" && self :| "self"
    }

  private val series: Gen[List[(Long, Long)]] =
    Gen.choose(0, 20).flatMap(n => Gen.listOfN(n,
      Gen.zip(Gen.choose(0L, 50L), Gen.choose(-100L, 100L))))

  property("deltaSumTimestamp equals the manual (ts, value)-sorted " +
      "positive-delta fold") =
    Prop.forAll(series) { pts =>
      val spark = SparkSpec.spark
      import spark.implicits._
      val df = pts.map { case (t, v) => (new java.sql.Timestamp(t * 1000), v) }
        .toDF("t", "v")
      df.createOrReplaceTempView("round8c_delta")
      val got = spark.sql(
        "SELECT deltaSumTimestamp(v, t) AS ds FROM round8c_delta")
        .as[Long].collect().head
      val sorted = pts.sortBy(identity)
      val want =
        if (sorted.size < 2) 0L
        else sorted.map(_._2).sliding(2)
          .map { case Seq(a, b) => math.max(b - a, 0L) }.sum
      (got == want) :| s"got $got want $want for $sorted"
    }
}
