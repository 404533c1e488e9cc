package graft

import org.scalacheck.{Gen, Prop, Properties, Test}
import org.scalacheck.Prop.propBoolean

import org.apache.spark.sql.functions._

import graft.functions.{text, url}
import graft.operators.{Mix, Pack, Select}

/** ScalaCheck properties for the round-8 second/third-wave operators:
  *
  *  - [[url.canonicalizeURL]] is IDEMPOTENT (a canonical key
  *    re-canonicalizes to itself) and variant-invariant (scheme, www,
  *    host case, port, trailing slash, parameter order, tracking
  *    params, fragment never change the key).
  *  - [[Pack.lengthHistogram]] buckets are tight power-of-two
  *    ceilings (`bucket/2 < len ≤ bucket`), masses are conserved, and
  *    pad waste is exactly `bucket·docs − tokens`.
  *  - [[Mix.curriculumShards]] is monotone — a higher score never
  *    lands in a lower shard — and a total partition of the input.
  *  - [[Select.badWordsFilter]] keeps exactly the documents whose
  *    manual whole-word hit count is within tolerance.
  */
object Round8bProps extends Properties("round8b") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(10)

  // --- canonicalizeURL --------------------------------------------------

  private case class UrlParts(host: String, path: List[String],
      params: List[(String, String)])

  private val label: Gen[String] =
    Gen.choose(1, 6).flatMap(n =>
      Gen.listOfN(n, Gen.alphaLowerChar).map(_.mkString))

  private val urlParts: Gen[UrlParts] = for {
    h <- label
    tld <- Gen.oneOf("com", "org", "net")
    segs <- Gen.choose(0, 3).flatMap(n => Gen.listOfN(n, label))
    ps <- Gen.choose(0, 3).flatMap(n => Gen.listOfN(n,
      Gen.zip(label, label)))
  } yield UrlParts(s"$h.$tld", segs, ps.distinctBy(_._1))

  /** One cosmetic rendering of the parts, driven by generator booleans. */
  private def render(p: UrlParts, scheme: Boolean, https: Boolean,
      www: Boolean, upper: Boolean, port: Boolean, slash: Boolean,
      track: Boolean, frag: Boolean, shuffled: Boolean): String = {
    val s = if (!scheme) "" else if (https) "https://" else "http://"
    val h0 = (if (www) "www." else "") + p.host
    val h = if (upper) h0.toUpperCase else h0
    val pt = if (port) ":8080" else ""
    val pa = if (p.path.isEmpty) "" else "/" + p.path.mkString("/")
    val sl = if (slash && pa.nonEmpty) "/" else ""
    val ps0 = if (shuffled) p.params.reverse else p.params
    val ps = ps0.map { case (k, v) => s"$k=$v" } ++
      (if (track) List("utm_source=gen", "fbclid=z9") else Nil)
    val q = if (ps.isEmpty) "" else "?" + ps.mkString("&")
    val f = if (frag) "#sec" else ""
    s + h + pt + pa + sl + q + f
  }

  private val bool = Gen.oneOf(true, false)

  property("canonicalizeURL: every cosmetic variant gives one key, " +
      "and the key is a fixpoint") =
    Prop.forAll(urlParts, Gen.listOfN(9, bool)) { (p, bs) =>
      val Seq(a, b, c, d, e, f, g, h, i) = bs.toSeq
      val spark = SparkSpec.spark
      import spark.implicits._
      val variantA = render(p, a, b, c, d, e, f, g, h, i)
      val variantB = render(p, !a, !b, !c, !d, !e, !f, !g, !h, !i)
      val keys = Seq(variantA, variantB).toDF("u")
        .select(url.canonicalizeURL($"u")).as[String].collect()
      val again = Seq(keys.head).toDF("u")
        .select(url.canonicalizeURL($"u")).as[String].collect().head
      (keys(0) == keys(1)) :| s"variants split: $variantA vs $variantB" &&
        (again == keys.head) :| s"not a fixpoint: ${keys.head} -> $again"
    }

  // --- lengthHistogram --------------------------------------------------

  private val lens: Gen[List[Long]] =
    Gen.choose(1, 40).flatMap(n =>
      Gen.listOfN(n, Gen.choose(0L, 5000L)))

  property("lengthHistogram: tight buckets, conserved mass, exact " +
      "pad-waste arithmetic") =
    Prop.forAll(lens) { ls =>
      val spark = SparkSpec.spark
      import spark.implicits._
      val rows = Pack.lengthHistogram(ls.toDF("toks"), "toks")
        .as[(Long, Long, Long, Long)].collect()
      val tight = rows.forall { case (b, _, _, _) =>
        // bucket is a power of two
        java.lang.Long.bitCount(b) == 1
      } && ls.forall { l =>
        val clamped = math.max(l, 1L)
        val b = rows.map(_._1).filter(_ >= clamped).min
        b / 2 < clamped && clamped <= b
      }
      val mass = rows.map(_._2).sum == ls.size &&
        rows.map(_._3).sum == ls.sum
      val waste = rows.forall { case (b, d, t, w) => w == b * d - t }
      tight :| "bucket bounds" && mass :| "mass" && waste :| "waste"
    }

  // --- curriculumShards -------------------------------------------------

  private val scored: Gen[List[(Long, Long)]] =
    Gen.choose(2, 40).flatMap(n =>
      Gen.listOfN(n, Gen.choose(0L, 20L)))
      .map(_.zipWithIndex.map { case (s, i) => (i.toLong, s) })

  property("curriculumShards: monotone in score, total partition, " +
      "shards within range") =
    Prop.forAll(scored, Gen.choose(1, 6)) { (docs, k) =>
      val spark = SparkSpec.spark
      import spark.implicits._
      val df = docs.toDF("id", "s")
      val got = Mix.curriculumShards(df, "s", "id", numShards = k)
        .select($"id", $"s", $"shard").as[(Long, Long, Long)]
        .collect()
      val total = got.length == docs.size
      val range = got.forall(r => r._3 >= 0 && r._3 < k)
      val byScore = got.sortBy(_._2)
      val monotone = byScore.sliding(2).forall {
        case Array(x, y) => x._2 == y._2 || x._3 <= y._3
        case _ => true
      }
      total :| "total" && range :| "range" && monotone :| "monotone"
    }

  // --- badWordsFilter ---------------------------------------------------

  private val badWord: Gen[String] = Gen.oneOf("spam", "junk")
  private val okWord: Gen[String] =
    Gen.oneOf("data", "spark", "spammy", "junky", "clean")

  private val wordDoc: Gen[String] =
    Gen.choose(1, 15).flatMap(n =>
      Gen.listOfN(n, Gen.frequency(3 -> okWord, 1 -> badWord)))
      .map(_.mkString(" "))

  property("badWordsFilter keeps exactly the docs whose whole-word " +
      "hit count is within tolerance (substrings never count)") =
    Prop.forAll(Gen.listOf(wordDoc), Gen.choose(0L, 3L)) { (docs, tol) =>
      val spark = SparkSpec.spark
      import spark.implicits._
      val df = docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val kept = Select.badWordsFilter(df, $"text",
          Seq("spam", "junk"), maxHits = tol)
        .select($"doc_id", $"bad_hits").as[(Long, Long)].collect().toMap
      val expected = docs.zipWithIndex.flatMap { case (t, i) =>
        val hits = t.split(" ").count(w => w == "spam" || w == "junk")
        if (hits <= tol) Some(i.toLong -> hits.toLong) else None
      }.toMap
      (kept == expected) :| s"got $kept want $expected"
    }
}
