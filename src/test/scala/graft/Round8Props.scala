package graft

import org.scalacheck.{Gen, Prop, Properties, Test}
import org.scalacheck.Prop.propBoolean

import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** ScalaCheck properties for the round-8 operators:
  *
  *  - [[Dedup.dedupParagraphs]] is idempotent and leaves exactly ONE
  *    surviving copy of every cross-document paragraph, for ANY corpus.
  *  - [[Dedup.nearDupGateBatch]] is SOUND (a kill implies a true
  *    exact-Jaccard partner in the index — LSH false positives cannot
  *    drop) and COMPLETE ON EXACT DUPLICATES (identical shingle sets
  *    give identical signatures, so band collision is guaranteed).
  *  - [[Dedup.sourceOverlapSketch]] sits inside its statistical error
  *    envelope of the exact [[Dedup.sourceOverlap]] and is exact at
  *    the identical-sets extreme.
  *  - [[graft.functions.text.charsetNoiseScore]] stays in [0,1] for
  *    arbitrary unicode input.
  */
object Round8Props extends Properties("round8") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(10)

  private val word: Gen[String] =
    Gen.oneOf("alpha", "beta", "gamma", "delta", "kappa", "omega")

  private val para: Gen[String] =
    Gen.choose(1, 4).flatMap(n => Gen.listOfN(n, word)).map(_.mkString(" "))

  private val doc: Gen[String] =
    Gen.choose(1, 4).flatMap(n => Gen.listOfN(n, para)).map(_.mkString("\n\n"))

  private val corpus: Gen[List[String]] =
    Gen.choose(1, 8).flatMap(n => Gen.listOfN(n, doc))

  property("dedupParagraphs is idempotent") =
    Prop.forAll(corpus) { docs =>
      val spark = SparkSpec.spark
      import spark.implicits._
      val df = docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val once = Dedup.dedupParagraphs(df, "doc_id", "text")
        .select($"doc_id", $"text")
      val twice = Dedup.dedupParagraphs(once, "doc_id", "text")
        .select($"doc_id", $"text")
      once.as[(Long, String)].collect().sortBy(_._1).toSeq ==
        twice.as[(Long, String)].collect().sortBy(_._1).toSeq
    }

  property("dedupParagraphs leaves exactly one copy of every " +
      "cross-document paragraph") =
    Prop.forAll(corpus) { docs =>
      val spark = SparkSpec.spark
      import spark.implicits._
      val df = docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      // ground truth: paragraphs present in >= 2 distinct docs
      val byDoc = docs.zipWithIndex.map { case (t, i) =>
        i.toLong -> t.split("\n\n").map(_.trim).filter(_.nonEmpty).toSeq
      }.toMap
      val crossDoc = byDoc.values.flatMap(_.distinct).toSeq
        .groupBy(identity).collect { case (p, os) if os.size >= 2 => p }
        .toSet
      val cleaned = Dedup.dedupParagraphs(df, "doc_id", "text")
        .select($"doc_id", $"text").as[(Long, String)].collect()
      crossDoc.forall { p =>
        // survives in exactly ONE doc: the min-id carrier (all its
        // occurrences there), zero occurrences anywhere else
        val owner = byDoc.filter(_._2.contains(p)).keys.min
        cleaned.forall { case (id, t) =>
          val n = t.split("\n\n").map(_.trim).count(_ == p)
          if (id == owner) n == byDoc(owner).count(_ == p) else n == 0
        }
      }
    }

  // docs long enough for stable shingle sets; near-dups are copies
  private val gateDoc: Gen[(Long, String)] = for {
    id <- Gen.choose(0L, 1000L)
    n <- Gen.choose(5, 10)
    ws <- Gen.listOfN(n, word)
  } yield (id, ws.mkString(" "))

  property("nearDupGateBatch never kills without a true exact-Jaccard " +
      "partner, and always kills exact duplicates of indexed docs") =
    Prop.forAll(Gen.listOfN(4, gateDoc), Gen.listOfN(4, gateDoc)) {
      (idxDocs, batchDocs0) =>
        val spark = SparkSpec.spark
        import spark.implicits._
        // disjoint id spaces; plant one guaranteed exact duplicate
        val idx = idxDocs.zipWithIndex
          .map { case ((_, t), i) => (i.toLong, t) }
        val batch = batchDocs0.zipWithIndex
          .map { case ((_, t), i) => (100L + i, t) } :+
          (200L, idx.head._2) // exact copy of an indexed doc
        val idxDf = idx.toDF("doc_id", "text")
        val batchDf = batch.toDF("doc_id", "text")
        val index = Dedup.buildNearDupIndex(idxDf, "doc_id", "text")
        val kept = Dedup.nearDupGateBatch(batchDf, index, "doc_id", "text")
          .select($"doc_id").as[Long].collect().toSet
        def sh(t: String): Set[String] =
          t.split("\\s+").sliding(3).map(_.mkString(" ")).toSet
        def jac(a: Set[String], b: Set[String]): Double =
          if (a.isEmpty || b.isEmpty) 0.0
          else (a & b).size.toDouble / (a | b).size
        val killed = batch.map(_._1).toSet -- kept
        val sound = killed.forall { kid =>
          val kt = sh(batch.find(_._1 == kid).get._2)
          idx.exists(d => jac(sh(d._2), kt) >= 0.5)
        }
        val exactCaught = !kept.contains(200L)
        sound && exactCaught
    }

  property("sourceOverlapSketch: exact on identical sets, inside the " +
      "error envelope elsewhere") =
    Prop.forAll(Gen.listOfN(6, para), Gen.listOfN(6, para)) { (pa, pb) =>
      val spark = SparkSpec.spark
      import spark.implicits._
      val mk = (src: String, ps: List[String]) =>
        ps.zipWithIndex.map { case (p, i) => (src, s"$p common tail $i") }
      // source c = exact copy of a's documents
      val docs = (mk("a", pa) ++ mk("b", pb) ++ mk("a2", pa))
        .zipWithIndex
        .map { case ((s0, t), i) => (i.toLong, s0, t) }
        .toDF("doc_id", "source", "text")
      val exact = Dedup.sourceOverlap(docs, "source", "text")
        .select($"src_a", $"src_b", $"jaccard")
        .as[(String, String, Double)].collect()
        .map { case (a, b, j) => (a, b) -> j }.toMap
      val est = Dedup.sourceOverlapSketch(docs, "source", "text",
          numHashes = 256)
        .select($"src_a", $"src_b", $"jaccard_est")
        .as[(String, String, Double)].collect()
        .map { case (a, b, j) => (a, b) -> j }.toMap
      val identicalExact = est.get(("a", "a2")).forall(_ == 1.0)
      // 256 hashes: stderr <= 0.032; 0.25 is ~8 sigma — a failure
      // here is a bug, not bad luck
      val envelope = exact.forall { case (k, j) =>
        est.get(k).forall(e => math.abs(e - j) <= 0.25)
      }
      identicalExact && envelope
    }

  property("charsetNoiseScore stays in [0,1] for arbitrary input") =
    Prop.forAll(Gen.listOf(Gen.oneOf(
        Gen.alphaNumStr, Gen.const("�"), Gen.const(""),
        Gen.const("café"), Gen.const("日本語"), Gen.const("\n\t")))
      .map(_.mkString(" "))) { s0 =>
      val spark = SparkSpec.spark
      import spark.implicits._
      val v = Seq(s0).toDF("t")
        .select(graft.functions.text.charsetNoiseScore($"t"))
        .as[Double].head()
      v >= 0.0 && v <= 1.0
    }
}
