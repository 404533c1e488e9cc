package graft

import org.scalacheck.{Gen, Prop, Properties, Test}

/** ScalaCheck property for [[graft.operators.Dedup.stripDuplicateSpans]]'s
  * `mergeIntervals` flag: the interval-merged probe must be BYTE-EQUAL
  * to the raw-position probe for any corpus — including documents that
  * are mostly duplicated (many overlapping spans, the case the flag
  * exists for), disjoint far-apart duplicates, adjacent back-to-back
  * spans (pos == last end), and documents with no duplicates at all.
  */
object StripSpansMergeProps extends Properties("stripSpansMerge") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(10)

  // tiny vocabulary + short window force frequent cross-document span
  // collisions: most samples exercise the removal path, many with
  // overlapping/adjacent duplicated positions
  private val docGen: Gen[String] = for {
    n <- Gen.choose(0, 40)
    toks <- Gen.listOfN(n, Gen.oneOf("a", "b", "c", "d"))
  } yield toks.mkString(" ")

  private val corpusGen: Gen[List[String]] =
    Gen.choose(2, 8).flatMap(n => Gen.listOfN(n, docGen))

  property("mergeIntervals=true equals the raw-position probe") =
    Prop.forAll(corpusGen, Gen.choose(2, 5)) { (docs, window) =>
      val spark = SparkSpec.spark
      import spark.implicits._
      val df = docs.zipWithIndex
        .map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      def run(merge: Boolean): Seq[(Long, String, Long)] =
        graft.operators.Dedup
          .stripDuplicateSpans(df, "doc_id", "text", window,
            mergeIntervals = merge)
          .select($"doc_id", $"text", $"removed_tokens")
          .collect()
          .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
          .sortBy(_._1).toSeq
      run(merge = true) == run(merge = false)
    }
}
