package graft

import org.scalacheck.{Gen, Prop, Properties, Test}
import org.scalacheck.Prop.propBoolean

import graft.operators.Relational

/** ScalaCheck property (SURVEY.md §5): for ANY multiset of
  * VersionedCollapsingMergeTree rows built from per-entity version
  * chains with cancel pairs,
  *
  *   sum(Sign) == number of live entities, and
  *   latestVersions == the highest surviving version of each live one.
  *
  * This is the invariant that makes every Sign-weighted aggregate in
  * the reference correct (README.md:76).
  */
object CollapsingProps extends Properties("collapsing") {

  // Spark jobs per sample are milliseconds but not free — 15 samples
  // gives solid coverage of chain shapes without minutes of runtime.
  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(15)

  /** Per entity: number of versions (1..4) and whether the final state
    * was also canceled (entity fully dead).
    */
  private val entityGen: Gen[(Int, Boolean)] = for {
    n <- Gen.choose(1, 4)
    dead <- Gen.oneOf(true, false)
  } yield (n, dead)

  private val corpusGen: Gen[List[(Int, Boolean)]] =
    Gen.listOfN(6, entityGen)

  property("sum(Sign) counts live entities; latestVersions picks survivors") =
    Prop.forAll(corpusGen) { entities =>
      val spark = SparkSpec.spark
      import spark.implicits._
      val rows = entities.zipWithIndex.flatMap { case ((n, dead), idx) =>
        val id = idx.toLong + 1
        val chain = (1 to n).flatMap { k =>
          // arrival encoding: each update cancels the previous state
          (if (k > 1) Seq((id, (k - 1).toLong, -1)) else Nil) :+
            (id, k.toLong, 1)
        }
        if (dead) chain :+ ((id, n.toLong, -1)) else chain
      }
      val df = rows.toDF("id", "ver", "sign")
      val signSum = df.agg(org.apache.spark.sql.functions.sum($"sign"))
        .head().getLong(0)
      val expectedLive = entities.count(!_._2).toLong
      val latest = Relational.latestVersions(df, Seq("id"), "ver", "sign")
        .select($"id", $"ver").as[(Long, Long)].collect().toSet
      val expectedLatest = entities.zipWithIndex.collect {
        case ((n, false), idx) => (idx.toLong + 1, n.toLong)
      }.toSet
      (signSum == expectedLive) :| s"sum(Sign)=$signSum live=$expectedLive" &&
        (latest == expectedLatest) :| s"latest=$latest expected=$expectedLatest"
    }

  /** withTotals invariant: for ANY grouped data, the extra row is
    * exactly one, has null keys, and carries the sum of all group rows
    * — the CH `WITH TOTALS` contract (README.md:83).
    */
  property("withTotals adds exactly the grand total") =
    Prop.forAll(Gen.listOfN(12, Gen.zip(Gen.choose(0, 3), Gen.choose(-50, 50)))) { kvs =>
      val spark = SparkSpec.spark
      import spark.implicits._
      import org.apache.spark.sql.functions._
      val df = kvs.toDF("k", "v")
      val out = Relational.withTotals(df, Seq("k"),
        Seq(sum($"v").cast("long").as("s"))).collect()
      val groups = out.filter(!_.isNullAt(0))
      val totals = out.filter(_.isNullAt(0))
      val expectedGroups = kvs.groupBy(_._1).view
        .mapValues(_.map(_._2.toLong).sum).toMap
      (totals.length == 1) :| "exactly one totals row" &&
        (totals.head.getLong(1) == kvs.map(_._2.toLong).sum) :| "grand total" &&
        (groups.map(r => r.getInt(0) -> r.getLong(1)).toMap ==
          expectedGroups) :| "group rows"
    }
}
