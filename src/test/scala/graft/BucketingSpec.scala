package graft

import org.apache.spark.sql.functions._

/** Bucketed co-located joins (SURVEY §4 scale discipline): two tables
  * bucketed + sorted on the join key sort-merge-join with NO shuffle
  * exchange — the pre-partitioning that lets a 100 TB fact×fact join
  * skip both sides' shuffles entirely.
  */
class BucketingSpec extends SparkSpec {
  import spark.implicits._

  test("join of co-bucketed sorted tables plans without an Exchange") {
    // managed-table root: spark.sql.warehouse.dir (static conf) points
    // at /tmp via build.sbt javaOptions; a previous failed run may have
    // left table dirs behind, so clear before and after
    def drop(): Unit = Seq("graft_bkt_left", "graft_bkt_right").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      FsUtil.rmTree(s"/tmp/graft_spark_warehouse/$t")
    }
    drop()
    try {
      spark.range(0, 10000).select(col("id").as("k"), (col("id") * 2).as("a"))
        .write.mode("overwrite")
        .bucketBy(8, "k").sortBy("k").saveAsTable("graft_bkt_left")
      spark.range(0, 10000).select(col("id").as("k"), (col("id") * 3).as("b"))
        .write.mode("overwrite")
        .bucketBy(8, "k").sortBy("k").saveAsTable("graft_bkt_right")
      val joined = spark.table("graft_bkt_left")
        .join(spark.table("graft_bkt_right").hint("merge"), "k")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join should not shuffle:\n$plan")
      assert(joined.count() == 10000L)
    } finally drop()
  }
}
