package graft

/** Dev-only timing harness: run named registered queries against a data
  * dir, 3 reps each, wall-clock on stdout — the per-entry magnifying
  * glass next to [[Bench]]'s full suite (attribution runs for a single
  * regressed entry shouldn't pay the 40-entry suite). When pointed at a
  * non-driver dir (no `documents.parquet` file layout), the GenScale
  * sf1 slice is (re)generated first — same contract as Bench's section.
  *
  *   sbt "runMain graft.DevTime /tmp/graft_sf1 q263_mutual_knn_ivf"
  */
object DevTime {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val spark = Graft.local("graft-devtime")
    if (!dir.startsWith("/root/testdata"))
      GenScale.ensure(spark, "/root/testdata/sf0.1", dir)
    val qmap = SparkEntry.queries
    for (name <- args.drop(1); r <- 1 to 3) {
      val t0 = System.nanoTime()
      val n = qmap(name)(spark, dir).collect().length
      println(f"[time] $name rep$r: ${(System.nanoTime() - t0) / 1e9}%.2fs rows=$n")
    }
    spark.stop()
  }
}
