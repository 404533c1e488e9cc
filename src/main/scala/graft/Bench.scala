package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: times the headline queries (QueryDef.bench) on
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line the driver collects.
  * Each query is fully materialized via count() so the timing covers
  * scan -> shuffle -> final aggregation, not just plan construction.
  * A warmup run of the flagship query first absorbs JVM/codegen and
  * parquet-footer-cache warmup so per-query numbers reflect steady
  * state (what a long-lived cluster sees).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Graft.local("graft-bench")

    val names = SparkEntry.benchNames
    val qmap = SparkEntry.queries
    // warmup: run the first headline query once, untimed
    names.headOption.foreach { n =>
      try qmap(n)(spark, sfDir).count() catch { case _: Throwable => () }
    }
    val results = names.map { name =>
      val t0 = System.nanoTime()
      try { qmap(name)(spark, sfDir).count() }
      catch { case _: Throwable => -1L }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.map(_._2).sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
