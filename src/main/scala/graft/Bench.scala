package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Benchmark main: times the headline queries (QueryDef.bench) on
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line the driver collects.
  *
  * Materialization is a `noop`-format write, not `count()`: a bare count
  * lets Catalyst prune the aggregate *values* (only group keys determine
  * row count), so count-based timings under-measure the real work. The
  * noop sink consumes every row of every column the query produces while
  * writing nothing, so the timing covers scan -> shuffle -> final
  * projection exactly as a real sink would.
  *
  * A warmup pass runs EVERY headline query once untimed: whole-stage
  * codegen compilation + JIT of each query shape costs ~2 s on first
  * execution (measured: q22 first run 3.9 s, steady state 1.8 s), and
  * warming only the first query would fold that one-time cost into
  * every other query's number. The timed pass then reflects steady
  * state (what a long-lived cluster sees). Failed queries are reported in a
  * `failed` list and excluded from the total rather than silently summed.
  * The JSON line is also written to SPARK_GRAFT_BENCH_OUT (if set) so the
  * driver can parse it without scraping sbt log decoration.
  */
object Bench {

  private def materialize(spark: SparkSession, name: String,
      fn: (SparkSession, String) => org.apache.spark.sql.DataFrame,
      sfDir: String): Unit =
    fn(spark, sfDir).write.format("noop").mode("overwrite").save()

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Graft.local("graft-bench")

    val names = SparkEntry.benchNames
    val qmap = SparkEntry.queries
    // warmup: run every headline query once, untimed (codegen + JIT)
    names.foreach { n =>
      try materialize(spark, n, qmap(n), sfDir) catch { case _: Throwable => () }
    }
    val results = names.map { name =>
      val t0 = System.nanoTime()
      val ok =
        try { materialize(spark, name, qmap(name), sfDir); true }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}"); false
        }
      (name, (System.nanoTime() - t0) / 1e9, ok)
    }
    val qs = results
      .map { case (k, v, ok) => "\"" + k + "\":" + (if (ok) v else -1.0) }
      .mkString("{", ",", "}")
    val failed = results.filterNot(_._3).map("\"" + _._1 + "\"")
      .mkString("[", ",", "]")
    val total = results.filter(_._3).map(_._2).sum
    val line =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":$failed,"sf":"$sfDir"}"""
    println(line)
    sys.env.get("SPARK_GRAFT_BENCH_OUT").foreach { p =>
      Files.writeString(Paths.get(p), line + "\n")
    }
    spark.stop()
  }
}
