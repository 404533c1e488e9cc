package graft

/** Scratch single-query timer (not part of the driver contract):
  * `runMain graft.QTime qNNN_name[,qMMM_name...] [reps]` times the
  * named registered queries on SPARK_GRAFT_SF_DIR with the same
  * noop-sink materialization Bench uses, printing per-rep wall/gc/cpu
  * — the contention discriminator — so a perf change can be measured
  * in isolation without paying for the whole bench suite.
  */
object QTime {
  def main(args: Array[String]): Unit = {
    val names = args.headOption.map(_.split(',').toSeq)
      .getOrElse(Seq("q113_goals_final_scaled"))
    val reps = if (args.length > 1) args(1).toInt else 3
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Graft.local("graft-qtime")
    val qmap = SparkEntry.queries
    val gcBeans = java.lang.management.ManagementFactory
      .getGarbageCollectorMXBeans
    def gcMillis: Long = {
      var s = 0L; gcBeans.forEach(b => s += math.max(0L, b.getCollectionTime)); s
    }
    val osBean = java.lang.management.ManagementFactory.getOperatingSystemMXBean
      .asInstanceOf[com.sun.management.OperatingSystemMXBean]
    names.foreach { name =>
      (0 to reps).foreach { r => // rep 0 = warmup
        val g0 = gcMillis; val c0 = osBean.getProcessCpuTime
        val t0 = System.nanoTime()
        qmap(name)(spark, dir).write.format("noop").mode("overwrite").save()
        val t = (System.nanoTime() - t0) / 1e9
        val tag = if (r == 0) "warm" else s"rep$r"
        println(f"QTIME $name $tag: $t%.2fs gc=${(gcMillis - g0) / 1e3}%.2fs " +
          f"cpu=${(osBean.getProcessCpuTime - c0) / 1e9}%.1fs")
      }
    }
    spark.stop()
  }
}
