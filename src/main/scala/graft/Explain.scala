package graft

/** Plan-audit tool: prints the formatted physical plan of the named
  * queries (all if none given) against SPARK_GRAFT_SF_DIR. Not part of
  * the driver contract — used to check broadcasts/pushdown/codegen
  * spans when iterating on a query's shape.
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = Graft.local("graft-explain")
    val names = if (args.nonEmpty) args.toSeq else SparkEntry.queries.keys.toSeq.sorted
    names.foreach { n =>
      println(s"===== $n =====")
      try SparkEntry.queries(n)(spark, dir).explain("formatted")
      catch { case e: Throwable => println(s"failed: ${e.getMessage}") }
    }
    spark.stop()
  }
}
