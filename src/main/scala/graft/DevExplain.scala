package graft
object DevExplain {
  def main(args: Array[String]): Unit = {
    val spark = Graft.local("graft-devexplain")
    val df = SparkEntry.queries(args(1))(spark, args(0))
    df.explain("formatted")
    spark.stop()
  }
}
