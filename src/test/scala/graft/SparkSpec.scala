package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** One shared local session for the whole suite (JVM-wide, forked by
  * sbt). Individual suites `import spark.implicits._` off the stable
  * `spark` val.
  */
object SparkSpec {
  lazy val spark: SparkSession = Graft.local("graft-test")
}

trait SparkSpec extends AnyFunSuite {
  val spark: SparkSession = SparkSpec.spark
}
