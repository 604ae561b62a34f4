package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.Suite

/** Shared local session mirroring the driver harness config
  * (Verify.scala:10-15): local[4], shuffle=4, UTC, UI off. One JVM-wide
  * session keeps the whole test run fast.
  */
object SparkFixture {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }
  val sf0001 = "/root/testdata/sf0.001"
  val sf001 = "/root/testdata/sf0.01"
}

trait SparkFixture extends BeforeAndAfterAll { self: Suite =>
  def spark: SparkSession = SparkFixture.spark
  def sf: String = SparkFixture.sf0001
}
