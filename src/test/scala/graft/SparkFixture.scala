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
    // mirror the driver/Verify Hive-catalog setup (embedded Derby in the
    // per-JVM scratch dir) so catalog/metastore ops behave identically
    System.setProperty("derby.stream.error.file", s"${graft.ops.Scratch.dir}/derby.log")
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      // the config-driven deployment path (GraftExtensionsSpec asserts
      // its effects on a clean child session)
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.streaming.checkpointLocation", graft.ops.Scratch.ckptDir)
      .enableHiveSupport()
      .config("spark.sql.warehouse.dir", s"${graft.ops.Scratch.dir}/warehouse")
      .config("javax.jdo.option.ConnectionURL",
        s"jdbc:derby:;databaseName=${graft.ops.Scratch.dir}/metastore_db;create=true")
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
