package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Hive-warehouse-model capabilities (SURVEY §1.1/§7.4): catalog tables via
  * SQL DDL, partitioned writes, and partition pruning — the storage-side
  * posture that matters at 100 TB (a pruned scan reads only the partitions
  * the predicate selects).
  */
class WarehouseSpec extends AnyFunSuite with SparkFixture {

  test("CREATE TABLE ... USING parquet + INSERT + catalog round-trip") {
    val wh = java.nio.file.Files.createTempDirectory("graft_wh").toString
    spark.sql("DROP TABLE IF EXISTS graft_nation")
    spark.sql(
      s"""CREATE TABLE graft_nation (n_nationkey INT, n_name STRING, n_regionkey INT)
         |USING parquet LOCATION '$wh/graft_nation'""".stripMargin)
    Tables.nation(spark, sf).write.mode("overwrite")
      .insertInto("graft_nation")
    assert(spark.catalog.tableExists("graft_nation"))
    assert(spark.table("graft_nation").count() == 25)
    val viaSql = spark.sql(
      "SELECT COUNT(*) AS c FROM graft_nation WHERE n_regionkey = 2")
      .collect()(0).getLong(0)
    assert(viaSql == 5)
    spark.sql("DROP TABLE graft_nation")
  }

  test("partitionBy write + partition-pruned read") {
    val wh = java.nio.file.Files.createTempDirectory("graft_part").toString
    Tables.orders(spark, sf)
      .withColumn("o_year", year(col("o_orderdate")))
      .write.mode("overwrite").partitionBy("o_year").parquet(s"$wh/orders_p")
    val back = spark.read.parquet(s"$wh/orders_p")
    val pruned = back.where(col("o_year") === 1997)
    // the partition filter must land in PartitionFilters, not a post-scan filter
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("o_year"), plan.take(1500))
    val expected = Tables.orders(spark, sf)
      .where(year(col("o_orderdate")) === 1997).count()
    assert(pruned.count() == expected)
    // on disk: one directory per year, and the pruned read touches only one
    val dirs = new java.io.File(s"$wh/orders_p").listFiles()
      .filter(_.getName.startsWith("o_year=")).map(_.getName).sorted
    assert(dirs.length > 1 && dirs.contains("o_year=1997"))
  }

  test("bucketed write co-locates join keys (saveAsTable)") {
    spark.sql("DROP TABLE IF EXISTS graft_orders_b")
    Tables.orders(spark, sf)
      .write.mode("overwrite").bucketBy(4, "o_custkey").sortBy("o_custkey")
      .saveAsTable("graft_orders_b")
    val b = spark.table("graft_orders_b")
    assert(b.count() == Tables.orders(spark, sf).count())
    // joining two scans of the bucketed table on the bucket key needs no
    // extra shuffle of the bucketed sides
    val j = b.as("x").join(spark.table("graft_orders_b").as("y"),
      col("x.o_custkey") === col("y.o_custkey"))
    val plan = j.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning(o_custkey"), plan.take(2000))
    spark.sql("DROP TABLE graft_orders_b")
  }
}
