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

  test("metastore table survives a session reload; partition DDL works") {
    SparkEntry.queries("warehouse_metastore_ops")(spark, sf).collect()
    // resolution from a NEW session goes through the Hive (Derby) metastore
    val s2 = spark.newSession()
    assert(s2.catalog.tableExists("graft_db.orders_part"))
    def parts(): Set[String] =
      s2.sql("SHOW PARTITIONS graft_db.orders_part").collect()
        .map(_.getString(0)).toSet
    val base = parts()
    assert(base.nonEmpty && base.forall(_.startsWith("o_year=")), base)
    // the op dropped o_year=1996's metadata and MSCK re-registered it
    assert(base.contains("o_year=1996"), base)
    // day-2 DDL: ADD PARTITION registers new metadata, DROP removes it
    s2.sql("ALTER TABLE graft_db.orders_part ADD IF NOT EXISTS PARTITION (o_year=2099)")
    assert(parts().contains("o_year=2099"))
    s2.sql("ALTER TABLE graft_db.orders_part DROP IF EXISTS PARTITION (o_year=2099)")
    assert(!parts().contains("o_year=2099"))
    // external table: partition rows came back intact after DROP + MSCK
    val got = s2.table("graft_db.orders_part")
      .where(col("o_year") === 1996).count()
    val want = Tables.orders(s2, sf).where(year(col("o_orderdate")) === 1996).count()
    assert(got == want && want > 0)
  }

  test("persistent views round-trip the metastore; masking applies in every session") {
    SparkEntry.queries("warehouse_view_metastore")(spark, sf).collect()
    // a THIRD session (the op already proved a second) resolves both view
    // definitions from the Derby metastore — nothing session-local involved
    val s3 = spark.newSession()
    assert(s3.catalog.tableExists("graft_db.rich_cust_v"))
    assert(s3.catalog.tableExists("graft_db.cust_masked_pv"))
    // the governance contract: the masked view never exposes a raw name
    val masked = s3.table("graft_db.cust_masked_pv").collect()
    assert(masked.nonEmpty)
    assert(masked.forall(_.getString(1).startsWith("Customer#***")))
    // views are plan macros: the filter predicate reaches the parquet scan
    val p = s3.table("graft_db.rich_cust_v").queryExecution.executedPlan.toString
    assert(p.contains("PushedFilters") && p.contains("c_acctbal"), p.take(2000))
  }

  test("ANALYZE TABLE stats are consumed by the CBO planner") {
    SparkEntry.queries("warehouse_stats_cbo")(spark, sf).collect()
    val cbo = spark.newSession()
    cbo.conf.set("spark.sql.cbo.enabled", "true")
    val exact = cbo.table("graft_stats_orders").count()
    // stats visitors read SQLConf.get (thread-local ACTIVE session), so the
    // CBO session must be active while stats are computed — exactly as it
    // is when the planner itself runs inside that session
    org.apache.spark.sql.SparkSession.setActiveSession(cbo)
    try {
      val stats = cbo.table("graft_stats_orders")
        .queryExecution.optimizedPlan.stats
      assert(stats.rowCount.contains(BigInt(exact)),
        s"planner does not see the ANALYZE rowCount: ${stats.rowCount} vs $exact")
      // column stats drive filter selectivity: the estimate for a filtered
      // scan must be strictly below the table cardinality (without column
      // stats CBO has no rowCount for the filter at all)
      val filtered = cbo.table("graft_stats_orders")
        .where(col("o_orderstatus") === "F")
        .queryExecution.optimizedPlan.stats
      assert(filtered.rowCount.isDefined && filtered.rowCount.get < exact,
        s"filter estimate not stats-driven: ${filtered.rowCount}")
    } finally org.apache.spark.sql.SparkSession.setActiveSession(spark)
  }

  test("dynamic partition overwrite restates one year, other files untouched") {
    val base = s"${graft.ops.Scratch.dir}/dynover/orders_p"
    SparkEntry.queries("sink_partition_overwrite_dynamic")(spark, sf).collect()
    def files(year: Int): Set[String] =
      Option(new java.io.File(s"$base/o_year=$year").listFiles())
        .map(_.map(_.getName).filter(_.endsWith(".parquet")).toSet).getOrElse(Set())
    val before1995 = files(1995)
    val before1997 = files(1997)
    assert(before1995.nonEmpty && before1997.nonEmpty)
    // re-run ONLY the restating write: every other partition's files keep
    // their identity (dynamic mode never lists, deletes or rewrites them)
    val src = Tables.orders(spark, sf).withColumn("o_year", year(col("o_orderdate")))
    src.where(col("o_year") === 1997 && col("o_orderkey") % 2 === 0)
      .write.mode("overwrite").option("partitionOverwriteMode", "dynamic")
      .partitionBy("o_year").parquet(base)
    assert(files(1995) == before1995, "untouched partition was rewritten")
    assert(files(1997) != before1997, "restated partition kept stale files")
    val got = spark.read.parquet(base).where(col("o_year") === 1997).count()
    val want = src.where(col("o_year") === 1997 && col("o_orderkey") % 2 === 0).count()
    assert(got == want && want > 0)
  }

  test("warehouse_cache_ops reads through the in-memory columnar cache") {
    val df = SparkEntry.queries("warehouse_cache_ops")(spark, sf)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("InMemoryTableScan") || p.contains("Scan In-memory"), p.take(2000))
    assert(df.count() > 0)
    // idempotent re-run (bench calls it 3×): no view/cache collision
    assert(SparkEntry.queries("warehouse_cache_ops")(spark, sf).count() == df.count())
  }

  test("warehouse_ctas creates a managed table whose rows match the selection") {
    SparkEntry.queries("warehouse_ctas")(spark, sf).collect()
    assert(spark.catalog.tableExists("graft_ctas_cust"))
    val got = spark.table("graft_ctas_cust").count()
    val want = Tables.customer(spark, sf).where(col("c_custkey") % 10 === 0).count()
    assert(got == want && want > 0)
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

  test("partition-scoped merge rewrites ONLY the batch's partitions (file identity)") {
    // load, snapshot per-partition file names, restate, compare: the merge
    // may touch 1996 and 1997 (the change batch's partitions) and nothing
    // else — the O(delta)-not-O(table) property the op exists for
    val dir = graft.ops.Warehouse.mergeUpsertLoad(spark, sf)
    def files(year: Int): Set[String] =
      Option(new java.io.File(s"$dir/o_year=$year").listFiles())
        .map(_.map(_.getName).filter(_.endsWith(".parquet")).toSet).getOrElse(Set())
    val years = new java.io.File(dir).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("o_year="))
      .map(_.getName.stripPrefix("o_year=").toInt).sorted
    assert(years.contains(1996) && years.contains(1997), years.mkString(","))
    val before = years.map(y => y -> files(y)).toMap
    graft.ops.Warehouse.mergeUpsertRestate(spark, sf, dir)
    years.foreach { y =>
      if (y == 1996 || y == 1997)
        assert(files(y) != before(y), s"restated partition $y kept stale files")
      else
        assert(files(y) == before(y), s"untouched partition $y was rewritten")
    }
  }

  test("warehouse_mv_rewrite answers from the cached MV, never the base table") {
    val df = SparkEntry.queries("warehouse_mv_rewrite")(spark, sf)
    val p = df.queryExecution.executedPlan.toString
    // the EXECUTED tree must bottom out at the in-memory MV scan; the
    // InMemoryRelation node prints its (unexecuted) build plan below
    // itself, which legitimately names the base table — inspect only the
    // executed portion above it
    val executed = p.split("InMemoryRelation")(0)
    assert(executed.contains("InMemoryTableScan") || executed.contains("Scan In-memory"),
      executed.take(2000))
    assert(!executed.contains("orders.parquet"),
      s"MV rewrite scanned the base: ${executed.take(2000)}")
    // and the MV answer equals the direct base rollup bit-for-bit
    val got = df.collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2))).toSeq
    val want = Tables.orders(spark, sf)
      .groupBy(org.apache.spark.sql.functions.year(col("o_orderdate")).as("o_year"))
      .agg(count(lit(1)).cast("bigint").as("n"),
        sum(col("o_totalprice").cast("decimal(18,4)")).cast("double").as("t"))
      .orderBy("o_year")
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(got == want)
  }

  test("warehouse_incremental_mv: merged partials equal the full recompute") {
    val got = SparkEntry.queries("warehouse_incremental_mv")(spark, sf).collect()
      .map(r => (r.getInt(0), r.getString(1)) -> (r.getLong(2), r.getDouble(3))).toMap
    val full = Tables.orders(spark, sf)
      .groupBy(org.apache.spark.sql.functions.year(col("o_orderdate")).as("y"),
        col("o_orderstatus"))
      .agg(count(lit(1)),
        sum(expr("CAST(o_totalprice AS DECIMAL(18,4))")).cast("double"))
      .collect().map(r => (r.getInt(0), r.getString(1)) -> (r.getLong(2), r.getDouble(3))).toMap
    assert(got == full, "incremental refresh diverged from recompute")
  }
}
