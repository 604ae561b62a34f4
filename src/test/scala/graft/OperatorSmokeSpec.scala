package graft

import org.scalatest.funsuite.AnyFunSuite

/** Every SURVEY §2 operator runs at sf0.001 and returns rows; spot-checks
  * pin a few known values so a silently-empty or misaligned query fails
  * here before the driver's t2 gate sees it.
  */
class OperatorSmokeSpec extends AnyFunSuite with SparkFixture {

  // Ops whose result can legitimately be small but must still be non-empty.
  private val mustBeNonEmpty = SparkEntry.queries.keySet

  for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
    test(s"$name runs and returns rows at sf0.001") {
      val n = fn(spark, sf).count()
      assert(n > 0, s"$name returned 0 rows")
    }
  }

  test("entry() returns rows (t1 smoke)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracleSql key exists in queries") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle without query: $missing")
  }

  test("every operator has an oracle (the HLL estimate is bound-graded since round 4)") {
    val noOracle = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(noOracle.isEmpty, s"ops without oracle: $noOracle")
  }

  test("no operator key is silently shadowed across family maps") {
    // ++-merging the family maps makes a duplicate key LAST-WINS silently;
    // round 7 found two ops dead that way (llm_pack_lang,
    // warehouse_cache_join — since renamed). Sum-of-sizes equality makes
    // any future duplicate an immediate failure naming the key.
    import graft.ops._
    val families: Seq[(String, Map[String, _])] = Seq(
      "Relational" -> Relational.queries, "Aggregates" -> Aggregates.queries,
      "WindowOps" -> WindowOps.queries, "Functions" -> Functions.queries,
      "StreamingOps" -> StreamingOps.queries, "LlmOps" -> LlmOps.queries,
      "LlmExt" -> LlmExt.queries, "LlmScale" -> LlmScale.queries,
      "LlmPipeline" -> LlmPipeline.queries, "Showcase" -> Showcase.queries,
      "Warehouse" -> Warehouse.queries, "Analytics" -> Analytics.queries,
      "LlmPrep" -> LlmPrep.queries, "ApiSurface" -> ApiSurface.queries,
      "Lakehouse" -> Lakehouse.queries, "GraphOps" -> GraphOps.queries,
      "Service" -> Service.queries, "IcebergRead" -> IcebergRead.queries,
      "DeltaRead" -> DeltaRead.queries, "Round11Ops" -> Round11Ops.queries,
      "Round12Ops" -> Round12Ops.queries, "Round12bOps" -> Round12bOps.queries,
      "Round12cOps" -> Round12cOps.queries,
      "Round12dOps" -> Round12dOps.queries,
      "Round13Ops" -> Round13Ops.queries,
      "Round13bOps" -> Round13bOps.queries,
      "Round13cOps" -> Round13cOps.queries,
      "Round14Ops" -> Round14Ops.queries,
      "Round15Ops" -> Round15Ops.queries,
      "Round16Ops" -> Round16Ops.queries)
    val all = families.flatMap { case (fam, m) => m.keys.map(_ -> fam) }
    val dups = all.groupBy(_._1).filter(_._2.length > 1)
    assert(dups.isEmpty,
      s"duplicate op keys: ${dups.map { case (k, fs) => s"$k in ${fs.map(_._2).mkString("+")}" }}")
    assert(all.size == SparkEntry.queries.size)
    // a duplicate INSIDE one Map literal collapses before runtime can see
    // it — scan the source for op-entry patterns as the stronger guard.
    // FAIL (don't skip) when the dir is absent: a silent no-op here would
    // quietly disable the stronger of the two shadowing guards.
    val opsDir = java.nio.file.Paths.get("src/main/scala/graft/ops")
    assert(java.nio.file.Files.isDirectory(opsDir),
      s"ops source dir not found from cwd ${System.getProperty("user.dir")} — " +
        "run tests from the repo root so the source-scan guard can run")
    val entry = """"([a-z0-9_]+)" -> \(\(s""".r
    val stream = java.nio.file.Files.list(opsDir)
    val srcFiles = try stream.toArray.toSeq.map(_.toString) finally stream.close()
    val fromSrc = srcFiles.filter(_.endsWith(".scala"))
      .flatMap { f =>
        val body = new String(java.nio.file.Files.readAllBytes(
          java.nio.file.Paths.get(f)), java.nio.charset.StandardCharsets.UTF_8)
        entry.findAllMatchIn(body).map(m => m.group(1) -> f)
      }
    val srcDups = fromSrc.groupBy(_._1).filter(_._2.length > 1)
    assert(srcDups.isEmpty, s"duplicate op entries in source: ${srcDups.keys}")
  }

  test("scan_parquet preserves the 25 nations in key order") {
    val rows = SparkEntry.queries("scan_parquet")(spark, sf).collect()
    assert(rows.length == 25)
    assert(rows.map(_.getInt(0)).toSeq == (0 until 25))
  }

  test("join_cross is exactly |region| x |nation|") {
    assert(SparkEntry.queries("join_cross")(spark, sf).count() == 125)
  }

  test("agg_group partitions all lineitem rows across groups") {
    val df = SparkEntry.queries("agg_group")(spark, sf)
    val total = df.select("count_order").collect().map(_.getLong(0)).sum
    val expected = Tables.lineitem(spark, sf)
      .where(org.apache.spark.sql.functions.col("l_shipdate") <= "1998-09-02").count()
    assert(total == expected)
  }

  test("join_semi + join_anti partition customers") {
    val semi = SparkEntry.queries("join_semi")(spark, sf).count()
    val anti = SparkEntry.queries("join_anti")(spark, sf).count()
    assert(semi + anti == Tables.customer(spark, sf).count())
  }

  test("llm_dedup_near finds the planted near-duplicate pairs") {
    val pairs = SparkEntry.queries("llm_dedup_near")(spark, sf).collect()
    assert(pairs.nonEmpty)
    // jaccard ∈ (0.5, 1.0]
    assert(pairs.forall { r => val j = r.getDouble(2); j >= 0.5 && j <= 1.0 })
  }

  test("llm_sim_topk returns exactly 5 ranked neighbors per probe") {
    val rows = SparkEntry.queries("llm_sim_topk")(spark, sf).collect()
    val byProbe = rows.groupBy(_.getLong(0))
    assert(byProbe.size == 10)
    assert(byProbe.values.forall(_.length == 5))
    assert(byProbe.values.forall(_.map(_.getInt(3)).sorted.toSeq == Seq(1, 2, 3, 4, 5)))
  }
}
