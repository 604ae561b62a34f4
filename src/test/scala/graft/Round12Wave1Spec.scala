package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic checks for round-12 wave 1 beyond the oracle gate: the Arrow
  * batch-UDF path really flows whole columnar batches, the Hive-ACID MOR
  * read applies exactly the delete-delta set, and the ANN maintenance
  * lifecycle shows the stale-index collapse and post-refresh recovery.
  */
class Round12Wave1Spec extends AnyFunSuite with SparkFixture {

  test("udf_arrow_batch: whole Arrow batches flow, not row iterators") {
    graft.ops.Round12Ops.arrowBatches = null
    val rows = SparkEntry.queries("udf_arrow_batch")(spark, sf).collect()
    val nDocs = Tables.documents(spark, sf).count()
    assert(rows.length.toLong == nDocs)
    val batches = graft.ops.Round12Ops.arrowBatches.value
    val total = graft.ops.Round12Ops.arrowRows.value
    assert(batches > 0)
    // the final orderBy range-samples the RDD, so the batch map runs an
    // extra pass — every pass must push exactly the corpus through
    assert(total % nDocs == 0 && total >= nDocs,
      s"rows through the Arrow path: $total not a whole multiple of $nDocs")
    assert(total / batches > 10,
      s"avg batch size ${total / batches} — looks like a per-row path")
  }

  test("udf_arrow_batch: vectors wrap as Spark ArrowColumnVector batches") {
    import org.apache.spark.sql.graftbridge.ArrowBatchBridge
    val in = Tables.documents(spark, sf).select(col("doc_id"), col("text"))
    val bytes = ArrowBatchBridge.toBatchRdd(in).collect()
    assert(bytes.nonEmpty)
    val alloc = new org.apache.arrow.memory.RootAllocator()
    val root = org.apache.arrow.vector.VectorSchemaRoot.create(
      ArrowBatchBridge.arrowSchema(in.schema, "UTC"), alloc)
    try {
      ArrowBatchBridge.loadBatch(bytes.head, root, alloc)
      val cols = (0 until root.getFieldVectors.size()).map(i =>
        new org.apache.spark.sql.vectorized.ArrowColumnVector(root.getVector(i)))
      val batch = new org.apache.spark.sql.vectorized.ColumnarBatch(
        cols.toArray, root.getRowCount)
      assert(batch.numRows() > 1, "a columnar batch must carry many rows")
      // the column reads back through the Spark vectorized API
      val firstId = batch.column(0).getLong(0)
      assert(firstId >= 0L)
      batch.close()
    } finally { root.close(); alloc.close() }
  }

  test("udf_arrow_batch: byte-level profile agrees with Spark SQL on a sample") {
    val got = SparkEntry.queries("udf_arrow_batch")(spark, sf)
      .limit(50).collect()
    val want = Tables.documents(spark, sf)
      .select(col("doc_id"),
        size(filter(split(col("text"), "[ \t\n\r]+"), x => length(x) > 0))
          .cast("long").as("n_tokens"),
        octet_length(col("text")).cast("long").as("n_bytes"))
      .orderBy("doc_id").limit(50).collect()
    assert(got.map(_.toString).toSeq == want.map(_.toString).toSeq)
  }

  test("source_hive_acid_read: anti-joined delete set matches the predicates") {
    val got = SparkEntry.queries("source_hive_acid_read")(spark, sf).collect()
    val want = Tables.orders(spark, sf)
      .where(expr(
        "NOT (o_orderkey % 10 = 0 OR (o_orderkey % 2 = 1 AND o_orderkey % 7 = 0))"))
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n_orders"),
        sum(expr("CAST(FLOOR(o_totalprice * 100) AS BIGINT)")).as("cents"))
      .orderBy("o_orderstatus").collect()
    assert(got.map(_.toString).toSeq == want.map(_.toString).toSeq)
    // the merge actually removed something
    val full = Tables.orders(spark, sf).count()
    assert(got.map(_.getLong(1)).sum < full)
  }

  test("llm_ann_index_maintain: stale index misses the drift; refresh recovers") {
    val rows = SparkEntry.queries("llm_ann_index_maintain")(spark, sf).collect()
    assert(rows.length == 2)
    val byPhase = rows.map(r => r.getString(0) -> r).toMap
    val stale = byPhase("stale"); val fresh = byPhase("refreshed")
    // every true neighbor is an unindexed drift vector → recall 0
    assert(stale.getLong(4) == 0L, s"stale recall ${stale.getLong(4)} ppm")
    // maintenance restores ≥ 90% recall and widens the centroid set
    assert(fresh.getLong(4) >= 900000L, s"refreshed recall ${fresh.getLong(4)} ppm")
    assert(fresh.getLong(1) > stale.getLong(1))
  }
}
