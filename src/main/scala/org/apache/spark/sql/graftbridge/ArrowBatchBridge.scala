package org.apache.spark.sql.graftbridge

import org.apache.arrow.memory.BufferAllocator
import org.apache.arrow.vector.VectorSchemaRoot
import org.apache.spark.TaskContext
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.StructType

/** Arrow columnar-batch plumbing for the vectorized batch-UDF surface
  * (`udf_arrow_batch`): the Scala-native equivalent of Python's
  * `mapInArrow` — whole ColumnarBatches in, whole ColumnarBatches out,
  * never a row iterator in user code. The pieces Spark keeps
  * `private[sql]` (ArrowConverters' batch codecs, ArrowUtils' schema
  * mapping, internalCreateDataFrame) are surfaced here unchanged; all
  * vectorized compute lives on the graft side.
  *
  * Wire format note: batch bytes are single serialized Arrow
  * RecordBatch MESSAGES (no schema header) — exactly what
  * `Dataset.toArrowBatchRdd` emits and `ArrowConverters.fromBatchIterator`
  * consumes, so a map over the batch RDD composes with both ends.
  */
object ArrowBatchBridge {

  /** Executor-side batch stream of a DataFrame: one serialized Arrow
    * RecordBatch message per element, batch size governed by
    * `spark.sql.execution.arrow.maxRecordsPerBatch`. */
  def toBatchRdd(df: DataFrame): RDD[Array[Byte]] =
    df.asInstanceOf[org.apache.spark.sql.classic.Dataset[Row]].toArrowBatchRdd

  /** Arrow schema for a Spark schema (timezone only matters for
    * timestamp columns). */
  def arrowSchema(schema: StructType, tz: String): org.apache.arrow.vector.types.pojo.Schema =
    org.apache.spark.sql.util.ArrowUtils.toArrowSchema(
      schema, tz, errorOnDuplicatedFieldNames = true, largeVarTypes = false)

  /** Load one serialized RecordBatch message into `root`'s vectors. */
  def loadBatch(bytes: Array[Byte], root: VectorSchemaRoot, alloc: BufferAllocator): Unit = {
    val ch = new org.apache.arrow.vector.ipc.ReadChannel(
      java.nio.channels.Channels.newChannel(new java.io.ByteArrayInputStream(bytes)))
    val rb = org.apache.arrow.vector.ipc.message.MessageSerializer
      .deserializeRecordBatch(ch, alloc)
    try new org.apache.arrow.vector.VectorLoader(root).load(rb)
    finally rb.close()
  }

  /** Serialize `root`'s current contents as one RecordBatch message. */
  def writeBatch(root: VectorSchemaRoot): Array[Byte] = {
    val rb = new org.apache.arrow.vector.VectorUnloader(root).getRecordBatch
    try {
      val out = new java.io.ByteArrayOutputStream()
      val ch = new org.apache.arrow.vector.ipc.WriteChannel(
        java.nio.channels.Channels.newChannel(out))
      org.apache.arrow.vector.ipc.message.MessageSerializer.serialize(ch, rb)
      out.toByteArray
    } finally rb.close()
  }

  /** Batch-bytes RDD → DataFrame, decoding Arrow columns straight to
    * InternalRows per partition (no Row boxing round-trip). */
  def fromBatchRdd(spark: SparkSession, rdd: RDD[Array[Byte]], schema: StructType,
      tz: String): DataFrame = {
    val classic = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    val rows = rdd.mapPartitions { it =>
      org.apache.spark.sql.execution.arrow.ArrowConverters.fromBatchIterator(
        it, schema, tz,
        errorOnDuplicatedFieldNames = true, largeVarTypes = false, TaskContext.get())
    }
    classic.internalCreateDataFrame(rows, schema, isStreaming = false)
  }
}
