package org.apache.spark.sql.graftbridge

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.types.{DoubleType, LongType}

/** Whole-operator all-pairs cosine threshold sweep (the exact-dedup
  * baseline the LSH family is verified against): emits every unordered pair
  * (a < b) with round(cos, 4) ≥ threshold.
  *
  * Physical algorithm: the vector set is collected once (with norms
  * precomputed) and broadcast; each partition of the same relation then
  * sweeps its rows against the broadcast vectors with id-ordering (y.id >
  * x.id) so each pair is computed exactly once, in a tight primitive-array
  * loop — no join operator, no row-pair materialization, O(n²·dim/P)
  * compute and O(matches) output. The declarative BroadcastNestedLoopJoin
  * formulation (`llm_dedup_embed`) pays per-pair join-row overhead instead.
  * At corpus scale the LSH/banding operators replace the O(n²) sweep; this
  * is the exact baseline, kept fast.
  *
  * Child must produce (id: Long, emb: Array[Double]) rows. Rounding is
  * BigDecimal HALF_UP at 4 dp, matching Spark's `round` and therefore the
  * DuckDB oracle.
  */
case class AllPairsCosine(
    child: LogicalPlan, threshold: Double,
    output: Seq[Attribute]) extends UnaryNode {
  override def references: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(child.output)
  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(output)
  override protected def withNewChildInternal(newChild: LogicalPlan): LogicalPlan =
    copy(child = newChild)
}

object AllPairsCosine {
  def freshOutput(): Seq[Attribute] = Seq(
    AttributeReference("a", LongType, nullable = false)(),
    AttributeReference("b", LongType, nullable = false)(),
    AttributeReference("cos", DoubleType, nullable = false)())
}

case class AllPairsCosineExec(
    child: SparkPlan, threshold: Double, output: Seq[Attribute])
    extends UnaryExecNode {
  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(output)

  override protected def doExecute(): RDD[InternalRow] = {
    val thr = threshold
    // collect once, precompute norms, broadcast ordered by id
    val vecs: Array[(Long, Array[Double], Double)] =
      child.executeCollect().map { r =>
        val v = r.getArray(1).toDoubleArray()
        var n = 0.0; var i = 0
        while (i < v.length) { n += v(i) * v(i); i += 1 }
        (r.getLong(0), v, math.sqrt(n))
      }.sortBy(_._1)
    val bc = sparkContext.broadcast(vecs)

    child.execute().mapPartitions { it =>
      val all = bc.value
      val proj = UnsafeProjection.create(output.map(_.dataType).toArray)
      val row = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(3)
      it.flatMap { r =>
        val xid = r.getLong(0)
        val x = r.getArray(1).toDoubleArray()
        var nx = 0.0; var i = 0
        while (i < x.length) { nx += x(i) * x(i); i += 1 }
        val xNorm = math.sqrt(nx)
        // binary search the first broadcast index with id > xid
        var lo = 0; var hi = all.length
        while (lo < hi) {
          val mid = (lo + hi) >>> 1
          if (all(mid)._1 <= xid) lo = mid + 1 else hi = mid
        }
        (lo until all.length).iterator.flatMap { j =>
          val (yid, y, yNorm) = all(j)
          val n = math.min(x.length, y.length)
          var dot = 0.0; var k = 0
          while (k < n) { dot += x(k) * y(k); k += 1 }
          val sim0 = if (xNorm == 0.0 || yNorm == 0.0) 0.0 else dot / (xNorm * yNorm)
          val sim = BigDecimal(sim0).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
          if (sim >= thr) {
            row.update(0, xid); row.update(1, yid); row.update(2, sim)
            Some(proj(row).copy(): InternalRow)
          } else None
        }
      }
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): SparkPlan =
    copy(child = newChild)
}

object AllPairsCosineStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AllPairsCosine(c, t, out) => AllPairsCosineExec(planLater(c), t, out) :: Nil
    case _ => Nil
  }
}

object AllPairsCosineApi {
  /** Install the strategy (idempotent) and sweep `vectors` — shaped
    * (id: Long, emb: Array[Double]) — for pairs with cos ≥ threshold. */
  def pairs(spark: SparkSession, vectors: DataFrame, threshold: Double): DataFrame = {
    val classic = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    if (!classic.experimental.extraStrategies.contains(AllPairsCosineStrategy)) {
      classic.experimental.extraStrategies =
        classic.experimental.extraStrategies :+ AllPairsCosineStrategy
    }
    val node = AllPairsCosine(
      classic.sessionState.analyzer.execute(vectors.queryExecution.logical),
      threshold, AllPairsCosine.freshOutput())
    org.apache.spark.sql.classic.Dataset.ofRows(classic, node)
  }
}
