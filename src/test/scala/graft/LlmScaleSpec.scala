package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-4 LLM-scale operators: SRP-LSH embedding dedup, text scrubbing,
  * sequence packing.
  */
class LlmScaleSpec extends AnyFunSuite with SparkFixture {

  test("llm_dedup_embed_lsh returns a verified subset of the exact pair set") {
    // sf0.01 (500 vectors, 14 exact pairs) so the recall bound is not a
    // coin flip; expected recall ≈ 0.54 at the threshold boundary (4×4
    // banding), binomial spread makes ≥ 0.25 a safe wrong-detection bound
    val d = SparkFixture.sf001
    val lsh = SparkEntry.queries("llm_dedup_embed_lsh")(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val exact = SparkEntry.queries("llm_dedup_embed")(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    // precision 1 by construction: every LSH pair is exact-verified, so it
    // must appear in the exact sweep with the identical cosine
    assert(lsh.subsetOf(exact), s"LSH invented pairs: ${(lsh -- exact).take(5)}")
    assert(exact.nonEmpty && lsh.size.toDouble / exact.size >= 0.25,
      s"recall ${lsh.size}/${exact.size}")
  }

  test("llm_dedup_embed_lsh plans a banded equi-join, never an all-pairs product") {
    val p = SparkEntry.queries("llm_dedup_embed_lsh")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      p.take(3000))
  }

  test("llm_text_scrub redacts denylist tokens and accounts for every match") {
    val out = SparkEntry.queries("llm_text_scrub")(spark, sf).collect()
    assert(out.nonEmpty)
    // the corpus vocabulary contains the denylist words, so SOME doc redacts
    assert(out.exists(_.getInt(1) > 0))
    // length bookkeeping: '<X>' is 3 chars, the denylist words are 3–5, so
    // after == before − (matched chars) + 3·n; with 0 matches text is
    // byte-identical
    out.foreach { r =>
      val (n, before, after) = (r.getInt(1), r.getInt(2), r.getInt(3))
      if (n == 0) assert(before == after, s"doc ${r.getLong(0)} changed with 0 matches")
      else assert(after >= before - 2 * n && after <= before, s"doc ${r.getLong(0)}")
    }
    // no denylist word survives scrubbing
    val survivors = Tables.documents(spark, sf)
      .select(regexp_replace(col("text"), "\\b(key|hash|value)\\b", "<X>").as("t"))
      .where(col("t").rlike("\\b(key|hash|value)\\b")).count()
    assert(survivors == 0)
  }

  test("llm_pack_sequences conserves tokens and respects bin capacity") {
    // schema: (pack_id = bucket*100000 + bin, n_docs, n_tokens, first_doc,
    // fill); capacity Ctx = 1024 tokens per window, 32 hash buckets
    val out = SparkEntry.queries("llm_pack_sequences")(spark, sf).collect()
    val packedTotal = out.map(_.getLong(2)).sum
    val srcTotal = Tables.documents(spark, sf)
      .select(size(split(col("text"), " ")).cast("long").as("n"))
      .agg(sum("n")).collect()(0).getLong(0)
    assert(packedTotal == srcTotal, s"$packedTotal != $srcTotal")
    val nDocs = out.map(_.getLong(1)).sum
    assert(nDocs == Tables.documents(spark, sf).count(), "doc count not conserved")
    // bins are contiguous from 0 inside every bucket
    out.groupBy(r => r.getLong(0) / 100000L).foreach { case (bucket, rows) =>
      val bins = rows.map(_.getLong(0) % 100000L).sorted
      assert(bins.head == 0 && bins.toSeq == (0L until bins.length).toSeq,
        s"bucket $bucket bins not contiguous: ${bins.toSeq}")
    }
    // a bin's START offset is bin*1024, so cumulative tokens through every
    // non-final bin must have crossed that bin's upper boundary (its last
    // doc straddles or lands exactly on it)
    out.groupBy(r => r.getLong(0) / 100000L).foreach { case (bucket, rows) =>
      val sorted = rows.sortBy(_.getLong(0))
      var cum = 0L
      sorted.dropRight(1).foreach { r =>
        cum += r.getLong(2)
        assert(cum >= ((r.getLong(0) % 100000L) + 1) * 1024,
          s"bucket $bucket bin ${r.getLong(0) % 100000L} ended before its boundary: $cum")
      }
    }
  }
}
