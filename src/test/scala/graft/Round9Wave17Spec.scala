package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic checks for the round-9 wave-17 operators beyond the oracle
  * gate: temperature-rebalancing monotonicity, overlap-chunk coverage,
  * dynamic-SQL equivalence, and checksum verdicts.
  */
class Round9Wave17Spec extends AnyFunSuite with SparkFixture {

  test("llm_mixture_temperature: T=2 compresses shares toward uniform; ppm sane") {
    val rows = SparkEntry.queries("llm_mixture_temperature")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (tok, w) = (r.getLong(2), r.getLong(3))
      assert(w * w <= tok && (w + 1) * (w + 1) > tok, s"integer sqrt law broken: $r")
      assert(r.getLong(4) <= 1000000L && r.getLong(5) <= 1000000L)
    }
    // sqrt scaling up-weights the under-represented and down-weights the
    // over-represented (strictly, unless already at the mean)
    rows.foreach { r =>
      val (nat, samp) = (r.getLong(4), r.getLong(5))
      val uniform = 1000000L / rows.length
      if (nat < uniform - 1000) assert(samp > nat, s"low-resource lang not up-weighted: $r")
      if (nat > uniform + 1000) assert(samp < nat, s"high-resource lang not down-weighted: $r")
    }
  }

  test("llm_chunk_overlap: stride-48 starts, 64-cap, tail covered, overlap = 16") {
    val rows = SparkEntry.queries("llm_chunk_overlap")(spark, sf).collect()
    assert(rows.nonEmpty)
    val nToks = Tables.documents(spark, sf).where(col("doc_id") % 10 === 1)
      .select(col("doc_id"), size(split(col("text"), " ")).cast("long"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.groupBy(_.getLong(0)).foreach { case (doc, rs) =>
      val sorted = rs.sortBy(_.getLong(1))
      sorted.zipWithIndex.foreach { case (r, i) =>
        assert(r.getLong(1) == i && r.getLong(2) == 48L * i, s"doc $doc: stride law broken")
        assert(r.getLong(3) >= 1 && r.getLong(3) <= 64)
      }
      val last = sorted.last
      assert(last.getLong(2) + last.getLong(3) == nToks(doc),
        s"doc $doc: tail not covered")
      // consecutive full windows overlap by 16 tokens
      sorted.init.foreach(r => assert(r.getLong(3) == 64 ||
        r.getLong(1) == sorted.last.getLong(1) - 1 && last.getLong(3) < 64 ||
        nToks(doc) <= 64, s"doc $doc: non-terminal window not full: $r"))
    }
    assert(rows.groupBy(_.getLong(0)).size == nToks.size)
  }

  test("api_sql_execute_immediate: dynamic dispatch equals the inline query") {
    val dyn = SparkEntry.queries("api_sql_execute_immediate")(spark, sf).collect()
    val inline = Tables.orders(spark, sf)
      .where(col("o_totalprice") > 100000)
      .groupBy("o_orderstatus").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(dyn.nonEmpty)
    dyn.foreach(r => assert(r.getLong(1) == inline(r.getString(0))))
  }

  test("warehouse_table_checksum: reshuffle-invariant, tamper-sensitive") {
    val rows = SparkEntry.queries("warehouse_table_checksum")(spark, sf).collect()
    assert(rows.length == 1)
    val r = rows.head
    assert(r.getLong(0) == Tables.orders(spark, sf).count())
    assert(r.getBoolean(2), "a reshuffled replica must produce the identical fingerprint")
    assert(r.getBoolean(3), "a single-row tamper must change the fingerprint")
  }
}
