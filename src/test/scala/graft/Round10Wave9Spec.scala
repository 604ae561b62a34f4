package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic checks for the round-10 wave-9 ops beyond the oracle gate. */
class Round10Wave9Spec extends AnyFunSuite with SparkFixture {

  test("mm_magic_sniff: every staged blob classifies, none fall to unknown") {
    val rows = SparkEntry.queries("mm_magic_sniff")(spark, sf).collect()
    val n = Tables.documents(spark, sf).where(col("doc_id") % 40 === 0).count()
    assert(rows.map(_.getString(0)).toSet.subsetOf(
      Set("image_png", "image_jpeg", "audio_wav")), "unknown modality leaked")
    assert(rows.map(_.getLong(1)).sum == n, "every blob must classify")
    rows.foreach(r => assert(r.getLong(2) > r.getLong(1) * 3,
      "bytes must exceed headers alone"))
  }

  test("llm_mergeable_stats: partial merge is exactly the full computation") {
    val r = SparkEntry.queries("llm_mergeable_stats")(spark, sf).collect().head
    assert(r.getBoolean(10), "merge must be exact")
    assert(r.getLong(0) == Tables.documents(spark, sf).count())
    assert(r.getLong(8) >= r.getLong(6), "max >= min")
  }

  test("win_twap: weighted mean sits inside the value hull per user") {
    val rows = SparkEntry.queries("win_twap")(spark, sf).collect()
    assert(rows.nonEmpty)
    val cents = Tables.events(spark, sf)
      .select(col("user_id"), floor(col("value") * 100).cast("bigint").as("c"))
      .groupBy("user_id").agg(min("c").as("mn"), max("c").as("mx"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    rows.foreach { r =>
      val (u, twap) = (r.getLong(0), r.getLong(4))
      val (mn, mx) = cents(u)
      assert(twap >= mn && twap <= mx, s"TWAP outside the user's value hull: $r")
      assert(r.getLong(3) > 0, "holding time must be positive")
    }
  }
}
