package graft

import org.scalatest.funsuite.AnyFunSuite

/** §2.12 extended LLM ops: approximate methods are judged by recall against
  * their exact counterparts on the same data.
  */
class LlmExtSpec extends AnyFunSuite with SparkFixture {

  test("llm_dedup_minhash recovers the exact-Jaccard near-dup pairs") {
    val exact = SparkEntry.queries("llm_dedup_near")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = SparkEntry.queries("llm_dedup_minhash")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty)
    val recall = exact.count(approx.contains).toDouble / exact.size
    assert(recall >= 0.8, s"minhash recall $recall over ${exact.size} exact pairs")
  }

  test("llm_sim_ann achieves non-trivial recall@5 vs brute force") {
    val exact = SparkEntry.queries("llm_sim_topk")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val ann = SparkEntry.queries("llm_sim_ann")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = exact.count(ann.contains).toDouble / exact.size
    // nprobe=4 of 16 clusters on near-random vectors: expect roughly 1/4+
    assert(recall >= 0.2, s"ANN recall@5 was $recall")
    // every probe still returns exactly 5 candidates
    val perProbe = SparkEntry.queries("llm_sim_ann")(spark, sf).collect()
      .groupBy(_.getLong(0)).view.mapValues(_.length).toMap
    assert(perProbe.values.forall(_ == 5))
  }

  test("llm_dedup_simhash banding finds the same pairs as brute force") {
    // in-test brute force over the simhash values derived from the op's own
    // candidate set is circular; instead assert the planted near-dup pairs
    // (exact Jaccard >= 0.9) all fall within the Hamming budget
    val strong = SparkEntry.queries("llm_dedup_near")(spark, sf).collect()
      .filter(_.getDouble(2) >= 0.9).map(r => (r.getLong(0), r.getLong(1))).toSet
    val sim = SparkEntry.queries("llm_dedup_simhash")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(strong.nonEmpty)
    val found = strong.count(sim.contains)
    assert(found.toDouble / strong.size >= 0.9,
      s"simhash missed ${strong.size - found} of ${strong.size} strong near-dups")
  }

  test("llm_fingerprint: near-identical docs share most fingerprints") {
    val near = SparkEntry.queries("llm_dedup_near")(spark, sf).collect()
      .filter(_.getDouble(2) >= 0.95).map(r => (r.getLong(0), r.getLong(1)))
    val fps = SparkEntry.queries("llm_fingerprint")(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getString(1).split(",").map(_.toLong).toSet).toMap
    assert(near.nonEmpty)
    near.foreach { case (a, b) =>
      val inter = fps(a).intersect(fps(b)).size.toDouble
      val union = fps(a).union(fps(b)).size.toDouble
      assert(inter / union >= 0.5, s"docs $a,$b share only ${inter / union} of fingerprints")
    }
  }

  test("llm_sim_topk_native (custom Strategy/Exec) equals the composed operator") {
    val composed = SparkEntry.queries("llm_sim_topk")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    val nativeDf = SparkEntry.queries("llm_sim_topk_native")(spark, sf)
    val native = nativeDf.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    assert(native == composed)
    // physical nodes render with the "Exec" suffix stripped
    val plan = nativeDf.queryExecution.executedPlan.toString
    assert(plan.contains("CosineTopK"), plan.take(1500))
  }

  test("mm_decode_meta round-trips payload metadata deterministically") {
    val rows = SparkEntry.queries("mm_decode_meta")(spark, sf).collect()
    assert(rows.length == 500)
    val r0 = rows.head
    // checksum is a 32-hex md5 and width/height are printable-ASCII codes
    assert(r0.getAs[String]("checksum").matches("[0-9a-f]{32}"))
    assert(r0.getAs[Int]("width") >= 32 && r0.getAs[Int]("width") < 127)
    assert(r0.getAs[String]("frames").nonEmpty)
    assert(r0.getAs[Int]("n_bytes") > 0)
  }
}
