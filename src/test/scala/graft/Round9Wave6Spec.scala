package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic checks for the round-9 wave-6 operators beyond the oracle
  * gate: perceptual-hash dedup recall + band-cap soundness, quantifier
  * rewrite laws, and the self-verifying tokenizer offset mapping.
  */
class Round9Wave6Spec extends AnyFunSuite with SparkFixture {

  test("mm_dedup_phash: pairs are canonical near-dups (precision law)") {
    val sfDir = SparkFixture.sf001
    val pairs = SparkEntry.queries("mm_dedup_phash")(spark, sfDir).collect()
    assert(pairs.length >= 5, "planted near-dups must surface as low-hamming pairs")
    pairs.foreach { r =>
      assert(r.getLong(0) < r.getLong(1), s"pair not canonical: $r")
      val h = r.getInt(2)
      assert(h >= 0 && h <= 8, s"hamming outside verify bound: $r")
    }
    // precision: every reported pair must be a REAL textual near-dup —
    // token-set Jaccard >= 0.5 (planted perturbations sit near 1.0; a
    // random doc pair sits near 0)
    val texts = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ").toSet).toMap
    pairs.foreach { r =>
      val (x, y) = (texts(r.getLong(0)), texts(r.getLong(1)))
      val j = x.intersect(y).size.toDouble / x.union(y).size
      assert(j >= 0.5, s"phash pair (${r.getLong(0)}, ${r.getLong(1)}) is not a near-dup: jaccard=$j")
    }
  }

  test("mm_dedup_phash: no band bucket above the population cap feeds the join") {
    val docs = Tables.documents(spark, SparkFixture.sf001)
      .where(length(col("text")) >= 64)
    // the capped band relation is internal; re-derive bucket sizes from the
    // pair output instead: a bucket of size n emits at most C(n,2) pairs,
    // so no (a) may appear in more pairs than cap-1 partners per band × 4 bands
    val pairs = SparkEntry.queries("mm_dedup_phash")(spark, SparkFixture.sf001).collect()
    val fanout = pairs.groupBy(_.getLong(0)).map(_._2.length).toSeq
    assert(fanout.forall(_ <= 4 * 63),
      s"a doc pairs with more partners than 4 uncapped bands allow")
    assert(docs.count() > 0)
  }

  test("subquery_any_all: rewrite matches brute-force quantifier semantics") {
    val sfDir = sf
    val rows = SparkEntry.queries("subquery_any_all")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val cust = Tables.customer(spark, sfDir)
      .select(col("c_custkey"), col("c_nationkey"), col("c_acctbal").cast("double"))
      .collect()
      .map(r => (r.getAs[Number](0).longValue, r.getAs[Number](1).longValue, r.getDouble(2)))
    val sups = Tables.supplier(spark, sfDir)
      .select(col("s_nationkey"), col("s_acctbal").cast("double"))
      .collect().map(r => (r.getAs[Number](0).longValue, r.getDouble(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val byKey = rows
      .map(r => r.getAs[Number](0).longValue -> (r.getBoolean(2), r.getBoolean(3))).toMap
    cust.foreach { case (ck, nk, bal) =>
      val s = sups.getOrElse(nk, Array.empty[Double]).toSeq
      val expAll = s.forall(bal > _)  // vacuous TRUE on empty
      val expAny = s.exists(bal > _)  // empty → FALSE
      assert(byKey(ck) == ((expAll, expAny)), s"quantifier mismatch for customer $ck")
    }
    // both empty-set branches and both quantifiers must be exercised
    assert(rows.exists(_.getBoolean(2)) && rows.exists(!_.getBoolean(2)))
    assert(rows.exists(_.getBoolean(3)) && rows.exists(!_.getBoolean(3)))
  }

  test("llm_tokenize_offsets: every span re-slices to its token; spans tile the text") {
    val rows = SparkEntry.queries("llm_tokenize_offsets")(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getBoolean(5)), "offset mapping failed self-verification")
    // per doc: spans are sorted, disjoint, separated by exactly 1 (the space),
    // and jointly cover the text (last end == doc length)
    val lens = Tables.documents(spark, sf).where(col("doc_id") % 20 === 2)
      .select(col("doc_id"), length(col("text")).cast("bigint"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.groupBy(_.getLong(0)).foreach { case (doc, rs) =>
      val sorted = rs.sortBy(_.getLong(1))
      sorted.sliding(2).foreach {
        case Array(p, n) =>
          assert(n.getLong(3) == p.getLong(4) + 1,
            s"doc $doc: token ${n.getLong(1)} does not start one past the previous end")
        case _ =>
      }
      assert(sorted.head.getLong(3) == 0L)
      assert(sorted.last.getLong(4) == lens(doc), s"doc $doc: spans do not cover the text")
    }
  }
}
