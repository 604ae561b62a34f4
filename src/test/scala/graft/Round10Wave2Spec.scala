package graft

import org.scalatest.funsuite.AnyFunSuite

/** Semantic checks for the round-10 wave-2 ops beyond the oracle gate:
  * the distributed-dataloader epoch plan, the packed-attention savings
  * accounting, the exact edit-distance verifier tier, and the fractional
  * rank family.
  */
class Round10Wave2Spec extends AnyFunSuite with SparkFixture {

  test("llm_dataloader_epoch_plan: conservation, whole batches, reshuffle observed") {
    val rows = SparkEntry.queries("llm_dataloader_epoch_plan")(spark, sf).collect()
    assert(rows.length == 8, "2 epochs x 4 ranks")
    val n = Tables.documents(spark, sf).count()
    Seq(0L, 1L).foreach { ep =>
      val er = rows.filter(_.getLong(0) == ep)
      assert(er.map(_.getLong(2)).sum == n, s"epoch $ep must partition the corpus")
      er.foreach { r =>
        val (samples, batches, dropped) = (r.getLong(2), r.getLong(3), r.getLong(4))
        assert(batches * 8 + dropped == samples, s"drop_last accounting broken: $r")
        assert(dropped >= 0 && dropped < 8, s"dropped must be a sub-batch remainder: $r")
      }
    }
    // the md5(epoch:doc) reshuffle must actually move documents between
    // ranks: at least one rank's used-set checksum changes across epochs
    val e0 = rows.filter(_.getLong(0) == 0L).map(r => r.getLong(1) -> r.getLong(5)).toMap
    val e1 = rows.filter(_.getLong(0) == 1L).map(r => r.getLong(1) -> r.getLong(5)).toMap
    assert((0L to 3L).exists(r => e0(r) != e1(r)), "epoch reshuffle changed nothing")
  }

  test("llm_attention_block_savings: block-diagonal cells bounded by the full square") {
    val rows = SparkEntry.queries("llm_attention_block_savings")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nDocs, blocked, full, ppm) =
        (r.getLong(1), r.getLong(3), r.getLong(4), r.getLong(5))
      assert(blocked <= full, s"blocked cells exceed the full square: $r")
      assert(ppm >= 0 && ppm < 1000000, s"savings ppm out of range: $r")
      if (nDocs == 1) assert(ppm == 0, s"single-doc pack cannot save attention: $r")
      if (nDocs > 1) assert(ppm > 0, s"multi-doc pack must save something: $r")
    }
  }

  test("llm_edit_distance: metric bounds hold pairwise") {
    val rows = SparkEntry.queries("llm_edit_distance")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (lev, la, lb, sim) = (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
      assert(lev >= math.abs(la - lb), s"lev below the length-difference bound: $r")
      assert(lev <= math.max(la, lb), s"lev above the max-length bound: $r")
      assert(sim >= 0 && sim <= 1000, s"sim_milli out of range: $r")
    }
  }

  test("win_rank_fractions: fraction ranges and tile monotonicity per status") {
    val rows = SparkEntry.queries("win_rank_fractions")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (pr, cd, tile) = (r.getDouble(2), r.getDouble(3), r.getLong(4))
      assert(pr >= 0.0 && pr <= 1.0, s"percent_rank out of [0,1]: $r")
      assert(cd > 0.0 && cd <= 1.0, s"cume_dist out of (0,1]: $r")
      assert(cd >= pr, s"cume_dist must dominate percent_rank: $r")
      assert(tile >= 1 && tile <= 4, s"ntile(4) out of range: $r")
    }
    // within a status, walking up the percent_rank order never decreases tile
    rows.groupBy(_.getString(1)).values.foreach { g =>
      val byPr = g.sortBy(_.getDouble(2)).map(_.getLong(4))
      assert(byPr.zip(byPr.tail).forall { case (a, b) => a <= b },
        "ntile must be monotone in rank order")
    }
  }
}
