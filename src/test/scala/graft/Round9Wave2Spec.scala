package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic checks for the round-9 continuation-wave operators beyond the
  * oracle gate: k-core invariants, ACF bounds, readability-score algebra,
  * and shard-packing conservation.
  */
class Round9Wave2Spec extends AnyFunSuite with SparkFixture {

  test("graph_kcore: k-core invariants hold (deg >= k, handshake parity, proper subset)") {
    val rows = SparkEntry.queries("graph_kcore")(spark, SparkFixture.sf001).collect()
    assert(rows.nonEmpty, "fixture backbone must have a non-empty 6-core")
    // definitional invariant: every member's in-core degree >= k
    assert(rows.forall(_.getLong(1) >= 6L),
      s"node below k in reported core: ${rows.filter(_.getLong(1) < 6L).mkString(",")}")
    // handshake: degrees double-count edges, so their sum is even
    assert(rows.map(_.getLong(1)).sum % 2 == 0)
    // the peel must actually remove a shell (25-nation domain)
    val nNations = Tables.nation(spark, SparkFixture.sf001).count()
    assert(rows.length < nNations, "peeling removed nothing — k too small to grade")
  }

  test("win_acf: one row per lag, |acf| <= 1, pair counts tie out to the day span") {
    val rows = SparkEntry.queries("win_acf")(spark, SparkFixture.sf001)
      .collect().sortBy(_.getLong(0))
    assert(rows.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L))
    rows.foreach { r =>
      assert(math.abs(r.getDouble(2)) <= 1.0 + 1e-12, s"ACF out of [-1,1]: $r")
    }
    // contiguous daily series: lag k has exactly n_days - k pairs
    val nDays = Tables.events(spark, SparkFixture.sf001)
      .select(to_date(col("ts"))).distinct().count()
    rows.foreach(r => assert(r.getLong(1) == nDays - r.getLong(0),
      s"lag ${r.getLong(0)}: ${r.getLong(1)} pairs vs $nDays days"))
  }

  test("llm_readability: per-lang rollup is internally consistent and bounded") {
    val rows = SparkEntry.queries("llm_readability")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, words, syll) = (r.getLong(1), r.getLong(2), r.getLong(3))
      val (avg, lo, hi) = (r.getLong(4), r.getLong(5), r.getLong(6))
      assert(n > 0 && words >= n && syll > 0)
      // vowel groups never outnumber non-space tokens by more than the
      // corpus' word length bound
      assert(syll <= words * 20)
      assert(lo <= avg && avg <= hi, s"avg outside [min,max]: $r")
      // formula ceiling: 206.835 in micro-units, minus at least one
      // positive word/sentence term
      assert(hi < 206835000L)
    }
  }

  test("mm_shard_pack: conservation, fill arithmetic, and bounded shard overshoot") {
    val rows = SparkEntry.queries("mm_shard_pack")(spark, sf).collect()
    val docs = Tables.documents(spark, sf)
      .agg(count(lit(1)), sum(col("n_chars") + 64L)).collect()(0)
    assert(rows.map(_.getLong(1)).sum == docs.getLong(0), "every doc lands in one shard")
    assert(rows.map(_.getLong(2)).sum == docs.getLong(1), "byte conservation")
    val maxRec = Tables.documents(spark, sf)
      .agg(max(col("n_chars") + 64L)).collect()(0).getLong(0)
    rows.foreach { r =>
      // first-byte assignment: a shard holds < budget of START bytes, so
      // its total payload is < budget + the largest single record
      assert(r.getLong(2) < 4096L + maxRec, s"shard overshoots budget+maxrec: $r")
      assert(r.getLong(5) == r.getLong(2) * 1000 / 4096, s"fill arithmetic: $r")
      assert(r.getLong(3) <= r.getLong(4), "id range ordered")
    }
  }

  test("graph_closeness: harmonic bounds, full node domain, symmetric reachability") {
    val rows = SparkEntry.queries("graph_closeness")(spark, SparkFixture.sf001).collect()
    assert(rows.length == 25, "one row per nation")
    rows.foreach { r =>
      val (reach, h) = (r.getLong(1), r.getLong(2))
      assert(reach >= 0 && reach <= 24)
      // every reciprocal term is in (0, 1e6]: 1e6/d with d >= 1
      assert(h <= reach * 1000000L && (reach == 0 || h > 0), s"harmonic out of bounds: $r")
    }
    // undirected distances are symmetric, so ordered reachable pairs are even
    assert(rows.map(_.getLong(1)).sum % 2 == 0)
  }

  test("stream_dedup_watermark: in-window dup dropped, evicted key re-emitted") {
    val rows = SparkEntry.queries("stream_dedup_watermark")(spark, sf).collect()
    val byId = rows.groupBy(_.getLong(0)).map { case (k, v) => k -> v.length }
    assert(byId == Map(1L -> 2, 2L -> 1, 3L -> 1),
      s"within-watermark semantics violated: $byId")
  }

  test("mm_resolution_bucket: all images routed once, pad accounting sane") {
    val rows = SparkEntry.queries("mm_resolution_bucket")(spark, sf).collect()
    val nDocs = Tables.documents(spark, sf).count()
    assert(rows.map(_.getLong(3)).sum == nDocs, "every image in exactly one bucket")
    rows.foreach { r =>
      val (tw, th, n, pad, ppm) = (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(5), r.getLong(6))
      // resize-to-fit never exceeds the target, so padding is non-negative
      // and below the full target area
      assert(pad >= 0 && pad < n * tw * th, s"pad out of range: $r")
      assert(ppm >= 0 && ppm < 1000000L, s"ppm out of range: $r")
    }
  }

  test("llm_interleave_mixture: WFQ schedule honors the weight proportions") {
    val rows = SparkEntry.queries("llm_interleave_mixture")(spark, SparkFixture.sf001).collect()
    assert(rows.length == 200)
    assert(rows.map(_.getLong(0)).toSeq == (1L to 200L), "dense positions")
    val counts = rows.groupBy(_.getString(2)).map { case (k, v) => k -> v.length }
    val weights = Map("en" -> 5, "es" -> 3, "de" -> 3, "fr" -> 2, "zh" -> 2)
    val wSum = weights.values.sum
    // WFQ guarantee: every prefix carries each source in weight proportion
    // (±2 discretization slack; no source exhausts at sf0.01)
    weights.foreach { case (lang, w) =>
      val expected = 200.0 * w / wSum
      val got = counts.getOrElse(lang, 0)
      assert(math.abs(got - expected) <= 2.5, s"$lang: $got vs ~$expected")
    }
  }

  test("agg_theil_sen: pair counts are n-choose-2 of each type's day span") {
    val rows = SparkEntry.queries("agg_theil_sen")(spark, sf).collect()
    assert(rows.nonEmpty)
    val days = Tables.events(spark, sf)
      .groupBy("event_type").agg(countDistinct(to_date(col("ts"))).as("nd"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      val nd = days(r.getString(0))
      assert(r.getLong(1) == nd * (nd - 1) / 2, s"pair count mismatch: $r")
      // a daily count series can't have a median slope steeper than its range
      assert(math.abs(r.getDouble(2)) < 10000.0)
    }
  }

  test("graph_path_counts: source seeds 1 path at dist 0, layer-1 counts are 1") {
    val rows = SparkEntry.queries("graph_path_counts")(spark, SparkFixture.sf001).collect()
    val byDist = rows.groupBy(_.getLong(2))
    assert(byDist(0L).length == 1 && byDist(0L).head.getLong(1) == 1L)
    // simple graph: exactly one shortest path to every direct neighbor
    byDist.get(1L).foreach(l => assert(l.forall(_.getLong(1) == 1L)))
    assert(rows.forall(r => r.getLong(1) >= 1L && r.getLong(2) <= 4L))
    // layers are disjoint: each node appears once
    assert(rows.map(_.getLong(0)).distinct.length == rows.length)
  }

  test("llm_importance_resample: systematic draw hits ~K per stratum, weights conserved") {
    val rows = SparkEntry.queries("llm_importance_resample")(spark, SparkFixture.sf001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nDocs, wTot, nSel, wSel) = (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      // boundary-crossing selection emits at most K=50 docs and at least
      // one per non-empty stratum; selected weight is a sub-multiset
      assert(nSel >= 1 && nSel <= 50 && nSel <= nDocs, s"selection count: $r")
      assert(wSel > 0 && wSel <= wTot, s"weight conservation: $r")
    }
  }

  test("source_parquet_encrypted: both verdicts hold and the rollup matches plaintext") {
    val rows = SparkEntry.queries("source_parquet_encrypted")(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getBoolean(3)), "files must carry the PARE encrypted-footer magic")
    assert(rows.forall(_.getBoolean(4)), "keyless read must be denied")
    val plain = Tables.orders(spark, sf).groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.foreach(r => assert(r.getLong(1) == plain(r.getString(0)),
      s"authorized read must see exactly the plaintext rows: $r"))
  }

  test("win_changepoint: rank in range; the full-series CUSUM closes at zero") {
    val rows = SparkEntry.queries("win_changepoint")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, rank) = (r.getLong(1), r.getLong(2))
      assert(rank >= 1 && rank <= n, s"rank out of range: $r")
      // stat_n = n*S1 - n*S1 = 0, so a nonzero max-|stat| pick is < n
      assert(r.getLong(4) == 0L || rank < n, s"nonzero stat at series end: $r")
    }
  }

  test("join_asof_tolerance: subset of the native asof within the 24h bound") {
    val tol = SparkEntry.queries("join_asof_tolerance")(spark, sf).collect()
    val full = SparkEntry.queries("join_asof_native")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(3))).toSet
    assert(tol.nonEmpty && tol.length <= full.size)
    tol.foreach { r =>
      assert(full.contains((r.getLong(0), r.getLong(3))),
        s"tolerance row not in the unbounded asof: $r")
      val gap = r.getLong(5)
      assert(gap >= 0 && gap <= 1440, s"gap outside 24h: $r")
    }
  }

  test("graph_stress: degree-1 backbone nodes are never interior to a shortest path") {
    val stress = SparkEntry.queries("graph_stress")(spark, SparkFixture.sf001)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(stress.values.forall(_ >= 0L))
    assert(stress.values.exists(_ > 0L), "some node must carry traffic")
    // clustering_coeff's node column keeps the parquet int width
    val deg = SparkEntry.queries("graph_clustering_coeff")(spark, SparkFixture.sf001)
      .collect().map(r => r.getAs[Number](0).longValue -> r.getLong(1)).toMap
    deg.filter(_._2 <= 1).keys.foreach { n =>
      assert(stress(n) == 0L, s"degree<=1 node $n has nonzero stress")
    }
  }
}
