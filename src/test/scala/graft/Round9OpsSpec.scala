package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic checks for the round-9 operators beyond the oracle gate:
  * stat-sketch verdicts (freqItems/sampleBy) and the lakehouse
  * re-clustering maintenance commit.
  */
class Round9OpsSpec extends AnyFunSuite with SparkFixture {

  test("agg_freq_items: every ~20% stratum is reported frequent and sampled near its fraction") {
    val rows = SparkEntry.queries("agg_freq_items")(spark, sf).collect()
    assert(rows.length == 5, s"expected the 5 market segments, got ${rows.length}")
    // at support 0.1 every ~20% segment carries the sketch guarantee
    assert(rows.forall(_.getBoolean(2)), "freqItems missed a >=support stratum")
    assert(rows.forall(_.getBoolean(3)), "sampleBy count outside 5-sigma of its fraction")
    // direct bound, independent of the op's own verdict arithmetic: the
    // deterministic seed-42 sample of each stratum is 20% +/- 5 sigma
    val cust = Tables.customer(spark, sf)
    val strata = cust.select("c_mktsegment").distinct().collect().map(_.getString(0))
    val got = cust.stat.sampleBy("c_mktsegment", strata.map(_ -> 0.2).toMap, 42L)
      .groupBy("c_mktsegment").agg(count(lit(1))).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      val (seg, n) = (r.getString(0), r.getLong(1))
      val s = got.getOrElse(seg, 0L).toDouble
      val sigma = math.sqrt(0.2 * 0.8 * n)
      assert(math.abs(s - 0.2 * n) <= 5 * sigma, s"$seg: sampled $s of $n")
    }
  }

  test("llm_bpe_encode: token totals tie out to the merge loop's final corpus size") {
    val enc = SparkEntry.queries("llm_bpe_encode")(spark, sf).collect()
    assert(enc.nonEmpty)
    // compression: merges only ever shrink words, and every 1-char word
    // stays 1 token, so tokens <= chars with strict gain somewhere
    val totToks = enc.map(_.getLong(4)).sum
    val totChars = enc.map(_.getLong(3)).sum
    assert(totToks <= totChars && totToks > 0)
    assert(totToks < totChars, "5 merge rounds must compress the corpus")
    // exact cross-op invariant: encoding the corpus with the learned
    // merges must account for EXACTLY the final n_syms the training loop
    // reported (same vocab, same corpus weights)
    val lastNSyms = SparkEntry.queries("llm_bpe_merge")(spark, sf)
      .orderBy(col("round").desc).limit(1).collect()(0).getLong(4)
    assert(totToks == lastNSyms,
      s"encode totals $totToks != training's final corpus symbols $lastNSyms")
  }

  test("llm_quality_classifier: non-degenerate split, keep_rate consistent") {
    val rows = SparkEntry.queries("llm_quality_classifier")(spark, sf).collect()
    val (docs, keeps) = (rows.map(_.getLong(1)).sum, rows.map(_.getLong(2)).sum)
    assert(keeps > 0 && keeps < docs,
      s"classifier must split the corpus, kept $keeps of $docs")
    rows.foreach { r =>
      val rate = r.getDouble(3)
      assert(rate >= 0.0 && rate <= 1.0)
      assert(math.abs(rate - r.getLong(2).toDouble / r.getLong(1)) < 1e-3)
    }
  }

  test("llm_data_mixture: epoch cap holds and reweighting points toward the target") {
    val rows = SparkEntry.queries("llm_data_mixture")(spark, sf).collect()
    val byLang = rows.map(r => r.getString(0) -> r).toMap
    rows.foreach { r =>
      val (toks, epochs, eff) = (r.getLong(2), r.getDouble(5), r.getLong(6))
      assert(epochs > 0.0 && epochs <= 3.0)
      assert(eff <= (3.0 * toks).toLong && math.abs(eff - epochs * toks) <= 1)
    }
    // 'en' dominates the corpus (actual ~0.55 > target 0.30) so it is
    // DOWN-sampled; the minority languages are up-sampled
    assert(byLang("en").getDouble(5) < 1.0)
    assert(byLang("de").getDouble(5) > 1.0)
  }

  test("agg_cms_freq: the sketch never underestimates and stays within the epsilon bound") {
    val rows = SparkEntry.queries("agg_cms_freq")(spark, sf).collect()
    assert(rows.length == 20)
    val n = Tables.orders(spark, sf).count()
    rows.foreach { r =>
      val (exact, est) = (r.getLong(1), r.getLong(2))
      assert(r.getBoolean(3) && est >= exact, s"CMS underestimated: $est < $exact")
      // Markov bound with d=4 rows, w=64 buckets: overshoot <= e/w * N holds
      // with prob 1-e^-4 per key; 4x that slack cannot flake on a fixed
      // dataset + fixed hash (it is deterministic here, this is a sanity rail)
      assert(est - exact <= 4 * math.E / 64 * n,
        s"CMS overshoot ${est - exact} implausibly large for N=$n")
    }
  }

  test("tpch_q11: every returned part sits above 1.5x the average supply value") {
    val rows = SparkEntry.queries("tpch_q11")(spark, sf).collect()
    assert(rows.nonEmpty)
    // recompute the unfiltered per-part rollup directly
    val v = Tables.lineitem(spark, sf)
      .join(Tables.supplier(spark, sf).where(col("s_nationkey").isin(3, 19)),
        col("s_suppkey") === col("l_suppkey"))
      .groupBy("l_partkey")
      .agg(sum(col("l_extendedprice").cast("decimal(18,4)")).as("v"))
      .collect().map(r => r.getLong(0) -> r.getDecimal(1).doubleValue()).toMap
    val avg = v.values.sum / v.size
    rows.foreach { r =>
      assert(r.getDouble(1) > 1.5 * avg - 1e-6,
        s"part ${r.getLong(0)} value ${r.getDouble(1)} under 1.5x avg $avg")
    }
    // and no part above the cut is missing
    assert(rows.length == v.values.count(_ * v.size * 2 > v.values.sum * 3))
  }

  test("tpch_q16: excluded brands/types/sizes and complaining suppliers never appear") {
    val rows = SparkEntry.queries("tpch_q16")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getString(0) != "Brand#1" && !r.getString(1).startsWith("PROMO"))
      assert(Set(1, 5, 9, 14, 19, 23, 36, 45).contains(r.getInt(2)))
    }
    // counts can never exceed the clean-supplier universe
    val good = Tables.supplier(spark, sf).where(col("s_acctbal") >= 0).count()
    assert(rows.forall(_.getLong(3) <= good))
  }

  test("tpch_q20: returned suppliers are exactly those with an above-half-average part") {
    val got = SparkEntry.queries("tpch_q20")(spark, sf).collect()
      .map(_.getString(0)).toSet
    val q = Tables.lineitem(spark, sf)
      .where(year(col("l_shipdate")) === 1997)
      .join(Tables.part(spark, sf).where(col("p_name").like("%a%"))
        .select("p_partkey"), col("p_partkey") === col("l_partkey"))
      .groupBy("l_partkey", "l_suppkey")
      .agg(sum(col("l_quantity").cast("bigint")).as("qty"))
    val pp = q.groupBy("l_partkey")
      .agg(sum("qty").as("tot"), count(lit(1)).as("nsup"))
    val expect = q.join(pp, "l_partkey")
      .where(col("qty") * col("nsup") * 2 > col("tot"))
      .join(Tables.supplier(spark, sf).where(col("s_nationkey").isin(7, 11, 19)),
        col("s_suppkey") === col("l_suppkey"))
      .select("s_name").distinct().collect().map(_.getString(0)).toSet
    assert(got == expect && got.nonEmpty)
  }

  test("win_ewma: a user's first event is its own EWMA; later rows stay inside the 8-frame hull") {
    val df = SparkEntry.queries("win_ewma")(spark, sf)
    val rows = df.collect()
    assert(rows.nonEmpty)
    // rebuild cents per (user, ts_us, event_id) to check hull bounds
    val cents = Tables.events(spark, sf)
      .select(col("user_id"), col("ts_us"), col("event_id"),
        floor(col("value") * 100).cast("bigint").as("c"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)) -> r.getLong(3)).toMap
    val byUser = rows.groupBy(_.getLong(0))
    byUser.foreach { case (_, rs) =>
      val sorted = rs.sortBy(r => (r.getLong(1), r.getLong(2)))
      val vals = sorted.map(r => cents((r.getLong(0), r.getLong(1), r.getLong(2))))
      // first row: EWMA == own value exactly
      assert(sorted.head.getLong(3) == vals.head)
      // every row: EWMA within [min, max] of its trailing 8 values
      sorted.zipWithIndex.foreach { case (r, i) =>
        val win = vals.slice(math.max(0, i - 7), i + 1)
        assert(r.getLong(3) >= win.min && r.getLong(3) <= win.max,
          s"ewma ${r.getLong(3)} outside hull [${win.min}, ${win.max}]")
      }
    }
  }

  test("llm_sample_weighted: exactly the bottom-50 priorities, favoring heavy docs") {
    val rows = SparkEntry.queries("llm_sample_weighted")(spark, sf).collect()
    assert(rows.length == 50)
    // recompute every doc's priority and check the cut is exact
    val all = Tables.documents(spark, sf)
      .select(col("doc_id"), col("n_chars").cast("bigint").as("w"),
        expr("CAST(conv(substring(md5(CAST(doc_id AS STRING)), 1, 15), 16, 10) AS BIGINT) DIV CAST(n_chars AS BIGINT)").as("p"))
      .where(col("w") > 0)
      .collect().map(r => (r.getLong(2), r.getLong(0), r.getLong(1)))
    val expect = all.sortBy(t => (t._1, t._2)).take(50).map(_._2).toSet
    assert(rows.map(_.getLong(0)).toSet == expect)
    // weighting law: the weighted draw favors long docs — the sample's
    // mean weight beats the corpus mean (deterministic on the fixture)
    val corpusMean = all.map(_._3).sum.toDouble / all.length
    val sampleMean = rows.map(_.getLong(1)).sum.toDouble / rows.length
    assert(sampleMean > corpusMean,
      s"weighted sample mean $sampleMean not above corpus mean $corpusMean")
  }

  test("llm_embed_pq: nibble-packed codes in range, error bounded by the grid step") {
    val rows = SparkEntry.queries("llm_embed_pq")(spark, sf).collect()
    assert(rows.nonEmpty)
    // 8 nibbles of 4 bits: code0 in [0, 16^8)
    assert(rows.forall(r => r.getLong(1) >= 0 && r.getLong(1) < (1L << 32)))
    // reconstruction error per element can't exceed the coarsest grid step
    val step = Tables.embeddings(spark, sf)
      .select(posexplode(col("embedding")))
      .withColumn("xm", floor(col("col").cast("double") * 10000).cast("bigint"))
      .groupBy("pos").agg((max("xm") - min("xm")).as("range"))
      .agg(max(expr("(range + 14) DIV 15"))).collect()(0).getLong(0)
    assert(rows.forall(_.getLong(3) <= step),
      s"err_max above the grid step $step")
  }

  test("stream_stream_left: the watermark-proven unmatched purchase emits a null row") {
    val rows = SparkEntry.queries("stream_stream_left")(spark, sf).collect()
    assert(rows.length == 4)
    val unmatched = rows.filter(_.isNullAt(3))
    assert(unmatched.length == 1 && unmatched(0).getLong(0) == 202L,
      "exactly purchase 202 must emit with NULL view columns")
    assert(rows.filter(!_.isNullAt(3)).length == 3)
  }

  test("graph_triangles: participation is 3x the triangle count and edges verify") {
    val rows = SparkEntry.queries("graph_triangles")(spark, sf).collect()
    assert(rows.length == Tables.nation(spark, sf).count())
    val total = rows.map(_.getLong(1)).sum
    assert(total > 0, "the heavy trade backbone must contain triangles")
    assert(total % 3 == 0, "each triangle contributes exactly 3 participations")
  }

  test("graph_bfs: one source at 0, frontier distances consistent, sentinel for unreached") {
    val rows = SparkEntry.queries("graph_bfs")(spark, sf).collect()
    assert(rows.length == Tables.nation(spark, sf).count())
    val dist = rows.map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(dist.values.count(_ == 0L) == 1, "exactly one source at distance 0")
    assert(dist.values.forall(v => (v >= 0 && v <= 4) || v == 99L),
      "distances are hop counts within the iteration budget or the sentinel")
    assert(dist.values.count(_ < 99L) > 1, "the backbone must reach beyond the source")
  }

  test("agg_hll_intersect: inclusion-exclusion verdicts hold and exacts tie out") {
    val r = SparkEntry.queries("agg_hll_intersect")(spark, sf).collect()
    assert(r.length == 1)
    val row = r(0)
    assert(row.getLong(0) + row.getLong(1) - row.getLong(2) == row.getLong(3),
      "union_exact must equal na + nb - inter")
    assert(row.getBoolean(4) && row.getBoolean(5),
      "sketch union and intersection estimates must land inside their bounds")
  }

  test("stream_update_agg: the update log re-emits only changed groups") {
    val rows = SparkEntry.queries("stream_update_agg")(spark, sf).collect()
    assert(rows.length == 4, "2 view updates + 1 click + 1 purchase")
    val byType = rows.groupBy(_.getString(0))
    assert(byType("click").length == 1, "click untouched by batch 2 must not re-emit")
    assert(byType("view").length == 2, "view changed in both batches")
    assert(byType("view").map(_.getLong(1)).max == 3L, "final view count")
  }

  test("llm_mmr_rerank: greedy picks are distinct, rank 1 is the relevance argmax") {
    val rows = SparkEntry.queries("llm_mmr_rerank")(spark, sf).collect()
    assert(rows.length == 5)
    assert(rows.map(_.getLong(1)).distinct.length == 5, "no repeated picks")
    val s1 = rows.find(_.getInt(0) == 1).get
    assert(s1.getLong(3) == 7 * rows.map(_.getLong(2)).max,
      "rank 1 must be the pure-relevance argmax (empty penalty)")
    // every later score is bounded by the first (penalties only subtract)
    assert(rows.forall(_.getLong(3) <= s1.getLong(3)))
  }

  test("graph_clustering_coeff: coefficients in [0,1] micro, tie out with triangles") {
    val rows = SparkEntry.queries("graph_clustering_coeff")(spark, sf).collect()
    assert(rows.length == Tables.nation(spark, sf).count())
    rows.foreach { r =>
      val (deg, tri, c) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(c >= 0 && c <= 1000000, s"coeff out of range: $c")
      if (deg < 2) assert(c == 0)
      else assert(c == (2 * tri * 1000000) / (deg * (deg - 1)))
    }
    // triangle column must agree with the graph_triangles op
    val triOp = SparkEntry.queries("graph_triangles")(spark, sf).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    rows.foreach(r => assert(r.getLong(2) == triOp(r.getInt(0))))
  }

  test("warehouse_expectations: clean fixture passes every gate at full metric") {
    val rows = SparkEntry.queries("warehouse_expectations")(spark, sf).collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      assert(r.getBoolean(2), s"${r.getString(0)} failed on the clean fixture")
      assert(r.getLong(1) == 1000000L, s"${r.getString(0)} metric not 100%")
    }
  }

  test("graph_pagerank: teleport floor, mass conservation, and full node coverage") {
    val rows = SparkEntry.queries("graph_pagerank")(spark, sf).collect()
    val nNations = Tables.nation(spark, sf).count()
    assert(rows.length == nNations, "one rank row per nation")
    val ranks = rows.map(_.getLong(1))
    // damping floor: every rank >= teleport mass 0.15 * 1e6
    assert(ranks.forall(_ >= 150000L))
    // total mass: bounded above by N * 1e6 (integer truncation + dangling
    // mass only ever LOSE rank) and must retain most of it
    assert(ranks.sum <= nNations * 1000000L)
    assert(ranks.sum >= (nNations * 1000000L * 7) / 10, s"lost too much mass: ${ranks.sum}")
    // rank double column is exactly micro/1e6
    rows.foreach(r => assert(r.getDouble(2) == r.getLong(1).toDouble / 1e6))
  }

  test("graph_components: labels close over edges, sizes tie out, isolates are singletons") {
    def L(r: org.apache.spark.sql.Row, i: Int): Long = r.getAs[Number](i).longValue
    val rows = SparkEntry.queries("graph_components")(spark, sf).collect()
    val comp = rows.map(r => L(r, 0) -> L(r, 1)).toMap
    assert(rows.length == Tables.nation(spark, sf).count())
    // a component label is always one of its members' ids (the minimum)
    val members = rows.groupBy(L(_, 1)).view.mapValues(_.map(L(_, 0)).toSet).toMap
    members.foreach { case (lab, ms) => assert(ms.contains(lab) && ms.min == lab) }
    // size column ties out with the actual partition
    rows.foreach(r => assert(L(r, 2) == members(L(r, 1)).size.toLong))
    // every backbone edge joins two nodes of the SAME component (closure —
    // 5 rounds actually converged on this graph)
    val edges = Tables.lineitem(spark, sf)
      .join(Tables.orders(spark, sf), col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(spark, sf), col("o_custkey") === col("c_custkey"))
      .join(Tables.supplier(spark, sf), col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("c_nationkey").as("src"), col("s_nationkey").as("dst"))
      .agg(count(lit(1)).as("w"))
    val und = edges.where(col("src") =!= col("dst"))
      .select(least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b"), col("w"))
      .groupBy("a", "b").agg(sum("w").as("w"))
    val tot = und.agg(sum("w").cast("long"), count(lit(1))).collect()(0)
    val (tw, ne) = (tot.getLong(0), tot.getLong(1))
    und.collect().filter(r => r.getLong(2) * ne > tw).foreach { r =>
      assert(comp(L(r, 0)) == comp(L(r, 1)),
        s"edge (${L(r, 0)},${L(r, 1)}) crosses components")
    }
  }

  test("llm_dedup_incremental equals the full dedup restricted to batch-vs-corpus pairs") {
    val inc = SparkEntry.queries("llm_dedup_incremental")(spark, sf).collect()
      .map(r => (Set(r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    // every returned pair is (new, old)
    SparkEntry.queries("llm_dedup_incremental")(spark, sf).collect().foreach { r =>
      assert(r.getLong(0) % 17 == 5 && r.getLong(1) % 17 != 5)
    }
    val full = SparkEntry.queries("llm_dedup_minhash")(spark, sf).collect()
      .filter(r => (r.getLong(0) % 17 == 5) != (r.getLong(1) % 17 == 5))
      .map(r => (Set(r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(inc == full,
      s"incremental ${inc.keySet} != restricted full dedup ${full.keySet}")
  }

  test("graph_label_prop: deterministic, labels are member ids, sizes partition the nodes") {
    def L(r: org.apache.spark.sql.Row, i: Int): Long = r.getAs[Number](i).longValue
    val a = SparkEntry.queries("graph_label_prop")(spark, sf).collect()
    val b = SparkEntry.queries("graph_label_prop")(spark, sf).collect()
    assert(a.map(_.toString).toSeq == b.map(_.toString).toSeq, "LPA must be deterministic")
    val byComm = a.groupBy(L(_, 1)).view.mapValues(_.map(L(_, 0)).toSet).toMap
    // sizes tie out and partition all nations
    a.foreach(r => assert(L(r, 2) == byComm(L(r, 1)).size.toLong))
    assert(byComm.values.map(_.size).sum == a.length)
    // each community label is a real node id (labels only ever propagate)
    val nodes = a.map(L(_, 0)).toSet
    byComm.keys.foreach(lab => assert(nodes.contains(lab)))
  }
}
