package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic checks for the round-7 operators (beyond the smoke/oracle
  * gates): behavioral analytics (cohorts, streaks, attribution, mode),
  * the TPC-H Q1/Q6/Q18 showcase trio, URL parsing, fuzzy dedup, and
  * embedding quantization.
  */
class Round7OpsSpec extends AnyFunSuite with SparkFixture {

  test("agg_cohort_retention: offsets non-negative, week-0 users cover every cohort member") {
    val rows = SparkEntry.queries("agg_cohort_retention")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getLong(1) >= 0, "negative week_offset"))
    // week 0 exists for every cohort (a user's first week is active by
    // definition) and is the max-retention row of its cohort
    val byCohort = rows.groupBy(_.getString(0))
    byCohort.foreach { case (ck, rs) =>
      val w0 = rs.find(_.getLong(1) == 0L)
      assert(w0.isDefined, s"cohort $ck missing week 0")
      assert(rs.forall(_.getLong(2) <= w0.get.getLong(2)),
        s"cohort $ck has a week retaining more users than week 0")
    }
  }

  test("win_gaps_islands: streak totals match a driver-side reference per user") {
    val got = SparkEntry.queries("win_gaps_islands")(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val days = Tables.events(spark, sf)
      .select(col("user_id"), datediff(to_date(col("ts")), lit("1970-01-01")).cast("long"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
    days.groupBy(_._1).foreach { case (u, ds) =>
      val sorted = ds.map(_._2).sorted
      // reference: count islands by scanning consecutive diffs
      var nStreaks = 1L; var cur = 1L; var maxS = 1L
      sorted.toSeq.sliding(2).foreach {
        case Seq(a, b) =>
          if (b == a + 1) { cur += 1 } else { nStreaks += 1; cur = 1 }
          maxS = math.max(maxS, cur)
        case _ => ()
      }
      val (nDays, gotStreaks, gotMax) = got(u)
      assert(nDays == sorted.length.toLong, s"user $u active days")
      assert(gotStreaks == nStreaks, s"user $u streak count")
      assert(gotMax == maxS, s"user $u max streak")
    }
  }

  test("win_attribution: purchase count is conserved and untouched users land in (none)") {
    val rows = SparkEntry.queries("win_attribution")(spark, sf).collect()
    val total = rows.map(_.getLong(2)).sum
    val purchases = Tables.events(spark, sf)
      .where(col("event_type") === "purchase").count()
    assert(total == purchases, "attributed purchases != total purchases")
    // a (none) first_touch must pair with a (none) last_touch: no prior
    // non-purchase event means both frames were empty
    rows.filter(_.getString(0) == "(none)")
      .foreach(r => assert(r.getString(1) == "(none)"))
  }

  test("agg_mode picks the max-count value with the deterministic tie-break") {
    val counts = Tables.orders(spark, sf)
      .groupBy("o_orderstatus", "o_orderpriority").count().collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val want = counts.groupBy(_._1).map { case (st, rs) =>
      st -> rs.map(r => (r._3, r._2)).toSeq.sortBy(x => (-x._1, x._2)).head
    }
    SparkEntry.queries("agg_mode")(spark, sf).collect().foreach { r =>
      val (n, prio) = want(r.getString(0))
      assert(r.getString(1) == prio && r.getLong(2) == n, s"mode for ${r.getString(0)}")
    }
  }

  test("tpch_q1: group sums reconcile with the ungrouped totals") {
    val rows = SparkEntry.queries("tpch_q1")(spark, sf).collect()
    assert(rows.nonEmpty)
    val cnt = rows.map(_.getLong(9)).sum
    val expected = Tables.lineitem(spark, sf)
      .where(col("l_shipdate") <= lit("1998-09-02").cast("timestamp")).count()
    assert(cnt == expected, "count_order total")
    rows.foreach { r =>
      assert(math.abs(r.getDouble(6) - r.getLong(2).toDouble / r.getLong(9)) < 1e-9,
        "avg_qty inconsistent with sum_qty/count")
    }
  }

  test("tpch_q6 equals the filtered exact-decimal sum computed directly") {
    val got = SparkEntry.queries("tpch_q6")(spark, sf).collect()(0).getDouble(0)
    val want = Tables.lineitem(spark, sf)
      .where(col("l_shipdate") >= lit("1996-01-01").cast("timestamp")
        && col("l_shipdate") < lit("1997-01-01").cast("timestamp")
        && col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
      .agg(sum((col("l_extendedprice") * col("l_discount")).cast("decimal(18,4)")))
      .collect()(0).getDecimal(0)
    assert(got == want.doubleValue, "q6 revenue")
  }

  test("tpch_q18: every survivor clears the quantity threshold; ordering is total") {
    val rows = SparkEntry.queries("tpch_q18")(spark, sf).collect()
    rows.foreach(r => assert(r.getLong(5) > 300, "total_qty below threshold"))
    val keys = rows.map(r => (-r.getDouble(4), r.getLong(2)))
    assert(keys.toSeq == keys.toSeq.sorted, "not ordered by (price desc, orderkey)")
  }

  test("fn_url components reassemble into the original url") {
    SparkEntry.queries("fn_url")(spark, sf).collect().foreach { r =>
      val (url, host, path, query) = (r.getString(1), r.getString(2), r.getString(3), r.getString(4))
      assert(url == s"https://$host$path?$query", s"decomposition of $url")
      assert(r.getString(5) == (r.getLong(0) % 7).toString, "p_param")
    }
  }

  test("llm_dedup_fuzzy: zero-distance pairs are exactly the equal 40-char prefixes") {
    val pairs = SparkEntry.queries("llm_dedup_fuzzy")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val pre = Tables.documents(spark, sf)
      .select(col("doc_id"), substring(col("text"), 1, 40)).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    pairs.foreach { case (a, b, lev) =>
      assert(a < b, "pair not canonically ordered")
      assert((lev == 0L) == (pre(a) == pre(b)), s"lev($a,$b) zero-iff-equal")
    }
  }

  test("set_intersect_all multiplicities are the min of the two sides' counts") {
    val got = SparkEntry.queries("set_intersect_all")(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val ca = Tables.customer(spark, sf)
      .groupBy(col("c_nationkey").cast("bigint")).count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val sb = Tables.supplier(spark, sf).where(col("s_acctbal") > 2000)
      .groupBy(col("s_nationkey").cast("bigint")).count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = ca.keySet.intersect(sb.keySet)
      .map(k => k -> math.min(ca(k), sb(k))).toMap
    assert(got == want)
  }

  test("subquery_exists equals the semi/anti-join composition") {
    val got = SparkEntry.queries("subquery_exists")(spark, sf).collect()
      .map(_.getLong(0)).toSet
    val o = Tables.orders(spark, sf)
    val want = Tables.customer(spark, sf)
      .join(o.where(col("o_orderstatus") === "F"),
        col("c_custkey") === col("o_custkey"), "left_semi")
      .join(o.where(col("o_totalprice") > 400000),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .select("c_custkey").collect().map(_.getLong(0)).toSet
    assert(got == want)
  }

  test("win_ratio_to_report shares sum to 1 per partition") {
    val rows = SparkEntry.queries("win_ratio_to_report")(spark, sf).collect()
    rows.groupBy(_.getString(1)).foreach { case (st, rs) =>
      val cents = rs.map(_.getLong(2)).sum
      assert(rs.forall(_.getLong(3) == cents), s"$st grp_cents inconsistent")
      assert(math.abs(rs.map(_.getDouble(4)).sum - 1.0) < 1e-9, s"$st shares != 1")
    }
  }

  test("llm_corpus_stats token totals and dup rate reconcile") {
    val rows = SparkEntry.queries("llm_corpus_stats")(spark, sf).collect()
    val totalDocs = rows.map(_.getLong(1)).sum
    assert(totalDocs == Tables.documents(spark, sf).count())
    rows.foreach { r =>
      assert(r.getLong(4) <= r.getLong(1), "distinct texts exceed docs")
      assert(r.getLong(7) <= r.getLong(8), "min_tok > max_tok")
      assert(r.getDouble(5) >= 0.0 && r.getDouble(5) < 1.0, "dup_rate range")
    }
  }

  test("mm_patchify: full interior patches are 64 bytes; grid covers the payload") {
    val rows = SparkEntry.queries("mm_patchify")(spark, sf).collect()
    assert(rows.nonEmpty)
    val lens = Tables.documents(spark, sf).where(col("doc_id") % 20 === 1)
      .select(col("doc_id"), length(col("text"))).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    rows.groupBy(_.getLong(0)).foreach { case (doc, rs) =>
      val covered = rs.map(_.getInt(3)).sum
      assert(covered == lens(doc), s"doc $doc patch bytes != payload length")
      // every patch except those on the ragged edge is exactly 8*8 bytes
      rs.foreach(r => assert(r.getInt(3) <= 64, "patch overflow"))
    }
  }

  test("agg_corr_matrix: diagonal-free pairs in [-1,1], builtin within tolerance") {
    val rows = SparkEntry.queries("agg_corr_matrix")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      Seq(2, 3, 4).foreach { i =>
        assert(math.abs(r.getDouble(i)) <= 1.0 + 1e-12, s"corr col $i out of range")
      }
      assert(r.getBoolean(5), "builtin corr out of tolerance")
    }
  }

  test("tpch_q7 is symmetric: both nation orientations present with 1995/1996 years") {
    val rows = SparkEntry.queries("tpch_q7")(spark, sf).collect()
    assert(rows.nonEmpty)
    val pairs = rows.map(r => (r.getString(0), r.getString(1))).toSet
    pairs.foreach { case (a, b) => assert(a != b, "self-pair leaked") }
    rows.foreach(r => assert(Set(1995, 1996).contains(r.getInt(2)), "year outside filter"))
  }

  test("win_running_median: last value per user equals the full-frame exact median") {
    def medianOf(xs: Seq[Long]): Double = {
      val s = xs.sorted; val n = s.length
      if (n % 2 == 1) s(n / 2).toDouble else (s(n / 2 - 1) + s(n / 2)) / 2.0
    }
    val rows = SparkEntry.queries("win_running_median")(spark, sf).collect()
    val byUser = rows.groupBy(_.getLong(0))
    byUser.foreach { case (u, rs) =>
      val ordered = rs.sortBy(r => (r.getLong(1), r.getLong(2)))
      assert(ordered.last.getDouble(4) == medianOf(ordered.map(_.getLong(3)).toSeq),
        s"user $u final running median")
      // prefix check at the midpoint too
      val half = ordered.take(ordered.length / 2 + 1)
      assert(half.last.getDouble(4) == medianOf(half.map(_.getLong(3)).toSeq),
        s"user $u midpoint running median")
    }
  }

  test("tpch_q8/q14 shares are fractions of their own totals") {
    SparkEntry.queries("tpch_q8")(spark, sf).collect().foreach { r =>
      val (nat, tot, share) = (r.getDouble(1), r.getDouble(2), r.getDouble(3))
      assert(nat >= 0 && nat <= tot, "nation slice outside total")
      assert(share == nat / tot, "share not the declared division")
    }
    val q14 = SparkEntry.queries("tpch_q14")(spark, sf).collect()(0)
    assert(q14.getDouble(0) <= q14.getDouble(1))
    assert(q14.getDouble(2) >= 0.0 && q14.getDouble(2) <= 100.0)
  }

  test("agg_weighted_stats matches a driver-side weighted reference") {
    val got = SparkEntry.queries("agg_weighted_stats")(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    Tables.lineitem(spark, sf)
      .select(col("l_returnflag"), col("l_quantity").cast("long"),
        round(col("l_extendedprice") * 100).cast("long")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).groupBy(_._1)
      .foreach { case (flag, rows) =>
        val sw = rows.map(_._2).sum.toDouble
        val swx = rows.map(r => BigInt(r._2) * BigInt(r._3)).sum.toDouble
        val (gsw, gmean, gvar) = got(flag)
        assert(gsw == sw, s"$flag weight total")
        assert(math.abs(gmean - swx / sw) <= math.abs(gmean) * 1e-12, s"$flag wmean")
        assert(gvar > 0, s"$flag wvar sign")
      }
  }

  test("win_lead_lag_nulls: prev_nn is the nearest preceding non-null value") {
    val rows = SparkEntry.queries("win_lead_lag_nulls")(spark, sf).collect()
    rows.groupBy(_.getLong(0)).foreach { case (u, rs) =>
      val ordered = rs.sortBy(r => (r.getLong(1), r.getLong(2)))
      var lastNN: Option[Long] = None
      ordered.foreach { r =>
        val got = if (r.isNullAt(4)) None else Some(r.getLong(4))
        assert(got == lastNN, s"user $u prev_nn at ts ${r.getLong(1)}")
        if (!r.isNullAt(3)) lastNN = Some(r.getLong(3))
      }
    }
  }

  test("llm_ngram_overlap pairs respect the split and the overlap floor") {
    val rows = SparkEntry.queries("llm_ngram_overlap")(spark, sf).collect()
    rows.foreach { r =>
      assert(r.getLong(0) != r.getLong(1), "self-pair across split is impossible")
      assert(r.getDouble(3) >= 0.2 && r.getDouble(3) <= 1.0, "overlap out of band")
      assert(r.getLong(2) >= 1)
    }
  }

  test("ds_typed_agg equals the untyped column-expression aggregate") {
    val typedRows = SparkEntry.queries("ds_typed_agg")(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val untyped = Tables.lineitem(spark, sf).where(col("l_quantity") >= 10.0)
      .groupBy("l_returnflag")
      .agg(sum(col("l_quantity").cast("long")), sum(round(col("l_extendedprice") * 100).cast("long")), count(lit(1)))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(typedRows == untyped)
  }

  test("fn_na_handling: every view row is filled, non-view rows are not") {
    SparkEntry.queries("fn_na_handling")(spark, sf).collect().foreach { r =>
      if (r.getString(0) == "view") assert(r.getLong(1) == r.getLong(2), "views not all filled")
      else assert(r.getLong(2) == 0L, s"${r.getString(0)} rows spuriously filled")
    }
  }

  test("agg_crosstab cells sum to the orders row count") {
    val rows = SparkEntry.queries("agg_crosstab")(spark, sf).collect()
    val total = rows.map(r => (1 until r.length).map(i => r.getLong(i)).sum).sum
    assert(total == Tables.orders(spark, sf).count(), "crosstab cells != row count")
  }

  test("udtf_explode_outer keeps empty-list docs as a single null-token row") {
    val rows = SparkEntry.queries("udtf_explode_outer")(spark, sf).collect()
    assert(rows.length == Tables.documents(spark, sf).count().toInt,
      "outer explode dropped docs")
    rows.foreach { r =>
      if (r.getLong(2) == 0L) assert(r.getLong(1) == 1L, s"doc ${r.getLong(0)} empty-list row count")
      else assert(r.getLong(1) == r.getLong(2), s"doc ${r.getLong(0)} row/token mismatch")
    }
  }

  test("sink_range_sorted writes one sorted file per range partition") {
    SparkEntry.queries("sink_range_sorted")(spark, sf).collect()
    val dir = new java.io.File(s"${graft.ops.Scratch.dir}").listFiles()
      .filter(f => f.getName.startsWith("range_sorted_") && f.getName.contains("sf0.001")).head
    val parts = dir.listFiles().count(_.getName.endsWith(".parquet"))
    assert(parts == 4, s"expected 4 range files, saw $parts")
  }

  test("fn_array_hof matches a driver-side recomputation per doc") {
    val texts = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ", -1)).toMap
    SparkEntry.queries("fn_array_hof")(spark, sf).collect().foreach { r =>
      val toks = texts(r.getLong(0))
      val lens = toks.map(_.length)
      assert(r.getInt(1) == toks.length, "n")
      assert(r.getInt(2) == lens.zip(lens.reverse).map { case (a, b) => a * b }.sum, "zsum")
      assert(r.getBoolean(3) == lens.exists(_ >= 7), "any_long")
      assert(r.getBoolean(4) == lens.forall(_ <= 12), "all_short")
      assert(r.getLong(5) == (toks.indexOf("data") + 1).toLong, "pos_data")
    }
  }

  test("agg_grouping_id: bit vector matches null pattern, totals reconcile") {
    val rows = SparkEntry.queries("agg_grouping_id")(spark, sf).collect()
    val total = Tables.lineitem(spark, sf).count()
    assert(rows.filter(_.getLong(5) == 3L).map(_.getLong(2)).sum == total, "grand total")
    assert(rows.filter(_.getLong(5) == 0L).map(_.getLong(2)).sum == total, "leaf total")
    rows.foreach { r =>
      val gid = (r.getInt(3).toLong << 1) | r.getInt(4).toLong
      assert(gid == r.getLong(5), "grouping_id != packed grouping bits")
      assert((r.getInt(3) == 1) == (r.getString(0) == "(all)"), "flag bit vs null")
      assert((r.getInt(4) == 1) == (r.getString(1) == "(all)"), "status bit vs null")
    }
  }

  test("llm_embed_quantize: q_norm2 bounds, saturation counted, scale positive") {
    val rows = SparkEntry.queries("llm_embed_quantize")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (dim, maxAbs, qn2, nSat) = (r.getLong(1), r.getDouble(2), r.getLong(4), r.getLong(5))
      assert(maxAbs > 0)
      assert(nSat >= 1, "the max-|x| component must quantize to ±127")
      assert(qn2 <= dim * 127L * 127L, "q_norm2 exceeds dim*127^2")
    }
  }
}
