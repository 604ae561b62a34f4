package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic checks for the round-7 API/function wave: map HOFs, array
  * generators, COUNT(DISTINCT) windows, Observation metrics, transpose,
  * JSONL roundtrip, and URL-canonicalization dedup.
  */
class ApiWaveSpec extends AnyFunSuite with SparkFixture {

  test("fn_map_hof lambdas follow the p_size arithmetic") {
    val sizes = Tables.part(spark, sf).select("p_partkey", "p_size").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    SparkEntry.queries("fn_map_hof")(spark, sf).collect().foreach { r =>
      val p = sizes(r.getLong(0))
      assert(r.getString(1) == s"${p + 1},${2 * p + 1},${3 * p + 1}", "transform_values")
      assert(r.getString(2) == s"a${p % 2},b0,c${p % 2}", "transform_keys")
      assert(r.getInt(3) == (if (p % 2 == 0) 3 else 1), "map_filter")
      assert(r.getString(4) == s"${2 * p},${4 * p},${6 * p}", "map_zip_with")
    }
  }

  test("fn_array_gen: triangular sums and descending odd/even ladders") {
    SparkEntry.queries("fn_array_gen")(spark, sf).collect().foreach { r =>
      val n = r.getInt(1).toLong
      assert(r.getLong(2) == n * (n + 1) / 2, "aggregate over sequence")
      assert(r.getString(4).split(",").head == "1" && r.getString(4).endsWith(",0"), "flatten")
      val lad = r.getString(5).split(",").map(_.toLong)
      assert(lad.head == n && lad.last >= 1 && lad.sliding(2).forall {
        case Array(a, b) => a - b == 2; case _ => true
      }, "negative-step sequence")
    }
  }

  test("win_count_distinct equals groupBy countDistinct per segment") {
    val expected = Tables.customer(spark, sf).groupBy("c_mktsegment")
      .agg(countDistinct("c_nationkey").as("nd")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    SparkEntry.queries("win_count_distinct")(spark, sf).collect().foreach { r =>
      assert(r.getLong(2) == expected(r.getString(1)), s"segment ${r.getString(1)}")
    }
  }

  test("api_observe metrics equal the direct aggregate (no second pass needed)") {
    val got = SparkEntry.queries("api_observe")(spark, sf).collect()(0)
    val direct = Tables.orders(spark, sf).agg(
      count(lit(1)), sum(expr("CAST(o_totalprice AS DECIMAL(18,4))")).cast("double"),
      min("o_orderkey"), max("o_orderkey")).collect()(0)
    assert(got.getLong(0) == direct.getLong(0))
    assert(got.getDouble(1) == direct.getDouble(1))
    assert(got.getLong(2) == direct.getLong(2) && got.getLong(3) == direct.getLong(3))
  }

  test("api_transpose is the exact pivot of the pre-aggregate") {
    val pre = Tables.lineitem(spark, sf).groupBy("l_returnflag")
      .agg(sum(col("l_quantity").cast("bigint")).as("qty"), count(lit(1)).as("cnt"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val t = SparkEntry.queries("api_transpose")(spark, sf)
    assert(t.columns.head == "key" && t.columns.tail.sorted.sameElements(pre.keys.toArray.sorted))
    val rows = t.collect().map(r => r.getString(0) ->
      t.columns.tail.zipWithIndex.map { case (c, i) => c -> r.getLong(i + 1) }.toMap).toMap
    pre.foreach { case (flag, (qty, cnt)) =>
      assert(rows("qty")(flag) == qty && rows("cnt")(flag) == cnt, s"flag $flag")
    }
  }

  test("sink_jsonl roundtrip conserves documents per language") {
    val got = SparkEntry.queries("sink_jsonl")(spark, sf).collect()
    assert(got.map(_.getLong(1)).sum == Tables.documents(spark, sf).count())
    val chars = Tables.documents(spark, sf).groupBy("lang")
      .agg(sum("n_chars")).collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    got.foreach(r => assert(r.getLong(2) == chars(r.getString(0)), s"lang ${r.getString(0)}"))
  }

  test("llm_dedup_url: groups are real collisions and keepers are group minima") {
    val rows = SparkEntry.queries("llm_dedup_url")(spark, sf).collect()
    assert(rows.forall(_.getLong(1) >= 2), "a reported group must be a duplicate")
    // independent canonicalization
    val canon = Tables.documents(spark, sf)
      .select(col("doc_id"), concat(lower(col("source")), lit(".example.com/"),
        col("lang"), lit("/doc/"), col("doc_id") % 100).as("curl"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val groups = canon.groupBy(_._2).view.mapValues(_.map(_._1)).toMap
    rows.foreach { r =>
      val ids = groups(r.getString(0))
      assert(ids.length.toLong == r.getLong(1), "group size")
      assert(ids.min == r.getLong(2), "keeper is min doc_id")
    }
    assert(rows.length == groups.count(_._2.length > 1), "every dup group reported")
  }

  test("llm_ppl_filter: scores positive, internally consistent, worst-first") {
    val rows = SparkEntry.queries("llm_ppl_filter")(spark, sf).collect()
    assert(rows.nonEmpty && rows.length <= 25)
    rows.foreach { r =>
      assert(r.getLong(2) >= 0, "negative NLL sum for an in-corpus bigram")
      assert(r.getDouble(3) == r.getLong(2).toDouble / (r.getLong(1).toDouble * 1e6),
        "avg is not the declared division")
    }
    val avgs = rows.map(_.getDouble(3))
    assert(avgs.zip(avgs.tail).forall { case (a, b) => a >= b }, "not worst-first")
  }

  test("llm_bm25: top-k ranked by descending score, recomputed driver-side") {
    val rows = SparkEntry.queries("llm_bm25")(spark, sf).collect()
    assert(rows.nonEmpty && rows.length <= 20)
    val scores = rows.map(_.getLong(2))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b }, "not score-desc")
    assert(scores.forall(_ > 0), "BM25 with +1 idf must be positive")
    // driver-side BM25 recount over the same tokenization and constants
    val docs = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ", -1))
    val q = Set("vector", "stream", "hash")
    val n = docs.length.toDouble
    val avgdl = docs.map(_._2.length.toLong).sum.toDouble / n
    val tf = docs.map { case (id, t) =>
      id -> t.filter(q).groupBy(identity).view.mapValues(_.length).toMap }.toMap
    val df = q.map(w => w -> tf.values.count(_.contains(w))).toMap
    val expect = tf.collect { case (id, m) if m.nonEmpty =>
      id -> m.map { case (w, f) =>
        math.round(math.log((n - df(w) + 0.5) / (df(w) + 0.5) + 1.0) * (f * 2.2) /
          (f + 1.2 * (0.25 + 0.75 * docs.find(_._1 == id).get._2.length / avgdl)) * 1e6)
      }.sum
    }.toSeq.sortBy { case (id, s) => (-s, id) }.take(20)
    assert(rows.map(r => (r.getLong(0), r.getLong(2))).toSeq == expect)
  }

  test("llm_dedup_span matches a driver-side span recount") {
    val rows = SparkEntry.queries("llm_dedup_span")(spark, sf).collect()
    val spans = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .flatMap { r =>
        val t = r.getString(1).split(" ")
        (0 until t.length / 8).map(i => (r.getLong(0), t.slice(8 * i, 8 * i + 8).mkString(" ")))
      }
    val dupSpans = spans.groupBy(_._2).filter(_._2.map(_._1).distinct.length > 1).keySet
    val perDocShared = spans.filter(p => dupSpans.contains(p._2))
      .groupBy(_._1).view.mapValues(_.length.toLong).toMap
    assert(rows.map(r => r.getLong(0) -> r.getLong(2)).toMap == perDocShared)
    rows.foreach(r => assert(r.getLong(2) <= r.getLong(1) && r.getDouble(3) <= 1.0))
  }

  test("source_schema_evolution: both generations land, old rows null out") {
    val rows = SparkEntry.queries("source_schema_evolution")(spark, sf).collect()
    assert(rows.exists(_.getString(0) == "(pre-upgrade)"), "v1 generation missing")
    assert(rows.map(_.getLong(1)).sum == Tables.orders(spark, sf).count(),
      "row conservation across file generations")
  }

  test("fn_string_extras agrees with plain-Scala string ops per row") {
    val names = Tables.part(spark, sf).select("p_partkey", "p_name", "p_brand", "p_type")
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getString(2), r.getString(3))).toMap
    SparkEntry.queries("fn_string_extras")(spark, sf).collect().foreach { r =>
      val (name, brand, ptype) = names(r.getLong(0))
      assert(r.getString(1) == name.split(" ").head, "split_part")
      assert(r.getString(2) == name.split(" ").head, "substring_index")
      assert(r.getString(3) == brand.substring(0, 1) + "XX" + brand.drop(3), "overlay")
      assert(r.getString(4) == ptype.map {
        case 'A' => 'a'; case 'E' => 'e'; case 'O' => 'o'; case c => c }, "translate")
      assert(r.getString(5) == ptype.take(2) * 3, "repeat(left)")
      assert(r.getString(6) == ptype.takeRight(3), "right")
    }
  }

  test("warehouse_quality_audit: six checks, clean data everywhere except acctbal") {
    val rows = SparkEntry.queries("warehouse_quality_audit")(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows.size == 6)
    val negExpected = Tables.customer(spark, sf).where(col("c_acctbal") < 0).count()
    assert(rows("customer_neg_acctbal") == negExpected)
    // n_chars is DOCUMENTED as not-always-equal to length(text)
    // (FIXTURES.md) — compare the audit to an independent recount instead
    // of baking the currently-clean fixture into the suite
    val driftExpected = Tables.documents(spark, sf)
      .where(col("n_chars") =!= length(col("text"))).count()
    assert(rows("documents_nchars_drift") == driftExpected)
    Seq("customer_dup_keys", "lineitem_null_orderkey", "lineitem_qty_out_of_range",
      "orders_fk_orphans")
      .foreach(k => assert(rows(k) == 0L, s"$k should be clean in the fixtures"))
  }

  test("llm_bpe_pairs: frequencies match a driver-side recount of the top pair") {
    val rows = SparkEntry.queries("llm_bpe_pairs")(spark, sf).collect()
    assert(rows.length <= 20 && rows.nonEmpty)
    val freqs = rows.map(_.getLong(1))
    assert(freqs.zip(freqs.tail).forall { case (a, b) => a >= b }, "not sorted desc")
    val (topPair, topFreq) = (rows.head.getString(0), rows.head.getLong(1))
    val recount = Tables.documents(spark, sf).select("text").collect()
      .flatMap(_.getString(0).split(" "))
      .map(w => w.sliding(2).count(_ == topPair)).sum
    assert(recount.toLong == topFreq, s"driver recount of '$topPair'")
  }

  test("mm_embed_join: norms are ~1 (normalized embeddings) and ids pair 1:1") {
    val rows = SparkEntry.queries("mm_embed_join")(spark, sf).collect()
    val nEmb = Tables.embeddings(spark, sf).count()
    val nDoc = Tables.documents(spark, sf).count()
    assert(rows.length.toLong == math.min(nEmb, nDoc), "join cardinality")
    rows.foreach { r =>
      assert(math.abs(r.getDouble(3) - 1.0) < 0.01, s"doc ${r.getLong(0)} norm")
      assert(r.getInt(2) > 0)
    }
  }

  test("agg_bitmap_distinct is EXACTLY countDistinct (bitmaps are not a sketch)") {
    val got = SparkEntry.queries("agg_bitmap_distinct")(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = Tables.customer(spark, sf).groupBy("c_mktsegment")
      .agg(countDistinct("c_custkey")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == exact)
  }

  test("agg_hll_merge: per-year and merged estimates inside the declared bound") {
    val rows = SparkEntry.queries("agg_hll_merge")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getBoolean(2), s"year ${r.getInt(0)} sketch out of tolerance")
      assert(r.getBoolean(4), "merged sketch out of tolerance")
      assert(r.getLong(1) <= r.getLong(3), "a year cannot exceed the total")
    }
  }

  test("win_event_pattern matches a driver-side scan for the funnel") {
    val got = SparkEntry.queries("win_event_pattern")(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val events = Tables.events(spark, sf)
      .select("user_id", "ts_us", "event_id", "event_type").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val expected = events.groupBy(_._1).view.mapValues { es =>
      val types = es.sortBy(e => (e._2, e._3)).map(_._4)
      types.sliding(3).count(_.sameElements(Seq("view", "click", "purchase"))).toLong
    }.filter(_._2 > 0).toMap
    assert(got == expected)
  }
}
