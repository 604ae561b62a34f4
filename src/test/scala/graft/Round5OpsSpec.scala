package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic checks for the round-5 operators (beyond the smoke/oracle
  * gates): SQL-2016 aggregates, regex/VARIANT functions, and the
  * pipeline-assembly family.
  */
class Round5OpsSpec extends AnyFunSuite with SparkFixture {

  test("agg_listagg emits comma-joined names in sorted order, count-consistent") {
    val rows = SparkEntry.queries("agg_listagg")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val names = r.getString(1).split(",").toSeq
      assert(names == names.sorted, s"unsorted listagg for ${r.getString(0)}")
      assert(names.length == r.getLong(2), "n_cust disagrees with listagg length")
    }
  }

  test("agg_regression exact moments match a driver-side reference; builtins in tolerance") {
    val got = SparkEntry.queries("agg_regression")(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getBoolean(5)))
      .toMap
    val data = Tables.lineitem(spark, sf)
      .select(col("l_returnflag"), col("l_quantity").cast("bigint"),
        round(col("l_extendedprice") * 100).cast("bigint"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    data.groupBy(_._1).foreach { case (flag, rows) =>
      val n = rows.length.toDouble
      val sq = rows.map(_._2).sum.toDouble; val sp = rows.map(_._3).sum.toDouble
      val sq2 = rows.map(r => r._2 * r._2).sum.toDouble
      val sqp = rows.map(r => r._2 * r._3).sum.toDouble
      val slope = (sqp - sq * sp / n) / (sq2 - sq * sq / n)
      val icept = sp / n - slope * sq / n
      val (gs, gi, _, ok) = got(flag)
      assert(math.abs(gs - slope) <= math.abs(slope) * 1e-9, s"$flag slope")
      assert(math.abs(gi - icept) <= math.abs(icept) * 1e-6, s"$flag intercept")
      assert(ok, s"$flag builtin regr_* out of tolerance")
    }
  }

  test("agg_median_mad matches a sorted-array reference median/MAD") {
    def medianOf(xs: Seq[Double]): Double = {
      val s = xs.sorted; val n = s.length
      if (n % 2 == 1) s(n / 2) else (s(n / 2 - 1) + s(n / 2)) / 2.0
    }
    val got = SparkEntry.queries("agg_median_mad")(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    Tables.lineitem(spark, sf).select("l_returnflag", "l_quantity").collect()
      .map(r => (r.getString(0), r.getDouble(1))).groupBy(_._1)
      .foreach { case (flag, rows) =>
        val xs = rows.map(_._2).toSeq
        val med = medianOf(xs)
        val mad = medianOf(xs.map(x => math.abs(x - med)))
        assert(got(flag)._1 == med, s"$flag median")
        assert(got(flag)._2 == mad, s"$flag MAD")
      }
  }

  test("fn_regex second_tok/n_kv agree with a driver-side regex") {
    val rows = SparkEntry.queries("fn_regex")(spark, sf).collect()
    val texts = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val t = texts(r.getLong(0))
      val m = "^([a-z]+) ([a-z]+)".r.findFirstMatchIn(t)
      assert(r.getString(1) == m.map(_.group(2)).getOrElse(""))
      assert(r.getInt(2) == "(key|value)".r.findAllIn(t).length)
    }
  }

  test("warehouse_scd2 intervals chain per user with exactly one open row") {
    val rows = SparkEntry.queries("warehouse_scd2")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3)), r.getBoolean(4)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (user, hist0) =>
      val hist = hist0.sortBy(_._3)
      assert(hist.count(_._5) == 1, s"user $user: open rows != 1")
      assert(hist.last._4.isEmpty && hist.last._5, s"user $user: last row must be open")
      hist.sliding(2).foreach {
        case Array((_, t1, _, Some(to1), _), (_, t2, from2, _, _)) =>
          assert(to1 == from2, s"user $user: interval gap")
          assert(t1 != t2, s"user $user: consecutive rows with same type")
        case _ => ()
      }
    }
  }

  test("sink_merge_upsert post-state: updates bump 1997 totals, inserts land in 1996") {
    import org.apache.spark.sql.functions.year
    val base = Tables.orders(spark, sf)
      .withColumn("o_year", year(col("o_orderdate")))
    val got = SparkEntry.queries("sink_merge_upsert")(spark, sf).collect()
      .map(r => r.getInt(0) -> (r.getLong(1), r.getDouble(2), r.getLong(3))).toMap
    // row accounting: only 1996 gains rows (the cloned inserts)
    val expIns = base.where(col("o_year") === 1996 && col("o_orderkey") % 11 === 0).count()
    assert(got(1996)._3 == expIns && expIns > 0)
    assert(got.filterKeys(_ != 1996).values.forall(_._3 == 0L))
    base.groupBy("o_year").count().collect().foreach { r =>
      val (y, n) = (r.getInt(0), r.getLong(1))
      assert(got(y)._1 == n + (if (y == 1996) expIns else 0L), s"year $y row count")
    }
    // money accounting: 1997 gains exactly 100 per updated key; untouched
    // years' totals equal the source aggregate bit-for-bit
    val updN = base.where(col("o_year") === 1997 && col("o_orderkey") % 7 === 0).count()
    val srcTotals = base.groupBy("o_year")
      .agg(sum(col("o_totalprice").cast("decimal(18,4)")).cast("double").as("t"))
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    assert(math.abs(got(1997)._2 - (srcTotals(1997) + 100.0 * updN)) < 1e-4)
    srcTotals.keys.filter(y => y != 1996 && y != 1997).foreach { y =>
      assert(got(y)._2 == srcTotals(y), s"untouched year $y total drifted")
    }
  }

  test("stream_foreach_batch lands both micro-batches exactly once") {
    val got = SparkEntry.queries("stream_foreach_batch")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == Seq(("click", 1L, 200L, 1L), ("purchase", 1L, 400L, 1L),
      ("view", 2L, 400L, 2L)))
  }

  test("llm_dedup_cluster agrees with a driver-side union-find over the pair graph") {
    val pairs = SparkEntry.queries("llm_dedup_near")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val expected = pairs.flatMap(p => Seq(p._1, p._2)).distinct
      .map(id => id -> find(id)).toMap
    val got = SparkEntry.queries("llm_dedup_cluster")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.map(_._1).toSet == expected.keySet, "node set mismatch")
    got.foreach { case (id, cl, sz) =>
      assert(cl == expected(id), s"doc $id: cluster $cl != ${expected(id)}")
      assert(sz == expected.values.count(_ == cl), s"cluster $cl size")
    }
  }

  test("llm_repetition matches a driver-side n-gram recount") {
    val texts = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val got = SparkEntry.queries("llm_repetition")(spark, sf).collect()
    assert(got.length == texts.size)
    got.take(25).foreach { r =>
      val t = texts(r.getLong(0)).split(" ")
      val bi = t.sliding(2).map(_.mkString(" ")).toSeq
      val exp = BigDecimal((bi.length - bi.distinct.length).toDouble / bi.length)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(r.getInt(1) == t.length)
      assert(r.getDouble(2) == exp, s"doc ${r.getLong(0)} dup_bigram_frac")
    }
  }

  test("llm_chunk windows tile each doc at stride 48 and cover the tail") {
    val rows = SparkEntry.queries("llm_chunk")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4)))
    rows.groupBy(_._1).foreach { case (doc, cs0) =>
      val cs = cs0.sortBy(_._3)
      val n = cs.head._2
      assert(cs.map(_._4).toSeq == cs.indices.map(_ * 48), s"doc $doc strides")
      assert(cs.last._4 + cs.last._5 == n, s"doc $doc tail not covered")
      assert(cs.init.forall(_._5 == 64), s"doc $doc non-final chunk len")
      assert(cs.last._5 >= 1 && cs.last._5 <= 64)
    }
  }

  test("llm_contamination ratios are consistent and bounded") {
    val rows = SparkEntry.queries("llm_contamination")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, c, f) = (r.getLong(1), r.getLong(2), r.getDouble(3))
      assert(c >= 0 && c <= n)
      val exp = BigDecimal(c.toDouble / n)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(f == exp)
    }
  }

  test("llm_top_terms emits 3 ranked terms per doc with non-increasing scores") {
    val rows = SparkEntry.queries("llm_top_terms")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getDouble(3)))
    rows.groupBy(_._1).foreach { case (doc, ts0) =>
      val ts = ts0.sortBy(_._2)
      assert(ts.map(_._2).toSeq == (1 to ts.length), s"doc $doc ranks")
      assert(ts.length <= 3)
      ts.sliding(2).foreach {
        case Array(hi, lo) =>
          assert(hi._4 > lo._4 || (hi._4 == lo._4 && hi._3 < lo._3), s"doc $doc order")
        case _ => ()
      }
    }
  }

  test("source_jdbc_roundtrip reads 25 nations through 4 JDBC range partitions") {
    val df = SparkEntry.queries("source_jdbc_roundtrip")(spark, sf)
    assert(df.count() == 25)
    // the scan itself is range-partitioned even though the tiny result is
    // AQE-coalesced downstream — assert on the relation, not the final RDD
    val plan = SparkEntry.queries("source_jdbc_roundtrip")(spark, sf)
      .queryExecution.analyzed.toString
    assert(plan.contains("numPartitions=4"), s"JDBC scan not range-partitioned: $plan")
  }

  test("source_text_roundtrip totals equal the source corpus") {
    val got = SparkEntry.queries("source_text_roundtrip")(spark, sf).collect()
    val exp = Tables.documents(spark, sf).groupBy("lang")
      .agg(count(lit(1)), sum(length(col("text"))))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    got.foreach { r =>
      assert((r.getLong(1), r.getLong(2)) == exp(r.getString(0)))
    }
  }

  test("tpch showcase queries return ranked non-empty results") {
    val q3 = SparkEntry.queries("tpch_q3")(spark, sf).collect()
    assert(q3.nonEmpty && q3.length <= 10)
    assert(q3.map(_.getDouble(3)).sliding(2).forall(w => w.length < 2 || w(0) >= w(1)))
    val q5 = SparkEntry.queries("tpch_q5")(spark, sf).collect()
    assert(q5.nonEmpty)
    val q10 = SparkEntry.queries("tpch_q10")(spark, sf).collect()
    assert(q10.nonEmpty && q10.length <= 20)
    assert(q10.map(_.getDouble(2)).sliding(2).forall(w => w.length < 2 || w(0) >= w(1)))
  }

  test("agg_argminmax picks orders that actually carry the group extremes") {
    val prices = Tables.orders(spark, sf).select("o_orderkey", "o_totalprice")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    SparkEntry.queries("agg_argminmax")(spark, sf).collect().foreach { r =>
      assert(prices(r.getLong(1)) == r.getDouble(3), "max_by order price != max")
      assert(prices(r.getLong(2)) == r.getDouble(4), "min_by order price != min")
    }
  }

  test("fn_binary round-trips and hex-encodes like the JVM") {
    val rows = SparkEntry.queries("fn_binary")(spark, sf).collect()
    rows.foreach { r =>
      assert(r.getString(1) == java.lang.Long.toHexString(r.getLong(0)).toUpperCase)
      assert(r.getBoolean(3), s"base64 round-trip failed for key ${r.getLong(0)}")
    }
  }

  test("llm_bigram_lm probabilities are consistent conditionals") {
    val rows = SparkEntry.queries("llm_bigram_lm")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (c12, c1, p) = (r.getLong(3), r.getLong(4), r.getDouble(5))
      assert(c12 <= c1 && p > 0.0 && p <= 1.0)
      val exp = BigDecimal(c12.toDouble / c1)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(p == exp)
    }
    assert(rows.map(_.getString(0)).distinct.length <= 10)
  }

  test("llm_vocab_coverage is a nondecreasing curve ending at most at 1") {
    val cov = SparkEntry.queries("llm_vocab_coverage")(spark, sf).collect()
      .map(_.getDouble(3))
    assert(cov.nonEmpty)
    assert(cov.sliding(2).forall(w => w.length < 2 || w(0) <= w(1)))
    assert(cov.last <= 1.0 + 1e-9)
  }

  test("tpch plans broadcast the dimension sides and never plan a cartesian") {
    Seq("tpch_q3", "tpch_q5", "tpch_q10").foreach { q =>
      val p = SparkEntry.queries(q)(spark, sf).queryExecution.executedPlan.toString
      assert(p.contains("BroadcastHashJoin"), s"$q: no broadcast join\n${p.take(1500)}")
      assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
        s"$q plans a product join")
    }
  }

  test("join_null_safe_eq matches the NULL block as one group") {
    val rows = SparkEntry.queries("join_null_safe_eq")(spark, sf).collect()
      .map(r => r.getAs[Number](0).longValue ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val nullCust = Tables.customer(spark, sf).where(col("c_custkey") % 10 === 0).count()
    val nullSupp = Tables.supplier(spark, sf).where(col("s_suppkey") % 10 === 0).count()
    assert(rows.contains(-1L), "NULL<=>NULL block missing")
    assert(rows(-1L) == ((nullCust * nullSupp, nullCust, nullSupp)),
      "NULL block must be the full cross of null-keyed rows")
  }

  test("stream_complete_agg holds the final running totals") {
    val got = SparkEntry.queries("stream_complete_agg")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == Seq(("click", 1L, 200L), ("purchase", 1L, 400L), ("view", 3L, 450L)))
  }

  test("agg_histogram partitions all orders into in-bound buckets") {
    val rows = SparkEntry.queries("agg_histogram")(spark, sf).collect()
    assert(rows.map(_.getLong(1)).sum == Tables.orders(spark, sf).count())
    rows.foreach { r =>
      val (b, lo, hi) = (r.getLong(0), r.getDouble(2), r.getDouble(3))
      assert(lo <= hi)
      assert(math.round(lo * 100) / 6000000 == b && math.round(hi * 100) / 6000000 == b)
    }
  }

  test("fn_variant extracts typed paths and NULL for missing") {
    val rows = SparkEntry.queries("fn_variant")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getInt(1).toString == r.getString(2), "k_int vs k_str")
      assert(r.isNullAt(3), "missing path must be NULL")
      assert(r.getInt(4) == 7, "nested array path")
    }
  }
}
