package graft

import org.scalatest.funsuite.AnyFunSuite

/** Semantic checks for round-11 wave 20: Iceberg v2 position + equality
  * deletes (merge-on-read), Durbin–Watson.
  */
class Round11Wave20Spec extends AnyFunSuite with SparkFixture {

  test("sink_iceberg_delete: position deletes drop rows MOR, time travel intact") {
    val rows = SparkEntry.queries("sink_iceberg_delete")(spark, sf).collect()
    val pre = rows.filter(_.getLong(0) == 1002L).map(_.getLong(2)).sum
    val post = rows.filter(_.getLong(0) == 1003L).map(_.getLong(2)).sum
    assert(post < pre, "the delete snapshot must serve fewer rows")
    import org.apache.spark.sql.functions._
    val expectDeleted = Tables.orders(spark, sf)
      .where(expr("o_orderkey % 9 = 0")).count()
    assert(pre - post == expectDeleted,
      s"exactly the %9=0 rows of file A vanish: ${pre - post} vs $expectDeleted")
  }

  test("sink_iceberg_eq_delete: equality deletes kill keys across files") {
    val rows = SparkEntry.queries("sink_iceberg_eq_delete")(spark, sf).collect()
    val pre = rows.filter(_.getLong(0) == 1002L).map(_.getLong(2)).sum
    val post = rows.filter(_.getLong(0) == 1003L).map(_.getLong(2)).sum
    import org.apache.spark.sql.functions._
    val expectDeleted = Tables.orders(spark, sf)
      .where(expr("o_orderkey % 3 IN (0, 2) AND o_orderkey % 14 = 0")).count()
    assert(pre - post == expectDeleted,
      s"exactly the live %14=0 keys vanish: ${pre - post} vs $expectDeleted")
  }

  test("agg_durbin_watson: ordering is the whole signal on one dataset") {
    val rows = SparkEntry.queries("agg_durbin_watson")(spark, sf).collect()
    val byKey = rows.map(r => (r.getString(0), r.getString(1)) -> r).toMap
    byKey.keys.map(_._1).foreach { t =>
      val smooth = byKey((t, "time_ordered"))
      val shuffled = byKey((t, "shuffled"))
      assert(smooth.getBoolean(5), s"time order must read autocorrelated: $smooth")
      assert(!shuffled.getBoolean(5), s"shuffle must not: $shuffled")
      assert(smooth.getLong(4) < 500, s"drift DW well below 2: $smooth")
      assert(shuffled.getLong(4) > 1500 && shuffled.getLong(4) < 2500,
        s"white DW near 2000 milli: $shuffled")
      assert(smooth.getLong(2) == shuffled.getLong(2), "same n — same dataset")
    }
  }
}
