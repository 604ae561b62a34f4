package graft

import org.scalatest.funsuite.AnyFunSuite

/** Semantic checks for the round-10 wave-36 ops beyond the oracle gate. */
class Round10Wave36Spec extends AnyFunSuite with SparkFixture {

  test("fn_geohash: coordinates in range; hash alphabet legal; prefix = containment") {
    val rows = SparkEntry.queries("fn_geohash")(spark, sf).collect()
    assert(rows.nonEmpty)
    val alphabet = "0123456789bcdefghjkmnpqrstuvwxyz".toSet
    rows.foreach { r =>
      val (lat, lon, z) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(lat >= -90000000L && lat <= 90000000L, s"lat range: $r")
      assert(lon >= -180000000L && lon <= 180000000L, s"lon range: $r")
      assert(z >= 0 && z < (1L << 20), s"20-bit interleave: $r")
      val gh = r.getString(4)
      assert(gh.length == 4 && gh.forall(alphabet), s"legal base32: $gh")
    }
    // prefix containment: rows sharing a 2-char prefix share the top 10 z-bits
    rows.groupBy(_.getString(4).take(2)).foreach { case (_, grp) =>
      assert(grp.map(_.getLong(3) >> 10).distinct.length == 1,
        "2-char prefix names exactly one 10-bit parent cell")
    }
  }

  test("agg_weighted_median: pick sits between min and max; weights conserved") {
    val rows = SparkEntry.queries("agg_weighted_median")(spark, sf).collect()
    assert(rows.length >= 2)
    rows.foreach { r =>
      val (n, totW, wMed, wMean) = (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(5))
      assert(totW >= n && totW <= 7 * n, s"weights in [1,7] conserve: $r")
      // weighted median and weighted mean of near-uniform data sit close
      assert(math.abs(wMed - wMean) < 6000, s"centered data: $r")
    }
  }

  test("warehouse_erasure_audit: every surfaced row is a genuine planted leak") {
    val rows = SparkEntry.queries("warehouse_erasure_audit")(spark, sf).collect()
    assert(rows.nonEmpty, "the planted survivors must be caught")
    rows.foreach { r =>
      assert(r.getLong(0) % 11 == 4, s"only erased users can violate: $r")
      assert(r.getLong(1) >= 1, "at least one leaked row per surfaced user")
      assert(r.getLong(2) % 13 == 7, s"first leak is a planted survivor: $r")
      assert(r.getBoolean(3))
    }
  }
}
