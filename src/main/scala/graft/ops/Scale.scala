package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scale-path join utilities (SURVEY.md §7.7).
  *
  * `saltedJoin` is the classic remedy for shuffle-join key skew: a hot key
  * that would land every row in one reducer task is spread across `salt`
  * shuffle partitions by joining on (key, salt) instead of (key) — the big
  * side tags each row with a deterministic salt in [0, salt), the small
  * side is replicated `salt` ways. The result multiset is identical to the
  * plain equi-join; only the partitioning changes. At 100 TB this is the
  * manual fallback when AQE's runtime skew split
  * (`spark.sql.adaptive.skewJoin.enabled`, on by default here) can't help —
  * e.g. when the skewed side feeds a co-partitioned downstream agg.
  */
object Scale {
  private val SaltCol = "__graft_salt"

  /** Inner equi-join of `big ⋈ small` on `bigKey === smallKey`, salted
    * `salt` ways on the big side. Row-identical to the unsalted join. */
  def saltedJoin(big: DataFrame, small: DataFrame,
      bigKey: Column, smallKey: Column, salt: Int): DataFrame = {
    // deterministic per-row salt: cheap hash of the join key + a row nonce
    // would ALSO work, but key-only salting keeps co-located rows of one
    // key spread too (pmod of the row id is uniform and execution-stable
    // for a deterministic source)
    val b = big.withColumn(SaltCol, pmod(monotonically_increasing_id(), lit(salt)))
    val s = small
      .withColumn(SaltCol, explode(sequence(lit(0), lit(salt - 1))))
      .withColumn(SaltCol, col(SaltCol).cast("long"))
    b.join(s, bigKey === smallKey && b(SaltCol) === s(SaltCol), "inner")
      .drop(SaltCol)
  }
}
