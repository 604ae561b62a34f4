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
    * `salt` ways on the big side. Row-identical to the unsalted join.
    *
    * `saltOn` picks the big-side columns the per-row salt is hashed from;
    * pass a MINIMAL set that distinguishes rows of one hot key (a row id /
    * natural key — e.g. `(l_orderkey, l_linenumber)` for lineitem). Hashing
    * is per-row CPU on the whole big side, so a whole-row hash pays width ×
    * rows for no extra spreading (round 3 measured ~2× on a 16-column
    * fact). Empty `saltOn` (the default) falls back to every non-map
    * column — correct for any input, priced for none. */
  def saltedJoin(big: DataFrame, small: DataFrame,
      bigKey: Column, smallKey: Column, salt: Int,
      saltOn: Seq[Column] = Nil): DataFrame = {
    // deterministic per-row salt: xxhash64 over data columns, so the salt
    // assignment is a pure function of the DATA — identical across
    // partition layouts, re-executions and AQE re-plans (pmod of
    // monotonically_increasing_id is multiset-equivalent but silently
    // depends on partition assignment). Rows of one hot key normally
    // differ in the hashed columns, so the hash spreads the key `salt`
    // ways. KNOWN LIMIT: rows identical across the hashed columns hash to
    // ONE salt — if your skew is millions of exact-duplicate rows,
    // dedup-count first or add an explicit nonce column; results stay
    // correct either way, only the spreading is lost.
    // contract narrowed vs a row-id salt: the fallback references columns
    // by name and xxhash64 rejects map types, so fail fast with a clear
    // message instead of an opaque planner error
    require(big.columns.toSeq.distinct.length == big.columns.length,
      "saltedJoin: big side must have distinct column names (hash salt references columns by name)")
    val hashable =
      if (saltOn.nonEmpty) saltOn
      else big.schema.fields
        .filterNot(f => f.dataType.isInstanceOf[org.apache.spark.sql.types.MapType])
        .map(f => col(f.name)).toSeq
    require(hashable.nonEmpty,
      "saltedJoin: big side needs at least one non-map column to derive the row salt")
    val b = big.withColumn(SaltCol, pmod(xxhash64(hashable: _*), lit(salt.toLong)))
    val s = small
      .withColumn(SaltCol, explode(sequence(lit(0), lit(salt - 1))))
      .withColumn(SaltCol, col(SaltCol).cast("long"))
    b.join(s, bigKey === smallKey && b(SaltCol) === s(SaltCol), "inner")
      .drop(SaltCol)
  }
}
