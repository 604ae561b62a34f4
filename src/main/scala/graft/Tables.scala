package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Loaders for the ten test tables (TESTDATA.md / FIXTURES.md).
  *
  * Plain parquet scans — schema comes from the footer; Catalyst provides
  * column pruning and predicate pushdown into the scan automatically
  * (SURVEY.md §4), so every operator that selects/filters downstream gets a
  * minimal read for free. At 100 TB these same loaders would point at a
  * partitioned warehouse dir and partition pruning would kick in unchanged.
  */
object Tables {
  private def read(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = read(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = read(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = read(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = read(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = read(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = read(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = read(s, d, "lineitem")
  def documents(s: SparkSession, d: String): DataFrame = read(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = read(s, d, "embeddings")

  /** events.parquet's `ts` column has shipped in three physical flavors
    * across testdata generations: TIMESTAMP(NANOS) (read as raw Long ns via
    * `nanosAsLong` — Spark 4.1.2 otherwise refuses it, SURVEY.md §7.3 rule
    * 3), TIMESTAMP(MICROS) isAdjustedToUTC=false (read as TIMESTAMP_NTZ),
    * and TIMESTAMP(MICROS) isAdjustedToUTC=true (TIMESTAMP LTZ). Normalize
    * all three to the same two columns so every operator downstream is
    * generation-independent:
    *   - `ts_us`: Long epoch microseconds (ns truncated exactly like
    *     DuckDB's parquet reader truncates TIMESTAMP_NS; NTZ interpreted as
    *     UTC wall-clock, matching DuckDB's naive `epoch_us(ts)`) — used for
    *     all ordering/interval comparisons;
    *   - `ts`: µs-precision TimestampType — used for calendar bucketing and
    *     string formatting (second precision in all emitted output).
    * All session entry points pin spark.sql.session.timeZone=UTC, so the
    * NTZ→LTZ cast below is exact and tz-independent.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = read(s, d, "events")
    val tsUs = raw.schema("ts").dataType match {
      case LongType         => expr("ts DIV 1000")
      case TimestampNTZType => unix_micros(col("ts").cast(TimestampType))
      case _                => unix_micros(col("ts"))
    }
    raw
      .withColumn("ts_us", tsUs)
      .withColumn("ts", timestamp_micros(col("ts_us")))
  }
}
