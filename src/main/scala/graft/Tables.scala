package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

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

  /** events.parquet carries TIMESTAMP(NANOS), which Spark 4.1.2 refuses to
    * read (PARQUET_TYPE_ILLEGAL — verified, SURVEY.md §7.3 rule 3). Read it
    * as raw Long nanoseconds via `nanosAsLong` and expose both:
    *   - `ts_us`: Long microseconds (truncated from ns exactly like DuckDB's
    *     parquet reader truncates TIMESTAMP_NS to its µs timestamps) — used
    *     for all ordering/interval comparisons;
    *   - `ts`: µs-precision TimestampType — used for calendar bucketing and
    *     string formatting (second precision in all emitted output).
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    read(s, d, "events")
      .withColumn("ts_us", expr("CAST(ts AS LONG) DIV 1000"))
      .withColumn("ts", timestamp_micros(col("ts_us")))
  }
}
