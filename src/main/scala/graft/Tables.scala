package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr, timestamp_micros}

/** Parquet table loaders for the driver-generated star schema + extension
  * tables (see /root/repo/TESTDATA.md). Reads are plain `spark.read.parquet`
  * so Catalyst predicate pushdown / column pruning apply to every query
  * built on top — at 100 TB these scans are partition-pruned and
  * column-pruned by the optimizer, nothing to hand-tune here.
  */
object Tables {
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = table(s, d, "lineitem")
  /** events.ts is parquet TIMESTAMP(NANOS), which Spark's vectorized reader
    * rejects outright. Read it as raw nanos (legacy long mode) and convert
    * with *integer* division — `DIV 1000` keeps full precision where a
    * double round-trip would corrupt epoch-nanos (~1.7e18 > 2^53). DuckDB
    * truncates ns→µs the same way, so oracle comparisons line up. */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    table(s, d, "events")
      .withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
  }
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}
