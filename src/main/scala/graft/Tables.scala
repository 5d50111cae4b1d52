package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the harness testdata tables (TESTDATA.md).
  *
  * Every query in [[SparkEntry.queries]] reads through here so that the
  * parquet scan options (and any future bucketing/caching policy) live in
  * one place. At 100 TB these would be catalog tables with partition
  * columns; `spark.read.parquet` keeps the same plan shape (columnar scan
  * with predicate pushdown + column pruning handled by Catalyst).
  */
object Tables {
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = table(s, d, "lineitem")
  /** events.parquet stores ts as TIMESTAMP(NANOS) which Spark's parquet
    * reader rejects. Read nanos as long (legacy conf) and truncate to a
    * micros TimestampType — DuckDB's native TIMESTAMP is micros and
    * truncates the same way, so oracles agree exactly.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    import org.apache.spark.sql.functions._
    // integer `div`, NOT floor(x/1000): ns epoch values (~1.7e18) exceed
    // double's 53-bit mantissa, so float division is off by up to ~256 ns
    table(s, d, "events")
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}
