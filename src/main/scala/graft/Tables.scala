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
  /** Per-session memo of resolved table frames. A fresh `spark.read.parquet`
    * re-lists the directory and re-reads footers for schema on every call —
    * ~0.1–0.25 s per query at bench SF, and at cluster scale an object-store
    * LIST per query. The testdata is immutable within a session, so the
    * resolved DataFrame (immutable logical plan) is shared. Weak session
    * keys: stopped test sessions don't pin their plans.
    */
  private val frames =
    new java.util.WeakHashMap[SparkSession, java.util.concurrent.ConcurrentHashMap[String, DataFrame]]()

  def table(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val perSession = frames.synchronized {
      var m = frames.get(spark)
      if (m == null) { m = new java.util.concurrent.ConcurrentHashMap[String, DataFrame](); frames.put(spark, m) }
      m
    }
    perSession.computeIfAbsent(s"$sfDir/$name",
      _ => spark.read.parquet(s"$sfDir/$name.parquet"))
  }

  def region(s: SparkSession, d: String): DataFrame    = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = table(s, d, "lineitem")
  /** events.ts has shipped as TIMESTAMP(NANOS) (earlier harness corpora)
    * and as plain timestamp[us] (current corpora); normalize either to a
    * session-TZ micros TimestampType so downstream queries and the DuckDB
    * oracles (native micros TIMESTAMP) agree exactly regardless of which
    * generation of testdata is on disk.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    // Sessions built by Verify/Bench/tools/TestSpark pre-set nanosAsLong at
    // construction; only fall back to a one-time set for ad-hoc sessions, so
    // a pre-configured session is never conf-mutated mid-query (a mixed
    // workload session could otherwise race the setting).
    if (!s.conf.getOption("spark.sql.legacy.parquet.nanosAsLong").contains("true"))
      s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    normalizeEventsTs(table(s, d, "events"))
  }

  /** Normalize whichever on-disk encoding of `ts` we were handed to a
    * session-TZ micros TimestampType (exposed for the schema-drift spec). */
  def normalizeEventsTs(raw: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types._
    raw.schema("ts").dataType match {
      case LongType =>
        // nanos-as-long: integer `div`, NOT floor(x/1000) — ns epochs
        // (~1.7e18) exceed double's 53-bit mantissa, so float division
        // is off by up to ~256 ns
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _: TimestampNTZType =>
        // session TZ is pinned to UTC everywhere, so NTZ→LTZ keeps the
        // same micros value DuckDB sees
        raw.withColumn("ts", col("ts").cast(TimestampType))
      case _ => raw
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}
