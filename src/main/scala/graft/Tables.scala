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

  /** Scan-parallelism floor (r13 optimization, guide §2.5 "input skew" /
    * §6 input splits): a parquet file smaller than
    * `spark.sql.files.maxPartitionBytes` scans as ONE partition — and
    * because a single small file is also a single row group, raising
    * `minPartitionNum` would only mint empty splits. So below the floor the
    * fact tables re-spread ONCE per session over the default parallelism,
    * hash-partitioned on their PRIMARY KEY (deterministic row→partition
    * assignment — no round-robin, so retries and engine-compare hashes are
    * unaffected; every downstream per-row pass — MinHash, BPE explode,
    * image decode, ts parse — runs at session width instead of one core).
    * Data-derived: at any real scale the scan has more splits than cores
    * and the floor never fires. Dimension tables (region/nation/supplier/
    * part) are broadcast-side and stay as scanned. events, embeddings and
    * customer were floored and MEASURED OUT (r13): their per-row pre-shuffle
    * work is trivial (ts parse / 64-dim vectors at 2k rows / key projection),
    * so the extra exchange plus 32-way task floors on row-counts this small
    * cost more than the parallelism bought (s5 +0.76 s, s7 +0.73 s, r2/r3
    * +0.5 s at sf0.1 local[32]); documents/lineitem/orders carry the heavy
    * per-row passes (text shingling/tokenization, md5 hashing, decimal
    * aggregation) and kept clear wins (u6/u7 −0.7 s, v2 −0.63 s, c2 −0.59 s,
    * t16 −0.6 s, q1/q2/a4/a8 −0.25..−0.39 s).
    */
  private val scanFloorKeys = Map(
    "documents" -> Seq("doc_id"),
    "lineitem" -> Seq("l_orderkey", "l_linenumber"),
    "orders" -> Seq("o_orderkey"))

  def table(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val perSession = frames.synchronized {
      var m = frames.get(spark)
      if (m == null) { m = new java.util.concurrent.ConcurrentHashMap[String, DataFrame](); frames.put(spark, m) }
      m
    }
    perSession.computeIfAbsent(s"$sfDir/$name", { _ =>
      import org.apache.spark.sql.functions.col
      val raw = spark.read.parquet(s"$sfDir/$name.parquet")
      scanFloorKeys.get(name) match {
        case Some(pk) =>
          // full session width: a half-width variant was measured (16 at
          // local[32]) and lost more on the heavy consumers (c2 +0.17 s,
          // t20 +0.36 s, q1/q2 +0.11 s) than it saved on the trivial ones
          val target = spark.sparkContext.defaultParallelism
          if (sys.props.get("graft.scanfloor").contains("off")) raw
          else if (raw.rdd.getNumPartitions * 2 <= target)
            raw.repartition(target, pk.map(col): _*)
          else raw
        case None => raw
      }
    })
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
