package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.TestSpark

/** The harness regenerates its testdata between rounds and events.ts has
  * already shipped in two encodings (TIMESTAMP(NANOS) → nanos-as-long, and
  * plain timestamp[us] → TIMESTAMP_NTZ). Round 5 lost 17 queries to that
  * drift; this spec pins the normalization so the next drift fails here,
  * not silently in the driver gate.
  */
class TablesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  // one instant, expressed in each on-disk shape: 2024-03-01T12:34:56.789123456Z
  private val nanos = 1709296496789123456L
  private val micros = nanos / 1000L // 1709296496789123

  test("normalizeEventsTs maps every shipped ts encoding to the same micros") {
    import spark.implicits._
    val s = spark
    import org.apache.spark.sql.types._

    val fromNanosLong = Tables.normalizeEventsTs(
      Seq(nanos).toDF("ts"))
    val fromNtz = Tables.normalizeEventsTs(
      Seq(micros).toDF("us").select(timestamp_micros($"us").cast(TimestampNTZType).as("ts")))
    val fromLtz = Tables.normalizeEventsTs(
      Seq(micros).toDF("us").select(timestamp_micros($"us").as("ts")))

    for (df <- Seq(fromNanosLong, fromNtz, fromLtz)) {
      assert(df.schema("ts").dataType == TimestampType)
      val got = df.select(unix_micros($"ts")).as[Long].head()
      assert(got == micros, s"expected $micros got $got")
    }
  }

  test("events on a pre-configured session never mutates conf; table frames memoize") {
    // TestSpark pre-sets nanosAsLong at construction (like Verify/Bench);
    // events() must not call conf.set on such a session (a mixed-workload
    // session could otherwise race a mid-query conf mutation).
    val before = spark.conf.get("spark.sql.legacy.parquet.nanosAsLong")
    assert(before == "true", "TestSpark must pre-set nanosAsLong at construction")
    val sf = "/root/testdata/sf0.001"
    assume(new java.io.File(s"$sf/events.parquet").exists())
    val e1 = Tables.events(spark, sf)
    assert(spark.conf.get("spark.sql.legacy.parquet.nanosAsLong") == "true")
    // the resolved frame is memoized per (session, path): a second read
    // returns the same plan instead of re-listing + re-reading footers
    assert(Tables.table(spark, sf, "events") eq Tables.table(spark, sf, "events"))
    assert(e1.schema.fieldNames.contains("ts"))
  }

  test("Tables.events round-trips an NTZ-encoded parquet (current corpora)") {
    import spark.implicits._
    import org.apache.spark.sql.types._
    val dir = Files.createTempDirectory("graft-events-ntz").toFile
    try {
      Seq((1L, micros, 7L, "click", 1.5, "{}"))
        .toDF("event_id", "us", "user_id", "event_type", "value", "props")
        .select($"event_id", timestamp_micros($"us").cast(TimestampNTZType).as("ts"),
          $"user_id", $"event_type", $"value", $"props")
        .write.mode("overwrite").parquet(s"${dir.getAbsolutePath}/events.parquet")
      val ev = Tables.events(spark, dir.getAbsolutePath)
      assert(ev.schema("ts").dataType == TimestampType)
      assert(ev.select(unix_micros($"ts")).as[Long].head() == micros)
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(dir)
    }
  }

  test("scan floor never fires once a table scans wider than half the cores") {
    // r13 verdict #6: the floor's scale guard (scanPartitions * 2 <= cores)
    // deserves a recorded check, not just a claim. Write a floored table
    // (documents) as MANY small files so its scan has >= cores/2 splits and
    // assert the memoized frame is the BARE scan — no injected exchange.
    import spark.implicits._
    val cores = spark.sparkContext.defaultParallelism
    val dir = Files.createTempDirectory("graft-floor-guard").toFile
    try {
      (0 until 64).map(i => (i.toLong, s"text $i"))
        .toDF("doc_id", "text")
        .repartition(cores) // >= cores files => scan splits >= cores
        .write.mode("overwrite").parquet(s"${dir.getAbsolutePath}/documents.parquet")
      val docs = Tables.documentsSpread(spark, dir.getAbsolutePath)
      val plan = docs.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"scan floor must stay idle on a multi-split table, plan was:\n$plan")
      // and the bench-corpus shape (single split) DOES fire on this session
      // — on the SPREAD variant; the plain accessor is the bare scan by
      // design (r14 per-call-site floor)
      val sf = "/root/testdata/sf0.001"
      assume(new java.io.File(s"$sf/documents.parquet").exists())
      if (cores >= 2) {
        assert(!Tables.documents(spark, sf).queryExecution.executedPlan
          .toString.contains("Exchange"),
          "plain documents() must stay a bare scan")
        val benchDocs = Tables.documentsSpread(spark, sf)
        assert(benchDocs.queryExecution.executedPlan.toString.contains("Exchange"),
          "single-split bench table should re-spread under the spread variant")
      }
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(dir)
    }
  }
}
