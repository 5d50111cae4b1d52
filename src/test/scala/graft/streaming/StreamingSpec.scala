package graft.streaming

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.core.TestSpark
import graft.Tables

/** Streaming parity: the same transform over the events table executed as a
  * file stream (memory sink) must equal its batch execution; custom
  * sessionization must equal `session_window` for closed sessions.
  */
class StreamingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sfDir = "/root/testdata/sf0.001"

  private lazy val eventsDir: String = {
    val dir = Files.createTempDirectory("events_stream").toString
    Tables.events(spark, sfDir).coalesce(2).write.mode("overwrite").parquet(dir)
    dir
  }

  test("tumbling window: stream result equals batch result") {
    val streamed = StreamOps.runFileStream(spark, eventsDir,
      df => StreamOps.tumblingCounts(df), "tumbling_parity")
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet
    val batch = StreamOps.tumblingCounts(spark.read.parquet(eventsDir))
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet
    assert(streamed.nonEmpty && streamed == batch)
  }

  test("sliding window: stream equals batch and doubles event coverage") {
    val streamed = StreamOps.runFileStream(spark, eventsDir,
      df => StreamOps.slidingSums(df), "sliding_parity")
      .collect().map(r => (r.getTimestamp(0), r.getLong(1))).toSet
    val batch = StreamOps.slidingSums(spark.read.parquet(eventsDir))
      .collect().map(r => (r.getTimestamp(0), r.getLong(1))).toSet
    assert(streamed == batch)
    val totalEvents = spark.read.parquet(eventsDir).count()
    val covered = streamed.toSeq.map(_._2).sum
    assert(covered == 2 * totalEvents) // every event in exactly 2 windows
  }

  test("dropDuplicatesWithinWatermark: stream dedup keeps exactly one row per key") {
    import org.apache.spark.sql.streaming.OutputMode
    // duplicate every event 3x (new micro-batch-friendly file layout), then
    // stream-dedup on event_id — the training-pipeline ingestion front door
    val dupDir = Files.createTempDirectory("events_dup").toString
    val base = spark.read.parquet(eventsDir).limit(500)
    base.union(base).union(base).coalesce(2).write.mode("overwrite").parquet(dupDir)
    val streamed = StreamOps.runFileStream(spark, dupDir,
      df => StreamOps.dedupWithinWatermark(df, Seq("event_id")),
      "dedup_parity", OutputMode.Append())
    assert(streamed.count() == base.count())
    assert(streamed.select("event_id").distinct().count() == base.count())
    // every surviving row is one of the (identical) originals
    val ids = streamed.select("event_id").collect().map(_.getLong(0)).toSet
    val expected = base.select("event_id").collect().map(_.getLong(0)).toSet
    assert(ids == expected)
  }

  test("stream-stream interval join (click->purchase) equals the batch join") {
    import org.apache.spark.sql.streaming.OutputMode
    val streamed = StreamOps.runFileStream(spark, eventsDir,
      df => StreamOps.clickToPurchase(df), "ssjoin_parity", OutputMode.Append())
      .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2))).toSet
    val batch = StreamOps.clickToPurchase(spark.read.parquet(eventsDir))
      .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2))).toSet
    assert(batch.nonEmpty && streamed == batch)
  }

  test("flatMapGroupsWithState sessionization matches session_window on closed sessions") {
    import spark.implicits._
    val ev = spark.read.parquet(eventsDir)
      .select(col("user_id"), col("ts"), col("value")).as[StreamOps.Event]
    // batch truth via session_window
    val truth = spark.read.parquet(eventsDir)
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .agg(count(lit(1)).as("n"))
      .select(col("user_id"), col("session_window.start"), col("n"))
      .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2))).toSet
    // custom stateful path (batch Dataset execution of the same logic only
    // emits CLOSED sessions; the final open session per user stays in state)
    val emitted = StreamOps.sessionize(ev)
      .collect().map(s => (s.user_id, s.session_start, s.n_events)).toSet
    assert(emitted.nonEmpty)
    assert(emitted.subsetOf(truth),
      s"emitted sessions not found in truth: ${emitted.diff(truth).take(3)}")
    // every user's non-final sessions are emitted: count check
    val perUserTruth = truth.groupBy(_._1).view.mapValues(_.size).toMap
    val perUserEmitted = emitted.groupBy(_._1).view.mapValues(_.size).toMap
    perUserTruth.foreach { case (u, n) =>
      assert(perUserEmitted.getOrElse(u, 0) == n - 1, s"user $u: ${n - 1} expected")
    }
  }

  test("transformWithState running totals: stream equals batch, state survives micro-batches") {
    import org.apache.spark.sql.streaming.OutputMode
    val batch = StreamOps.runningTotals(spark.read.parquet(eventsDir))
      .collect().map(r => (r.user_id, r.event_id) -> (r.n_so_far, r.value_sum)).toMap
    val streamed = StreamOps.runFileStream(spark, eventsDir,
      df => StreamOps.runningTotals(df).toDF(), "tws_parity", OutputMode.Append())
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getDouble(3))).toMap
    assert(batch.nonEmpty && streamed.size == batch.size)
    // one emission per event; the final (count, sum) per key must agree even
    // if MICRO-BATCH boundaries split a user's events differently from the
    // batch iterator (running prefixes beyond the final one can legitimately
    // differ when arrival order differs — totals cannot)
    val finalB = batch.groupBy(_._1._1).view.mapValues(_.values.maxBy(_._1)).toMap
    val finalS = streamed.groupBy(_._1._1).view.mapValues(_.values.maxBy(_._1)).toMap
    assert(finalB == finalS)
    // single-file-batch layouts replay identically row-by-row
    assert(streamed == batch)
  }

  test("r2 EWMA matches the classic recurrence re-derived driver-side") {
    // the query computes adjust=true EWMA (alpha = 1/2) truncated at 20
    // terms via integer-scaled decimal lags; this re-derives it from the
    // textbook weighted-sum definition over the raw per-user series
    val rows = graft.operators.StreamingOps.queries("r2_ewma")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(3)).toMap
    val series = Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_id"), col("ts"), col("value"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getTimestamp(2), r.getDouble(3)))
      .groupBy(_._1)
    assert(rows.nonEmpty && series.nonEmpty)
    for ((uid, evs) <- series.take(20)) {
      val ordered = evs.sortBy(e => (e._3.getTime, e._2)).map(e => (e._2, e._4))
      ordered.zipWithIndex.foreach { case ((eid, _), i) =>
        val terms = (0 until math.min(20, i + 1)).map { j =>
          math.round(ordered(i - j)._2 * 100) / 100.0 * math.pow(0.5, j + 1)
        }
        val wsum = (0 until math.min(20, i + 1)).map(j => math.pow(0.5, j + 1)).sum
        val expected = terms.sum / wsum
        assert(math.abs(rows((uid, eid)) - expected) < 1e-5,
          s"user $uid event $eid: got ${rows((uid, eid))}, expected $expected")
      }
    }
  }
}
