package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.core.TestSpark
import graft.Tables

/** Streaming curation composition ([[graft.api.Curation.stream]]): admission
  * verdicts feeding pack deltas inside one micro-batch must equal the BATCH
  * pair it composes — d12's incremental verdicts for the ledger half, and
  * `TextOps.packAppend` over exactly the admitted doc set for the layout
  * half. Also pins restart recovery on a real checkpointed file stream: the
  * composed stream shares packStream's versioned resume state, so a stopped
  * and resumed feed must neither re-admit nor re-pack.
  */
class StreamingCurationSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"
  private val P = graft.operators.TextOps.PackSize
  private val Shards = graft.operators.TextOps.PackShards

  private def verdictKey(r: org.apache.spark.sql.Row) = (
    r.getLong(0),
    r.getLong(1),
    if (r.isNullAt(2)) Long.MinValue else r.getLong(2),
    if (r.isNullAt(3)) Double.NaN else r.getDouble(3),
    r.getInt(4))

  private def packKey(r: org.apache.spark.sql.Row) =
    r.getLong(0) -> (r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4))

  // the batch references the composed stream must reproduce
  private lazy val docs = Tables.documents(spark, sf).select("doc_id", "text")
  private lazy val standingDocs = docs.where(col("doc_id") % 5 =!= 4)
  private lazy val standingPacks = graft.SparkEntry.queries("t13_pack")(spark, sf)
    .where(col("doc_id") % 5 =!= 4)
  private lazy val expectedVerdicts =
    graft.SparkEntry.queries("d12_incremental")(spark, sf).collect().map(verdictKey)
  private lazy val expectedDeltas = {
    val admitted = expectedVerdicts.filter(_._5 == 0).map(_._1).toSet
    graft.operators.TextOps.packAppend(spark, standingPacks,
        docs.where(col("doc_id") % 5 === 4 && col("doc_id").isin(admitted.toSeq: _*))
          .select(col("doc_id"), size(split(trim(col("text")), "\\s+")).as("n_tokens")),
        P, Shards)
      .collect().map(packKey).toMap
  }

  test("3-cut composed stream == batch d12 verdicts + packAppend over the admitted set") {
    import spark.implicits._
    // explicit doc_id order: the cuts must be contiguous ascending ranges
    // for append-position parity with the all-at-once batch re-pack (the
    // bare collect's row order follows the scan partitioning, which the
    // Tables scan-parallelism floor hash-spreads)
    val newDocs = docs.where(col("doc_id") % 5 === 4).orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    val cuts = Seq(
      newDocs.slice(0, newDocs.length / 3),
      newDocs.slice(newDocs.length / 3, 2 * newDocs.length / 3),
      newDocs.slice(2 * newDocs.length / 3, newDocs.length)).filter(_.nonEmpty)

    val stream = MemoryStream[(Long, String)](spark)
    val ledger = scala.collection.mutable.ArrayBuffer[(Long, Long, Long, Double, Int)]()
    val layout = scala.collection.mutable.ArrayBuffer[(Long, (Int, Int, Int, Int))]()
    val q = graft.api.Curation.stream(
        stream.toDF().toDF("doc_id", "text"), standingDocs, standingPacks,
        P, Shards) { (verdicts, delta, _) =>
      ledger.synchronized { ledger ++= verdicts.collect().map(verdictKey) }
      layout.synchronized { layout ++= delta.collect().map(packKey) }
    }
    try cuts.foreach { c => stream.addData(c); q.processAllAvailable() }
    finally q.stop()

    val got = ledger.sortBy(_._1)
    assert(got.map(_._1).toSeq === expectedVerdicts.map(_._1).toSeq,
      "every new doc admitted exactly once")
    got.zip(expectedVerdicts).foreach { case (g, e) =>
      assert(g._1 == e._1 && g._2 == e._2 && g._3 == e._3 && g._5 == e._5, s"$g vs $e")
      assert((g._4.isNaN && e._4.isNaN) || g._4 == e._4, s"$g vs $e")
    }
    // only ADMITTED docs entered the layout, at the batch append coordinates
    val gotLayout = layout.toMap
    assert(layout.size === gotLayout.size, "a doc was packed twice")
    assert(gotLayout.keySet === expectedDeltas.keySet,
      "streamed layout covers a different doc set than the admitted batch append")
    gotLayout.foreach { case (id, row) =>
      assert(row === expectedDeltas(id), s"doc $id: composed layout drifted")
    }
    // the composition found real work: at least one reject stayed out
    val rejected = expectedVerdicts.filter(_._5 == 1).map(_._1).toSet
    assert(rejected.nonEmpty, "batch (5,4) rejects nothing at this SF — weak fixture")
    assert(rejected.forall(!gotLayout.keySet.contains(_)),
      "a rejected doc leaked into the pack layout")
  }

  test("composed stream restart on the same checkpoint: no re-admission, no re-pack") {
    import java.nio.file.Files
    val newDocs = docs.where(col("doc_id") % 5 === 4)
    val stage = Files.createTempDirectory("cur_stage")
    newDocs.repartitionByRange(8, col("doc_id"))
      .sortWithinPartitions("doc_id")
      .write.mode("overwrite").parquet(stage.toString)
    import scala.jdk.CollectionConverters._
    val staged = Files.list(stage).iterator().asScala
      .filter(_.getFileName.toString.startsWith("part-"))
      .toIndexedSeq.sortBy(_.getFileName.toString)
    val feed = Files.createTempDirectory("cur_feed")
    def feedFiles(from: Int, until: Int): Unit = (from until until).foreach { i =>
      val dst = feed.resolve(f"f$i%04d.parquet")
      Files.copy(staged(i), dst)
      Files.setLastModifiedTime(dst,
        java.nio.file.attribute.FileTime.fromMillis(1000000000000L + i * 1000L))
    }
    val ckpt = Files.createTempDirectory("cur_ckpt").toString
    val ledger = scala.collection.mutable.ArrayBuffer[(Long, Long, Long, Double, Int)]()
    val perBatch = scala.collection.mutable.Map[Long, Map[Long, (Int, Int, Int, Int)]]()
    def start() = {
      val stream = spark.readStream.schema(newDocs.schema)
        .option("maxFilesPerTrigger", 1).parquet(feed.toString)
      graft.api.Curation.stream(stream, standingDocs, standingPacks,
          P, Shards, checkpoint = Some(ckpt)) { (verdicts, delta, id) =>
        ledger.synchronized { ledger ++= verdicts.collect().map(verdictKey) }
        perBatch.synchronized { perBatch(id) = delta.collect().map(packKey).toMap }
      }
    }
    val half = staged.size / 2
    val q1 = start()
    try { feedFiles(0, half); q1.processAllAvailable() } finally q1.stop()
    assert(ledger.nonEmpty, "first run admitted nothing")

    val q2 = start()
    try { feedFiles(half, staged.size); q2.processAllAvailable() } finally q2.stop()

    val got = ledger.sortBy(_._1)
    assert(got.map(_._1).distinct.size === got.size,
      "restart re-admitted docs the checkpoint had already committed")
    assert(got.map(_._1).toSeq === expectedVerdicts.map(_._1).toSeq)
    val batches = perBatch.toSeq.sortBy(_._1).map(_._2)
    val gotLayout = batches.flatten.toMap
    assert(batches.map(_.size).sum === gotLayout.size,
      "a doc was packed in two different batches — overlapping resume state")
    assert(gotLayout.keySet === expectedDeltas.keySet)
    gotLayout.foreach { case (id, row) =>
      assert(row === expectedDeltas(id), s"doc $id: restarted composition drifted")
    }
  }
}
