package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.core.TestSpark

/** Streaming pack materialization parity (r12 stretch): a 3-cut feed of
  * admitted documents appended through `StreamOps.packStream` must equal
  * the one-shot batch append (`TextOps.packAppend` — t24's oracle-checked
  * machinery) over the concatenated feed, provided the cuts arrive in
  * doc_id order (the append semantic: within a shard, arrival order IS
  * pack order). Also pins the cross-batch resume state: cut k+1's packs
  * continue exactly where cut k ended.
  */
class StreamingPackSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"
  private val P = graft.operators.TextOps.PackSize
  private val Shards = graft.operators.TextOps.PackShards

  test("3-cut streamed pack append == one-shot batch append") {
    import spark.implicits._
    val counts = graft.Tables.documents(spark, sf)
      .select(col("doc_id"), size(split(trim(col("text")), "\\s+")).as("n_tokens"))
    val standingCounts = counts.where(col("doc_id") % 5 =!= 4)
    val newCounts = counts.where(col("doc_id") % 5 === 4)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSeq
    assert(newCounts.size >= 3, "fixture too small for a 3-cut feed")

    // the standing layout both paths resume from
    val standing = graft.SparkEntry.queries("t13_pack")(spark, sf)
      .where(col("doc_id") % 5 =!= 4)
    val _ = standingCounts // (documents the intended standing set)

    val expected = graft.operators.TextOps
      .packAppend(spark, standing,
        newCounts.toDF("doc_id", "n_tokens"), P, Shards)
      .collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4)))
      .toMap

    // doc_id-ordered cuts: arrival order matches the batch window order
    val cuts = Seq(
      newCounts.slice(0, newCounts.length / 3),
      newCounts.slice(newCounts.length / 3, 2 * newCounts.length / 3),
      newCounts.slice(2 * newCounts.length / 3, newCounts.length)).filter(_.nonEmpty)

    val stream = MemoryStream[(Long, Int)](spark)
    val perBatch = scala.collection.mutable.ArrayBuffer[(Long, Map[Long, (Int, Int, Int, Int)])]()
    val q = StreamOps.packStream(
        stream.toDF().toDF("doc_id", "n_tokens"), standing, P, Shards) { (delta, id) =>
      val rows = delta.collect()
        .map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4)))
        .toMap
      perBatch.synchronized { perBatch += id -> rows }
    }
    try cuts.foreach { c => stream.addData(c); q.processAllAvailable() }
    finally q.stop()

    val got = perBatch.sortBy(_._1).flatMap(_._2).toMap
    assert(got.keySet === expected.keySet, "streamed docs differ from the batch append")
    got.foreach { case (id, row) =>
      assert(row === expected(id), s"doc $id: streamed layout drifted from batch append")
    }
    // each batch emitted exactly its cut (delta, not a re-pack)
    assert(perBatch.map(_._2.size).sum === newCounts.size)
    assert(perBatch.size === cuts.size)
  }

  /** Restart recovery (r12 verdict #4 / ADVICE): the checkpointed pack
    * stream driven as a REAL file stream, stopped halfway and resumed as a
    * fresh query on the same checkpoint. The versioned resume state under
    * `<ckpt>/graft-pack-bases/` must carry the run: the second half's packs
    * continue exactly where the first half's committed state ended (a
    * re-seed from `standing` would overlap the first half's coordinates;
    * a double-advance would leave gaps), and the union ledger equals the
    * one-shot batch append bit for bit. Runs under both state-store
    * providers — foreachBatch holds no store state, so provider choice must
    * not matter, and this pins that.
    */
  for (provider <- Seq("default", "rocksdb"))
  test(s"pack stream restart on the same checkpoint continues, not re-seeds [$provider]") {
    import java.nio.file.Files
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val prevProvider = spark.conf.getOption(providerKey)
    if (provider == "rocksdb") spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val counts = graft.Tables.documents(spark, sf)
        .select(col("doc_id"), size(split(trim(col("text")), "\\s+")).as("n_tokens"))
      val newCounts = counts.where(col("doc_id") % 5 === 4)
      val standing = graft.SparkEntry.queries("t13_pack")(spark, sf)
        .where(col("doc_id") % 5 =!= 4)
      val expected = graft.operators.TextOps
        .packAppend(spark, standing, newCounts, P, Shards)
        .collect()
        .map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4)))
        .toMap

      // stage the feed as doc_id-ranged files with increasing mtimes so the
      // file source discovers them in doc_id (= append) order
      val stage = Files.createTempDirectory("pack_stage")
      newCounts.repartitionByRange(8, col("doc_id"))
        .sortWithinPartitions("doc_id")
        .write.mode("overwrite").parquet(stage.toString)
      import scala.jdk.CollectionConverters._
      val staged = Files.list(stage).iterator().asScala
        .filter(_.getFileName.toString.startsWith("part-"))
        .toIndexedSeq.sortBy(_.getFileName.toString)
      val feed = Files.createTempDirectory("pack_feed")
      def feedFiles(from: Int, until: Int): Unit = (from until until).foreach { i =>
        val dst = feed.resolve(f"f$i%04d.parquet")
        Files.copy(staged(i), dst)
        Files.setLastModifiedTime(dst,
          java.nio.file.attribute.FileTime.fromMillis(1000000000000L + i * 1000L))
      }
      val ckpt = Files.createTempDirectory("pack_ckpt").toString
      // keyed by batch id: a replayed batch OVERWRITES its slot (the sink
      // idempotence contract the scaladoc states), never double-counts
      val perBatch = scala.collection.mutable.Map[Long, Map[Long, (Int, Int, Int, Int)]]()
      def start() = {
        val stream = spark.readStream.schema(newCounts.schema)
          .option("maxFilesPerTrigger", 1).parquet(feed.toString)
        StreamOps.packStream(stream, standing, P, Shards, Some(ckpt)) { (delta, id) =>
          val rows = delta.collect()
            .map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4)))
            .toMap
          perBatch.synchronized { perBatch(id) = rows }
        }
      }
      val half = staged.size / 2
      val q1 = start()
      try { feedFiles(0, half); q1.processAllAvailable() } finally q1.stop()
      val preDocs = perBatch.values.map(_.size).sum
      assert(preDocs > 0, "first run packed nothing")

      val q2 = start()
      try { feedFiles(half, staged.size); q2.processAllAvailable() } finally q2.stop()

      val batches = perBatch.toSeq.sortBy(_._1).map(_._2)
      val got = batches.flatten.toMap
      assert(batches.map(_.size).sum === got.size,
        "a doc was packed in two different batches — overlapping resume state")
      assert(got.keySet === expected.keySet, "restart lost or re-packed docs")
      got.foreach { case (id, row) =>
        assert(row === expected(id),
          s"doc $id: restarted stream drifted from the batch append")
      }
    } finally {
      prevProvider match {
        case Some(v) => spark.conf.set(providerKey, v)
        case None => spark.conf.unset(providerKey)
      }
    }
  }
}
