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
}
