package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.core.TestSpark
import graft.Tables

/** Streaming admission parity: d12's incremental-dedup verdicts reproduced
  * by [[StreamOps.admitStream]] feeding the new batch through a MemoryStream
  * in several micro-batch cuts against the standing-corpus signature frame.
  * The union of per-cut verdicts must equal the batch query row for row —
  * cut placement must not change any verdict (each doc's candidates live in
  * its own micro-batch by construction).
  */
class StreamingAdmitSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def key(r: org.apache.spark.sql.Row) = (
    r.getLong(0),
    r.getLong(1),
    if (r.isNullAt(2)) Long.MinValue else r.getLong(2),
    if (r.isNullAt(3)) Double.NaN else r.getDouble(3),
    r.getInt(4))

  test("streamed admission verdicts equal d12's batch verdicts across 3 cuts") {
    import spark.implicits._
    val docs = Tables.documents(spark, sf).select("doc_id", "text")

    // parity precondition (see admissionVerdicts scaladoc): no full-corpus
    // band bucket may exceed the LSH cap, else the batch query's whale-bucket
    // drop and the stream's capped-snapshot lookup diverge by design
    val allBands = graft.operators.Dedup.minhashSigs(docs)
      .select(posexplode(expr(graft.operators.Dedup.bandHashArrayExpr))
        .as(Seq("band_idx", "band_hash")))
      .groupBy("band_idx", "band_hash").agg(count(lit(1)).as("bsz"))
    val maxBucket = allBands.agg(max("bsz")).first().getLong(0)
    assert(maxBucket <= graft.operators.Dedup.LshMaxBucket,
      s"fixture violates the no-whale-bucket precondition (max $maxBucket)")

    val standingSigs = graft.operators.Dedup
      .minhashSigs(docs.where(col("doc_id") % 5 =!= 4)).cache()
    standingSigs.count()

    val newDocs = docs.where(col("doc_id") % 5 === 4)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(newDocs.nonEmpty)
    val cuts = newDocs.grouped(math.max(1, newDocs.length / 3 + 1)).toSeq
    assert(cuts.length == 3)

    val stream = MemoryStream[(Long, String)](spark)
    val collected = scala.collection.mutable.ArrayBuffer[(Long, Long, Long, Double, Int)]()
    val q = StreamOps.admitStream(
        stream.toDF().toDF("doc_id", "text"), standingSigs) { (verdicts, _) =>
      collected.synchronized { collected ++= verdicts.collect().map(key) }
    }
    try cuts.foreach { c => stream.addData(c); q.processAllAvailable() }
    finally q.stop()

    val expected = graft.SparkEntry.queries("d12_incremental")(spark, sf)
      .collect().map(key).toSeq
    val got = collected.sortBy(_._1)
    assert(got.map(_._1) == expected.map(_._1)) // every new doc, exactly once
    // NaN != NaN under ==, so compare the tupled keys via string forms for
    // the null-sentinel column and exactly elsewhere
    got.zip(expected).foreach { case (g, e) =>
      assert(g._1 == e._1 && g._2 == e._2 && g._3 == e._3 && g._5 == e._5, s"$g vs $e")
      assert((g._4.isNaN && e._4.isNaN) || g._4 == e._4, s"$g vs $e")
    }
    // the stream found real work: at least one candidate and one reject
    assert(got.exists(_._2 > 0) || expected.forall(_._2 == 0))
    assert(got.map(_._5).sum == expected.map(_._5).sum)
  }
}
