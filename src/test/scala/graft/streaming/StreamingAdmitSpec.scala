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

    // parity precondition (see admissionVerdicts scaladoc): the stream caps
    // band buckets on the combined standing+batch view it can see, d12 on
    // the full corpus — a bucket that straddles the cap between those views
    // would diverge by design, so the fixture must have none at all
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
    // explicit third-boundaries instead of grouped(len/3+1): the latter
    // yields 2 groups for small fixtures (len=4 -> 2+2), failing for a
    // reason unrelated to admission parity. Empty slices are dropped, so a
    // regenerated corpus of any size still exercises multi-cut admission.
    val cuts = Seq(
      newDocs.slice(0, newDocs.length / 3),
      newDocs.slice(newDocs.length / 3, 2 * newDocs.length / 3),
      newDocs.slice(2 * newDocs.length / 3, newDocs.length)).filter(_.nonEmpty)
    assert(cuts.nonEmpty && cuts.map(_.length).sum == newDocs.length)

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

  /** Restart-recovery soak (round-7 verdict #5): the foreachBatch admission
    * path driven as a REAL checkpointed file stream under the RocksDB state
    * provider, stopped halfway and resumed as a FRESH query on the same
    * checkpoint. The committed source offsets must carry the run: every new
    * doc is admitted exactly once across both runs (a lost checkpoint would
    * re-admit the first half; a corrupt one would skip docs), and the union
    * ledger equals d12's batch verdicts row for row.
    */
  test("admission stream restart: same checkpoint resumes with each doc admitted exactly once") {
    import java.nio.file.Files
    // pin RocksDB for THIS test only: TestSpark's session is shared across
    // suites, so restore the previous provider in the finally below or the
    // setting leaks into every later streaming suite in the JVM
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val prevProvider = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
    val standingSigs = graft.operators.Dedup
      .minhashSigs(docs.where(col("doc_id") % 5 =!= 4)).cache()
    standingSigs.count()
    val newDocs = docs.where(col("doc_id") % 5 === 4)

    // stage the crawl slice as 8 doc_id-ranged files; feed with strictly
    // increasing mtimes so FileStreamSource discovers them in order
    val stage = Files.createTempDirectory("admit_stage")
    newDocs.repartitionByRange(8, col("doc_id"))
      .write.mode("overwrite").parquet(stage.toString)
    import scala.jdk.CollectionConverters._
    val staged = Files.list(stage).iterator().asScala
      .filter(_.getFileName.toString.startsWith("part-"))
      .toIndexedSeq.sortBy(_.getFileName.toString)
    val feed = Files.createTempDirectory("admit_feed")
    def feedFiles(from: Int, until: Int): Unit = (from until until).foreach { i =>
      val dst = feed.resolve(f"f$i%04d.parquet")
      Files.copy(staged(i), dst)
      Files.setLastModifiedTime(dst,
        java.nio.file.attribute.FileTime.fromMillis(1000000000000L + i * 1000L))
    }
    val ckpt = Files.createTempDirectory("admit_ckpt").toString
    val ledger = scala.collection.mutable.ArrayBuffer[(Long, Long, Long, Double, Int)]()
    def start() = {
      val stream = spark.readStream.schema(newDocs.schema)
        .option("maxFilesPerTrigger", 1).parquet(feed.toString)
      StreamOps.admitStream(stream, standingSigs, checkpoint = Some(ckpt)) {
        (verdicts, _) =>
          ledger.synchronized { ledger ++= verdicts.collect().map(key) }
      }
    }

    val half = staged.size / 2
    val q1 = start()
    try { feedFiles(0, half); q1.processAllAvailable() } finally q1.stop()
    val preCount = ledger.size
    assert(preCount > 0, "first run admitted nothing")

    val q2 = start()
    try { feedFiles(half, staged.size); q2.processAllAvailable() } finally q2.stop()

    val got = ledger.sortBy(_._1)
    assert(got.map(_._1).distinct.size === got.size,
      "restart re-admitted docs the checkpoint had already committed")
    assert(got.size > preCount, "second run admitted nothing after restart")
    val expected = graft.SparkEntry.queries("d12_incremental")(spark, sf)
      .collect().map(key).toSeq
    assert(got.map(_._1) == expected.map(_._1))
    got.zip(expected).foreach { case (g, e) =>
      assert(g._1 == e._1 && g._2 == e._2 && g._3 == e._3 && g._5 == e._5, s"$g vs $e")
      assert((g._4.isNaN && e._4.isNaN) || g._4 == e._4, s"$g vs $e")
    }
    } finally {
      prevProvider match {
        case Some(v) => spark.conf.set(providerKey, v)
        case None => spark.conf.unset(providerKey)
      }
    }
  }
}
