package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.core.TestSpark

/** Behavior specs for the round-8 additions. The headline check is t19's
  * driver-vs-distributed gate parity: the two BPE merge-loop modes (collected
  * vocab below the floor, localCheckpoint'ed rounds above it) must produce
  * the identical merge table on the same corpus — the same both-modes
  * contract GraphShuffleGateSpec pins for the PageRank rank-join gate.
  */
class Round8OpsSpec extends AnyFunSuite {
  private lazy val spark: SparkSession = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def runT19(): Seq[(Int, String, String, String, Long)] =
    TextOps.queries("t19_bpe_train")(spark, sf)
      .collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getString(3), r.getLong(4)))
      .toSeq

  test("t19 gate parity: driver-collected and distributed merge loops agree") {
    ArtifactCache.invalidate(spark, sf)
    val driver = runT19() // default floor: vocab is tiny -> driver path
    assert(driver.nonEmpty && driver.size <= 10)
    val floorKey = "graft.bpe.driverFloorVocab"
    val prev = sys.props.get(floorKey)
    sys.props(floorKey) = "0" // force the distributed rounds
    ArtifactCache.invalidate(spark, sf)
    try {
      val dist = runT19()
      assert(dist === driver)
    } finally {
      prev match {
        case Some(v) => sys.props(floorKey) = v
        case None => sys.props.remove(floorKey)
      }
      ArtifactCache.invalidate(spark, sf)
    }
  }

  test("t19 merges re-derive from a third, array-based greedy implementation") {
    val merges = runT19()
    // independent reference: word freq -> greedy BPE over symbol vectors
    val words = graft.Tables.documents(spark, sf)
      .selectExpr("text").collect().iterator
      .flatMap(_.getString(0).trim.split("\\s+")).filter(_.nonEmpty)
      .foldLeft(Map.empty[String, Long]) { (m, w) => m.updated(w, m.getOrElse(w, 0L) + 1L) }
    var vocab: Map[Vector[String], Long] =
      words.map { case (w, f) => (w.map(_.toString).toVector, f) }
    val expect = Seq.newBuilder[(Int, String, String, String, Long)]
    for (k <- 1 to 10) {
      val counts = vocab.toSeq.flatMap { case (syms, f) =>
        syms.zip(syms.tail).map(p => (p, f))
      }.groupBy(_._1).map { case (p, xs) => (p, xs.map(_._2).sum) }
      if (counts.nonEmpty) {
        val maxN = counts.values.max
        val (l, r) = counts.filter(_._2 == maxN).keys.toSeq.min
        expect += ((k, l, r, l + r, maxN))
        vocab = vocab.toSeq.map { case (syms, f) =>
          val b = Vector.newBuilder[String]
          var i = 0
          while (i < syms.length) {
            if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
              b += (l + r); i += 2
            } else { b += syms(i); i += 1 }
          }
          (b.result(), f)
        }.groupBy(_._1).map { case (s2, xs) => (s2, xs.map(_._2).sum) }
      }
    }
    assert(merges === expect.result())
  }

  test("t19 merge rules chain: later rules may consume earlier merged symbols") {
    val merges = runT19()
    val symbolsSoFar = scala.collection.mutable.Set[String]()
    merges.foreach { case (_, l, r, m, _) =>
      // every side is either a single char or a previously-merged symbol
      assert(l.length == 1 || symbolsSoFar.contains(l), s"lhs $l")
      assert(r.length == 1 || symbolsSoFar.contains(r), s"rhs $r")
      assert(m == l + r)
      symbolsSoFar += m
    }
    // merge counts are non-increasing only within equal-support regimes is
    // NOT an invariant of BPE (a merged symbol can create a more frequent
    // pair), but merge_idx must be dense and ordered
    assert(merges.map(_._1) == (1 to merges.size))
  }
}
