package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.core.TestSpark

/** The bucketed LSH band artifact (r12 verdict stretch): scored pairs served
  * through `graft.dedup.bandsDir` must equal the direct build bit-for-bit,
  * and the served pair plan must carry at most ONE static exchange (the
  * candidate distinct) — the prune aggregate, keep join and self-join all
  * ride the bucketed band table's hash-clustering. The graph family's
  * pay-the-shuffle-once ingest discipline, applied to the dedup family's
  * one corpus-sized exchange.
  */
class BucketedDedupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("bandsDir-served scored pairs == direct build; pair plan exchange-free") {
    val out = java.nio.file.Files.createTempDirectory("dedup_bands").toString
    val direct = Dedup.scoredPairs(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(direct.nonEmpty, "no scored pairs at this SF — weak fixture")

    ArtifactCache.invalidate(spark, sf)
    val (nBands, colocated, nEx) = Dedup.buildBandsBucketed(spark, sf, out, buckets = 4)
    assert(nBands > 0)
    assert(colocated, s"served pair plan carries $nEx static exchanges (expected <= 1)")

    sys.props(Dedup.BandsDirProp) = out
    try {
      val served = Dedup.scoredPairs(spark, sf).collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
      assert(served.keySet === direct.keySet, "served pair set drifted")
      served.foreach { case (k, est) =>
        assert(est === direct(k), s"pair $k: est_jaccard drifted through the artifact")
      }
      // a family consumer reads identically through the artifact (d9's
      // component chain rides the same scored-pair threshold)
      val d9Served = Dedup.queries("d9_dedup_groups")(spark, sf).collect().toSeq
      ArtifactCache.invalidate(spark, sf)
      sys.props -= Dedup.BandsDirProp
      val d9Direct = Dedup.queries("d9_dedup_groups")(spark, sf).collect().toSeq
      assert(d9Served === d9Direct, "d9 over the landed band artifact drifted")
    } finally {
      sys.props -= Dedup.BandsDirProp
      ArtifactCache.invalidate(spark, sf)
      spark.sql("DROP TABLE IF EXISTS graft_b_bands")
    }
  }
}
