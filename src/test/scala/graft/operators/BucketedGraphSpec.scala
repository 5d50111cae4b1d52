package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.core.TestSpark

/** The bucketed co-located edge build (r11 verdict #1): pairs landed by
  * `buildPairsBucketed` must equal the direct-join build bit-for-bit, the
  * bucketed join must not shuffle its inputs (the static-plan flag), and
  * the `graft.graph.pairsDir` serving path must yield the exact n1 result
  * the direct build yields — so a scale rung that lands the artifact once
  * and serves every rank query from it is running the same computation,
  * minus the join shuffle that blew the sf300 disk envelope.
  */
class BucketedGraphSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("bucketed-ingest pairs == direct build; join exchange-free; pairsDir serves n1") {
    val out = java.nio.file.Files.createTempDirectory("graph_bucketed").toString
    val (n, colocated) = GraphOps.buildPairsBucketed(spark, sf, out, buckets = 4)
    assert(colocated, "bucketed orders-lineitem join shuffled its inputs")

    val direct = GraphOps.weightedPairs(spark, sf)
    assert(n === direct.count(), "pair cardinality differs")
    val landed = spark.read.parquet(s"$out/pairs")
    assert(landed.exceptAll(direct).isEmpty && direct.exceptAll(landed).isEmpty,
      "bucketed-ingest pairs differ from the direct join build")

    val n1Direct = GraphOps.queries("n1_pagerank")(spark, sf).collect().toSeq
    // serve the landed artifact: fresh artifact state, property-gated read
    ArtifactCache.invalidate(spark, sf)
    sys.props("graft.graph.pairsDir") = s"$out/pairs"
    try {
      val n1Art = GraphOps.queries("n1_pagerank")(spark, sf).collect().toSeq
      assert(n1Art === n1Direct, "n1 over the landed pairs drifted")
    } finally {
      sys.props -= "graft.graph.pairsDir"
      ArtifactCache.invalidate(spark, sf)
    }
  }
}
