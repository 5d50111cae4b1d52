package graft.operators

import org.apache.spark.sql.functions.col
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

  test("disk-resident bucketed edge table serves n1/n2 bit-identically with " +
      "zero edge-side exchange per round") {
    val out = java.nio.file.Files.createTempDirectory("graph_edges").toString
    val n1Direct = GraphOps.queries("n1_pagerank")(spark, sf).collect().toSeq
    val n2Direct = GraphOps.queries("n2_weighted_pagerank")(spark, sf).collect().toSeq
    val (nNodes, nEdges) = GraphOps.buildEdgesBucketed(spark, sf, out, buckets = 4)
    assert(nNodes > 0 && nEdges > 0)

    ArtifactCache.invalidate(spark, sf)
    sys.props("graft.graph.edgesDir") = out
    try {
      val n1Disk = GraphOps.queries("n1_pagerank")(spark, sf).collect().toSeq
      assert(n1Disk === n1Direct, "n1 over the disk edge table drifted")
      val n2Disk = GraphOps.queries("n2_weighted_pagerank")(spark, sf).collect().toSeq
      assert(n2Disk === n2Direct, "n2 over the disk edge table drifted")
      // plan: one un-checkpointed round must not exchange the edge side —
      // the bucketed scan is already hash-clustered on src (the rank frame
      // and the aggregate may exchange; the edge table must not)
      val round = GraphOps.probeRound(spark, sf)
      round.collect()
      val nodes = graft.tools.PlanAudit.liveNodes(round.queryExecution.executedPlan)
      val scanStrs = nodes.filter(_.isInstanceOf[
        org.apache.spark.sql.execution.FileSourceScanExec]).map(_.toString)
      assert(scanStrs.exists(_.contains("Bucketed: true")),
        s"round does not scan the bucketed edge table:\n${scanStrs.mkString("\n")}")
    } finally {
      sys.props -= "graft.graph.edgesDir"
      ArtifactCache.invalidate(spark, sf)
      spark.sql("DROP TABLE IF EXISTS graft_b_edges")
    }
  }

  test("rev-phase append into a fresh catalog preserves the forward half") {
    // the sf300 regression: phase=rev in a NEW process (empty in-memory
    // catalog) must register the existing table before appending — a bare
    // append-saveAsTable CREATES a fresh table and replaces the fwd files
    val out = java.nio.file.Files.createTempDirectory("graph_edges_phased").toString
    try {
      GraphOps.buildEdgesBucketed(spark, sf, out, buckets = 4, phase = "deg")
      GraphOps.buildEdgesBucketed(spark, sf, out, buckets = 4, phase = "fwd")
      spark.sql("DROP TABLE IF EXISTS graft_b_edges") // simulate fresh process
      GraphOps.buildEdgesBucketed(spark, sf, out, buckets = 4, phase = "rev")
      val rows = spark.read.parquet(s"$out/edges")
      val nPairs = GraphOps.weightedPairs(spark, sf).count()
      assert(rows.count() === 2 * nPairs, "append replaced the forward half")
      // both directions present: customers (even ids) as src = fwd half,
      // suppliers (odd ids) as src = rev half
      assert(rows.where(col("src") % 2 === 0).count() === nPairs)
      assert(rows.where(col("src") % 2 === 1).count() === nPairs)
    } finally {
      spark.sql("DROP TABLE IF EXISTS graft_b_edges")
    }
  }
}
