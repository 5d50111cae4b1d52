package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.core.TestSpark

/** Behavior specs for the round-5 additions: the convergence-driven
  * PageRank twin (n1 stays the oracled fixed-3 unroll) and the
  * ArtifactCache build/hit observability counters.
  */
class Round5OpsSpec extends AnyFunSuite {
  private lazy val spark: SparkSession = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("convergent PageRank at 3 capped rounds is bit-identical to the n1 unroll") {
    // epsFp=0 never converges early, so exactly maxIters=3 rounds run — the
    // loop body must then reproduce the oracled fixed-3 unroll bit-for-bit
    // (same integer fixed-point arithmetic, same top-20 projection)
    val (conv, iters) = GraphOps.pageRankConverged(spark, sf, epsFp = 0L, maxIters = 3)
    assert(iters === 3)
    val fixed = GraphOps.queries("n1_pagerank")(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val got = conv.collect().map(r => (r.getString(0), r.getLong(1)))
    assert(got.toSeq === fixed.toSeq)
  }

  test("convergent PageRank reaches quiescence before the iteration cap") {
    // damping 0.85 contracts per-round deltas geometrically (~0.85/round),
    // so a 1e-9 relative tolerance (1000 fixed-point units of 10^-12) needs
    // ~ln(delta0/eps)/0.1625 ≈ 100 rounds from a uniform start — well under
    // the 200-round cap on any connected bench graph
    val (conv, iters) = GraphOps.pageRankConverged(spark, sf, epsFp = 1000L, maxIters = 200)
    assert(iters > 3, s"suspiciously fast convergence ($iters rounds)")
    assert(iters < 200, s"hit the iteration cap without converging")
    val rows = conv.collect()
    assert(rows.length === 20)
    // converged ranks agree with the 3-round unroll to the coarse ordering:
    // the top node is already separated after 3 rounds on this fixture
    val fixedTop = GraphOps.queries("n1_pagerank")(spark, sf).collect()(0).getString(0)
    assert(rows(0).getString(0) === fixedTop)
  }

  test("ArtifactCache counts builds once and hits thereafter, with build time attributed") {
    ArtifactCache.invalidateAll()
    ArtifactCache.resetStats()
    var built = 0
    def make() = ArtifactCache.getOrElseUpdate("spec.probe", spark, sf) {
      built += 1
      Thread.sleep(5)
      spark.range(3).toDF("id")
    }
    make(); make(); make()
    assert(built === 1)
    val s = ArtifactCache.statsSnapshot("spec.probe")
    assert(s.builds === 1)
    assert(s.hits === 2)
    assert(s.buildMillis >= 5, s"build time ${s.buildMillis}ms lost")
    ArtifactCache.invalidateAll()
    ArtifactCache.resetStats()
  }

  test("d6's blocked kernel is bit-identical to the declarative crossJoin plan") {
    val kernel = Dedup.queries("d6_embed_cosine")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val reference = Dedup.d6CrossJoinReference(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(kernel.length === reference.length)
    // tuple equality is bitwise for the rounded cosine: both sides must have
    // summed in the same index order and divided with the same association
    assert(kernel.toSeq === reference.toSeq)
    assert(kernel.nonEmpty, "fixture produced no near-dup pairs — vacuous parity")
  }

  test("kernel keeps Spark's nan-safe threshold: a zero-norm vector's NaN cosine passes") {
    import spark.implicits._
    // vec 1 is all-zero: cos(1, j) = 0/0 = NaN, which Spark's >= sorts
    // GREATER than the threshold (nanSafeCompareDoubles) — the declarative
    // plan emitted those pairs, so the kernel must too
    val e = Seq(
      (1L, Array(0.0, 0.0, 0.0)),
      (2L, Array(1.0, 0.0, 0.0)),
      (3L, Array(1.0, 1e-6, 0.0))).toDF("vec_id", "v")
    val got = BruteForce.cosinePairs(e, 0.38).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .sortBy(p => (p._1, p._2))
    assert(got.map(p => (p._1, p._2)).toSeq === Seq((1L, 2L), (1L, 3L), (2L, 3L)))
    assert(got.take(2).forall(p => p._3.isNaN), s"zero-norm pairs must carry NaN, got $got")
    assert(got(2)._3 > 0.38)
  }
}
