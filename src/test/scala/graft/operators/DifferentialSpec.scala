package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{col, expr}
import org.scalatest.funsuite.AnyFunSuite
import graft.core.TestSpark

/** Pins the round-10 differential-verification twins to their shipped
  * counterparts BIT-FOR-BIT on the fixture corpus — the same in-engine
  * compare `ScaleProbe diffv` runs at the scale rungs where the DuckDB
  * oracles are infeasible (sf100: d9's chain OOMed DuckDB, s7's training
  * chain blew the time cap). A twin that silently diverges here would make
  * the sf100 "match" evidence worthless, so equality is exact set equality
  * over every column, not a summary statistic.
  */
class DifferentialSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def assertSameSet(a: DataFrame, b: DataFrame, what: String): Unit = {
    assert(a.columns.toSeq === b.columns.toSeq, s"$what: column mismatch")
    val onlyA = a.exceptAll(b).count()
    val onlyB = b.exceptAll(a).count()
    assert(onlyA == 0 && onlyB == 0,
      s"$what diverged: ${onlyA} rows only in alt, ${onlyB} only in shipped")
  }

  test("two-star CC labels chains, stars, and multiple components exactly") {
    import spark.implicits._
    // chain 1..6, star centered low (10 -> 11..14), star centered HIGH
    // (25 <- 20, 25 <- 21), pair (30, 31) — plus adversarial edge order
    val edges = Seq(
      (6L, 5L), (2L, 1L), (3L, 4L), (5L, 4L), (2L, 3L),
      (10L, 11L), (12L, 10L), (10L, 13L), (14L, 10L),
      (25L, 20L), (21L, 25L),
      (31L, 30L)).toDF("src", "dst")
    val got = Differential.twoStarLabels(edges)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val want = Map(
      1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L, 6L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 13L -> 10L, 14L -> 10L,
      20L -> 20L, 21L -> 20L, 25L -> 20L,
      30L -> 30L, 31L -> 30L)
    assert(got === want)
  }

  test("v1 two-star components == shipped min-label propagation") {
    assertSameSet(
      Differential.queries("v1_cc_twostar")(spark, sf),
      Dedup.queries("d9_dedup_groups")(spark, sf),
      "v1 vs d9")
  }

  test("alt component frame (incl. window canonical) == shipped max_by frame") {
    assertSameSet(
      Differential.altComponentLabels(spark, sf),
      Dedup.componentLabels(spark, sf),
      "altComponentLabels vs componentLabels")
  }

  test("v2 interval-merge span union == shipped lag-window d11") {
    assertSameSet(
      Differential.queries("v2_spans_merge")(spark, sf),
      Dedup.queries("d11_dup_spans")(spark, sf),
      "v2 vs d11")
  }

  test("v3 independently trained+encoded IVF-PQ == shipped s7") {
    assertSameSet(
      Differential.queries("v3_ivfpq_adc")(spark, sf),
      Similarity.queries("s7_ivfpq_ann")(spark, sf),
      "v3 vs s7")
  }

  test("v4 min-rank fixed-point BPE ids == shipped t21") {
    assertSameSet(
      Differential.queries("v4_bpe_ids")(spark, sf),
      TextOps.queries("t21_bpe_ids")(spark, sf),
      "v4 vs t21")
  }

  test("v5 mapPartitions pack scan == shipped t22 window cumsum") {
    assertSameSet(
      Differential.queries("v5_pack_bpe")(spark, sf),
      TextOps.queries("t22_pack_bpe")(spark, sf),
      "v5 vs t22")
  }

  test("v6 token-explode pack assembly == shipped t23 slice split") {
    assertSameSet(
      Differential.queries("v6_pack_sequences")(spark, sf),
      TextOps.queries("t23_pack_sequences")(spark, sf),
      "v6 vs t23")
  }

  test("v7 alt-Lloyd assignment == shipped e1 cell_top/vecsum_dec chain") {
    assertSameSet(
      Differential.queries("v7_kmeans")(spark, sf),
      Clustering.queries("e1_kmeans")(spark, sf),
      "v7 vs e1")
  }

  test("v8 alt-Lloyd inertia == shipped e3") {
    assertSameSet(
      Differential.queries("v8_inertia")(spark, sf),
      Clustering.queries("e3_inertia")(spark, sf),
      "v8 vs e3")
  }

  test("min-rank encoder handles chained, overlapping, and aliasing merges") {
    import spark.implicits._
    // an adversarial rule table exercised directly against the shipped
    // boundary-doubled fold semantics via encodedVocab would need a trained
    // corpus; instead pin the PASS semantics of the v4 walk itself:
    // (a,a) on "aaaa" -> [aa,aa]; (a,a) on "aaa" -> [aa,a] (non-overlapping
    // greedy); chained (a,b)->ab then (ab,c)->abc needs two rounds
    val ps = Seq(
      (Seq("a", "a", "a", "a"), "a", "a", Seq("aa", "aa")),
      (Seq("a", "a", "a"), "a", "a", Seq("aa", "a")),
      (Seq("x", "a", "b"), "a", "b", Seq("x", "ab")),
      (Seq("a", "b", "a", "b"), "a", "b", Seq("ab", "ab")),
      (Seq("ab", "c"), "ab", "c", Seq("abc")))
    val got = ps.toDF("ps", "l", "r", "want")
      .select(expr("""aggregate(ps, CAST(array() AS ARRAY<STRING>),
        | (acc, p) -> CASE
        |   WHEN size(acc) > 0 AND element_at(acc, -1) = l AND p = r
        |     THEN concat(slice(acc, 1, size(acc) - 1), array(concat(l, r)))
        |   ELSE concat(acc, array(p)) END)""".stripMargin).as("got"),
        col("want"))
      .collect()
    got.foreach { r =>
      assert(r.getSeq[String](0) === r.getSeq[String](1))
    }
  }

  test("checkpointTracked's release actually unpersists the checkpoint blocks") {
    // ADVICE r11: the LogicalRDD match must FIRE on this Spark version —
    // if a future version wraps the post-checkpoint plan, release degrades
    // to a no-op and the fixed-point loops silently re-accumulate storage.
    import spark.implicits._
    val (out, release) = Differential.checkpointTracked(
      Seq(1L, 2L, 3L).toDF("x"))
    val rdd = out.queryExecution.logical match {
      case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd
      case other => fail(s"post-checkpoint plan is not a bare LogicalRDD: $other")
    }
    assert(out.count() === 3L)
    assert(rdd.getStorageLevel !== org.apache.spark.storage.StorageLevel.NONE,
      "checkpoint RDD should be persisted before release")
    release()
    assert(rdd.getStorageLevel === org.apache.spark.storage.StorageLevel.NONE,
      "release() must unpersist the checkpoint RDD — the no-op branch fired")
  }
}
