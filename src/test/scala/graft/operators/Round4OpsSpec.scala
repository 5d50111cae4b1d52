package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.core.TestSpark

/** Behavior specs for the round-4 additions (the DuckDB hash gate pins
  * exact values; these pin the SEMANTIC claims each operator makes).
  */
class Round4OpsSpec extends AnyFunSuite {
  private lazy val spark: SparkSession = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("j10 bloom pruning never drops a true match (no false negatives)") {
    val r = AnalyticOps.queries("j10_bloom_prune")(spark, sf).collect()(0)
    val (nCand, nTrue, nFp) =
      (r.getAs[Long]("n_cand"), r.getAs[Long]("n_true"), r.getAs[Long]("n_false_pos"))
    // every true row must be a candidate: candidates decompose exactly into
    // true matches + false positives only when no true match was pruned
    assert(nCand === nTrue + nFp)
    assert(nTrue > 0)
  }

  test("a12 HLL estimate lands near the exact distinct count") {
    val rows = AnalyticOps.queries("a12_hll_distinct")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("buckets_used") <= 256)
      assert(r.getAs[Double]("est_n") > 0.0)
      // raw HLL (no small-range correction) at these cardinalities: keep a
      // generous pin — the point is "right order, deterministic", and the
      // exact value is already hash-checked by the oracle
      assert(math.abs(r.getAs[Double]("err_pct")) < 35.0,
        s"err ${r.getAs[Double]("err_pct")}% for ${r.getAs[String]("flag")}")
    }
  }

  test("s6 MMR picks distinct candidates and starts from the relevance argmax") {
    val sel = Similarity.queries("s6_mmr_rerank")(spark, sf).collect()
      .map(r => (r.getAs[Long]("qid"), r.getAs[Int]("step"), r.getAs[Long]("cid")))
    val s1 = Similarity.queries("s1_cosine_topk")(spark, sf).collect()
      .filter(_.getAs[Int]("rk") == 1)
      .map(r => r.getAs[Long]("qid") -> r.getAs[Long]("cid")).toMap
    val byQid = sel.groupBy(_._1)
    assert(byQid.nonEmpty)
    byQid.foreach { case (qid, picks) =>
      assert(picks.length === 3)
      assert(picks.map(_._3).distinct.length === 3, s"duplicate picks for qid $qid")
      // step 1 has no diversity penalty -> must equal the plain top-1
      assert(picks.find(_._2 == 1).get._3 === s1(qid))
    }
  }

  test("s6 MMR selection is no less diverse than the plain top-3") {
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      dot / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    val vecs = spark.read.parquet(s"$sf/embeddings.parquet")
      .select(col("vec_id"), expr("transform(embedding, x -> CAST(x AS DOUBLE))"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    def maxIntraSim(ids: Seq[Long]): Double =
      ids.combinations(2).map { case Seq(a, b) => cos(vecs(a), vecs(b)) }.max
    val mmr = Similarity.queries("s6_mmr_rerank")(spark, sf).collect()
      .groupBy(_.getAs[Long]("qid"))
      .map { case (q, rs) => q -> rs.map(_.getAs[Long]("cid")).toSeq }
    val top3 = Similarity.queries("s1_cosine_topk")(spark, sf).collect()
      .filter(_.getAs[Int]("rk") <= 3)
      .groupBy(_.getAs[Long]("qid"))
      .map { case (q, rs) => q -> rs.map(_.getAs[Long]("cid")).toSeq }
    mmr.foreach { case (qid, ids) =>
      assert(maxIntraSim(ids) <= maxIntraSim(top3(qid)) + 1e-12,
        s"qid $qid: MMR set less diverse than plain top-3")
    }
  }

  test("d10 flags exactly the train docs sharing an 8-token shingle with the eval set") {
    val flagged = Dedup.queries("d10_decontaminate")(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_shared")).toMap
    // independent recomputation in plain Scala on the tiny sf
    def shingles(text: String): Set[String] = {
      val toks = text.toLowerCase.replaceAll("\\s+", " ").split(" ", -1)
      if (toks.length <= 8) Set(toks.mkString(" "))
      else toks.sliding(8).map(_.mkString(" ")).toSet
    }
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> shingles(r.getString(1)))
    val evalSh = docs.filter(_._1 % 100 == 0).flatMap(_._2).toSet
    val expected = docs.filter(_._1 % 100 != 0)
      .map { case (id, sh) => id -> sh.count(evalSh.contains).toLong }
      .filter(_._2 > 0).toMap
    assert(flagged === expected)
    assert(flagged.keys.forall(_ % 100 != 0))
  }

  test("st4 keeps the event-time-first event per (user, type)") {
    val kept = StreamingOps.queries("st4_stream_dedup")(spark, sf).collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[String]("event_type")) ->
        r.getAs[Long]("first_event_id")).toMap
    val expected = graft.Tables.events(spark, sf)
      .groupBy("user_id", "event_type")
      .agg(min(struct(col("ts"), col("event_id"))).as("m"))
      .select(col("user_id"), col("event_type"), col("m.event_id"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(kept === expected)
  }

  test("a11 outlier counts are consistent with the gate definition") {
    val rows = AnalyticOps.queries("a11_zscore_outliers")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, hi, lo) =
        (r.getAs[Long]("n"), r.getAs[Long]("n_hi"), r.getAs[Long]("n_lo"))
      assert(r.getAs[Long]("std_fp") > 0L)
      // a |z|>2 gate can flag at most 25% of any distribution (Chebyshev)
      assert(hi + lo <= n / 4)
    }
  }

  test("n1 fixed-point PageRank ranks supplier hubs above customers and conserves mass") {
    val rows = GraphOps.queries("n1_pagerank")(spark, sf).collect()
    assert(rows.length === 20)
    // suppliers aggregate many customers' rank in a bipartite transaction
    // graph — the top node must be a supplier hub
    assert(rows.head.getAs[String]("node").startsWith("s:"))
    // fixed-point ranks are positive and bounded by the scaled total mass
    rows.foreach { r =>
      val fp = r.getAs[Long]("rank_fp")
      assert(fp > 0 && fp < 1000000000000L)
    }
    // deterministic: a second evaluation is bit-identical
    val again = GraphOps.queries("n1_pagerank")(spark, sf).collect()
    assert(rows.map(_.toString).toSeq === again.map(_.toString).toSeq)
  }

  test("c2 keeps exactly one canonical per component — the best-quality member") {
    val rows = CurationOps.queries("c2_canonical_keep")(spark, sf).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("component"),
        r.getAs[Long]("quality_fp"), r.getAs[Boolean]("canonical")))
    assert(rows.nonEmpty)
    val byComp = rows.groupBy(_._2)
    byComp.foreach { case (comp, members) =>
      val canon = members.filter(_._4)
      assert(canon.length === 1, s"component $comp has ${canon.length} canonicals")
      // the canonical is the quality argmax (doc_id tiebreak)
      val best = members.maxBy(m => (m._3, -m._1))
      assert(canon.head._1 === best._1, s"component $comp kept ${canon.head._1}, best is ${best._1}")
    }
    // canonical choice differs from d9's min-id keeper whenever a later
    // member scores higher — in every case the canonical's quality is >=
    // the min-id member's
    val minId = byComp.map { case (c, ms) => c -> ms.minBy(_._1) }
    byComp.foreach { case (c, ms) =>
      assert(ms.filter(_._4).head._3 >= minId(c)._3)
    }
  }

  test("t11 temperature sampling keeps all of the rarest language and a sqrt share of the head") {
    val kept = TextOps.queries("t11_temp_sample")(spark, sf).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("lang"),
        r.getAs[Long]("n_docs"), r.getAs[Long]("rate_ppm")))
    assert(kept.nonEmpty)
    val byLang = kept.groupBy(_._2)
    val minN = kept.map(_._3).min
    byLang.foreach { case (lang, ms) =>
      val nDocs = ms.head._3
      val ppm = ms.head._4
      assert(ppm === math.floor(math.sqrt(minN.toDouble / nDocs) * 1000000).toLong)
      // the rarest language keeps everything
      if (nDocs == minN) assert(ms.length.toLong === nDocs, s"$lang under-sampled")
      // nothing is over-kept
      assert(ms.length <= nDocs)
    }
    // head languages are actually thinned (rate < 1) whenever skew exists
    val maxN = kept.map(_._3).max
    if (maxN > minN)
      assert(byLang.values.exists(ms => ms.length < ms.head._3))
  }

  test("s7 IVF-PQ residual coding beats plain PQ's ADC error at equal compression") {
    val s7 = Similarity.queries("s7_ivfpq_ann")(spark, sf).collect()
    assert(s7.nonEmpty)
    // per-row sanity: approx and exact cosines are in range, error is their gap
    s7.foreach { r =>
      val (apx, exact, err) = (r.getAs[Double]("ivfpq_cos_r"),
        r.getAs[Double]("cos_r"), r.getAs[Double]("abs_err_r"))
      assert(apx >= -1.01 && apx <= 1.01)
      assert(math.abs(math.abs(apx - exact) - err) < 2e-6)
    }
    // the residual claim (Jegou et al. 2011 §IV): residuals concentrate near
    // zero, so 4x16 codebooks reconstruct v = c_home + r-hat better than the
    // same codebooks on raw vectors. Compare mean |approx cos - exact cos|
    // against s5 over each query surface's top-3. NOTE this is a STATISTICAL
    // property pinned against THIS fixture — Jegou et al. establish it in
    // expectation, not per-dataset, so a regenerated corpus could
    // legitimately flip a razor-thin comparison. The 5% tolerance band keeps
    // fixture churn from producing a spurious failure while still catching a
    // broken residual path (which degrades error by integer factors).
    val s5 = Similarity.queries("s5_pq_adc")(spark, sf).collect()
    def meanErr(rows: Array[org.apache.spark.sql.Row]) =
      rows.map(_.getAs[Double]("abs_err_r")).sum / rows.length
    assert(meanErr(s7) <= meanErr(s5) * 1.05 + 1e-9,
      s"residual ADC err ${meanErr(s7)} worse than plain PQ ${meanErr(s5)}")
  }

  test("t13 packing: per-shard token streams are gapless and pack-bounded") {
    val rows = TextOps.queries("t13_pack")(spark, sf).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Int]("shard"),
        r.getAs[Int]("n_tokens"), r.getAs[Int]("pack_id"), r.getAs[Int]("pack_offset")))
    assert(rows.nonEmpty)
    rows.groupBy(_._2).foreach { case (shard, docs) =>
      val ordered = docs.sortBy(_._1)
      var cum = 0L
      ordered.foreach { case (id, _, n, packId, off) =>
        // doc starts exactly where the shard's token stream stands: the
        // concat-then-split layout has no gaps and no overlaps
        assert(packId === (cum / 256).toInt, s"doc $id in shard $shard")
        assert(off === (cum % 256).toInt, s"doc $id in shard $shard")
        cum += n
      }
    }
  }

  test("n2 weighted ranks are deterministic and weight-sensitive") {
    val n2 = GraphOps.queries("n2_weighted_pagerank")(spark, sf).collect()
      .map(r => (r.getAs[String]("node"), r.getAs[Long]("rank_fp")))
    assert(n2.length === 20)
    n2.foreach { case (_, fp) => assert(fp > 0 && fp < 1000000000000L) }
    val again = GraphOps.queries("n2_weighted_pagerank")(spark, sf).collect()
      .map(r => (r.getAs[String]("node"), r.getAs[Long]("rank_fp")))
    assert(n2.toSeq === again.toSeq)
    // revenue weighting must actually change the rank vector vs n1's
    // uniform-weight fixed point (same damping, same iterations)
    val n1 = GraphOps.queries("n1_pagerank")(spark, sf).collect()
      .map(r => (r.getAs[String]("node"), r.getAs[Long]("rank_fp")))
    assert(n1.toSeq !== n2.toSeq, "weights had no effect on the top-20 ranks")
  }

  test("ArtifactCache memoizes per (session, dir) and invalidate forces a rebuild") {
    var builds = 0
    def build = { builds += 1; spark.range(3).toDF("x") }
    val a = ArtifactCache.getOrElseUpdate("spec.probe", spark, "/tmp/spec-a")(build)
    val b = ArtifactCache.getOrElseUpdate("spec.probe", spark, "/tmp/spec-a")(build)
    assert(builds === 1)
    assert(a eq b)
    ArtifactCache.invalidate(spark, "/tmp/spec-a")
    ArtifactCache.getOrElseUpdate("spec.probe", spark, "/tmp/spec-a")(build)
    assert(builds === 2)
    ArtifactCache.invalidate(spark, "/tmp/spec-a")
  }
}
