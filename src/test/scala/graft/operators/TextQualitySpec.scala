package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.core.TestSpark

/** Independent driver-side re-derivations for the repetition / TF-IDF /
  * KMV-sketch operators (their VALUES are DuckDB-oracled; this pins the
  * semantics against a from-scratch Scala implementation so a refactor
  * can't drift both engine twins together).
  */
class TextQualitySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sfDir = "/root/testdata/sf0.01"

  private lazy val docs: Map[Long, String] =
    spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap

  test("t8 repetition signals match a from-scratch re-derivation") {
    val got = TextOps.queries("t8_gopher_repetition")(spark, sfDir).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Int]("n_tokens"), r.getAs[Long]("dup_word_frac_fp"),
          r.getAs[String]("top_bigram"), r.getAs[Long]("top_bigram_n"))).toMap
    assert(got.size == docs.count(_._2.trim.split("\\s+").length >= 2))
    for ((id, text) <- docs.take(50)) {
      val toks = text.trim.split("\\s+").toSeq
      if (toks.length >= 2) {
        val bigrams = toks.sliding(2).map(_.mkString(" ")).toSeq
        val (topBg, topN) = bigrams.groupBy(identity).view.mapValues(_.size)
          .toSeq.minBy { case (bg, n) => (-n, bg) }
        val (nTok, dupR, gBg, gN) = got(id)
        assert(nTok == toks.length, s"doc $id token count")
        val expDup = (toks.length - toks.distinct.length).toDouble / toks.length
        assert(dupR == math.floor(expDup * 1000000).toLong, s"doc $id dup_word_frac")
        assert(gBg == topBg && gN == topN.toLong, s"doc $id top bigram")
      }
    }
  }

  test("t9 TF-IDF top terms match a from-scratch inverted index") {
    val tokenized = docs.view.mapValues(_.trim.split("\\s+").toSeq).toMap
    val df = tokenized.values.flatMap(_.distinct).groupBy(identity).view.mapValues(_.size)
    val n = docs.size.toDouble
    val got = TextOps.queries("t9_tfidf")(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Int]("rk")) ->
        (r.getAs[String]("tok"), r.getAs[Long]("tfidf_fp")))
      .toMap
    assert(got.size == docs.size * 3)
    for ((id, toks) <- tokenized.take(30)) {
      val scored = toks.groupBy(identity).view.mapValues(_.size).toSeq
        .map { case (t, tf) => (t, tf * math.log(n / df(t))) }
        .sortBy { case (t, sc) => (-sc, t) }.take(3)
      scored.zipWithIndex.foreach { case ((tok, sc), i) =>
        val (gTok, gSc) = got((id, i + 1))
        assert(gTok == tok, s"doc $id rank ${i + 1} term")
        assert(math.abs(gSc - math.floor(sc * 1000000).toLong) <= 1,
          s"doc $id rank ${i + 1} score")
      }
    }
  }

  test("a10 grouped KMV estimates land within the per-group error band") {
    val rows = AnalyticOps.queries("a10_grouped_kmv")(spark, sfDir).collect()
    assert(rows.length == 3, "one sketch per returnflag")
    rows.foreach { r =>
      val k = r.getAs[Long]("k")
      val trueN = r.getAs[Long]("true_n")
      val est = r.getAs[Double]("est_n")
      if (k < 256L) assert(est == k.toDouble, s"unfull sketch must report its exact count")
      val rel = math.abs(est - trueN) / trueN.toDouble
      assert(rel < 0.3, s"flag ${r.getString(0)}: off by ${rel * 100}%% (est=$est true=$trueN)")
    }
  }

  test("a9 KMV estimate lands within the sketch's expected error band") {
    val row = AnalyticOps.queries("a9_kmv_distinct")(spark, sfDir).collect().head
    val k = row.getAs[Long]("k")
    val trueN = row.getAs[Long]("true_n")
    val est = row.getAs[Double]("est_n")
    assert(k == 256L, "sketch must be full at this SF")
    // KMV standard error is ~1/sqrt(k-2) ~ 6.3%; allow 4 sigma
    val rel = math.abs(est - trueN) / trueN.toDouble
    assert(rel < 0.25, s"KMV estimate off by ${rel * 100}%% (est=$est true=$trueN)")
  }

  test("t16 redactPii scrubs crafted PII exactly and leaves clean text alone") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val cases = Seq(
      ("write to jane.doe+spam@sub.example.co.uk today",
        "write to <EMAIL> today"),
      ("ring +1-555-0199 or +1-555-1234 now", "ring <PHONE> or <PHONE> now"),
      ("node 10.0.42.7 peered with 10.255.1.200", "node <IP> peered with <IP>"),
      ("mixed a@b.io +1-555-0000 10.1.2.3", "mixed <EMAIL> <PHONE> <IP>"),
      // near-misses that must NOT be redacted: bare domain (no @), a
      // non-555 number, a non-10. address
      ("see example.com call +1-556-9999 at 192.168.0.1",
        "see example.com call +1-556-9999 at 192.168.0.1"))
    val got = cases.map(_._1).toDF("t")
      .select(TextOps.redactPii(col("t")).as("r")).as[String].collect()
    cases.zip(got).foreach { case ((in, want), have) =>
      assert(have == want, s"redaction of '$in'")
    }
  }
}
