package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.core.TestSpark

/** Behavior specs for the round-9 fixes. The headline check pins t19's
  * exact-symbol merge semantics on a corpus DESIGNED to alias a naive
  * substring rewrite: picks (q,w) then (w,e) with the word "qwe" present.
  * After merge 1 the word "qwe" is [qw, e]; exact BPE (the reference
  * trainer, our driver loop) does NOT apply merge 2 there — symbol "qw" is
  * not "w" — but a literal replace of "w<SEP>e" matches INSIDE
  * "qw<SEP>e" and corrupts it to [qwe], killing the round-3 (qw, e) merge
  * entirely. Both engine modes and the boundary-doubled rewrite must agree
  * with the hand-computed exact table.
  */
class Round9OpsSpec extends AnyFunSuite {
  private lazy val spark: SparkSession = TestSpark.spark

  /** Stage a tiny documents table whose word frequencies force the
    * aliasing-prone merge chain: qw x10, we x6, qwe x3.
    *   round 1: (q,w)=13 beats (w,e)=9  -> merge (q,w)
    *   round 2: (w,e)=6 beats (qw,e)=3  -> merge (w,e)   [the alias trap]
    *   round 3: (qw,e)=3                -> merge (qw,e)
    * A substring-aliased rewrite loses round 3 (the corrupted [qwe] has no
    * pairs left), so the table SIZE differs, not just its values.
    */
  private lazy val chainDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("bpe_chain").toString
    val text = (Seq.fill(10)("qw") ++ Seq.fill(6)("we") ++ Seq.fill(3)("qwe")).mkString(" ")
    spark.range(1).select(
        col("id").as("doc_id"), lit(text).as("text"),
        lit("en").as("lang"), lit("synth").as("source"),
        lit(text.length.toLong).as("n_chars"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  private val expectedChain = Seq(
    (1, "q", "w", "qw", 13L),
    (2, "w", "e", "we", 6L),
    (3, "qw", "e", "qwe", 3L))

  private def runT19(dir: String): Seq[(Int, String, String, String, Long)] =
    TextOps.queries("t19_bpe_train")(spark, dir)
      .collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getString(3), r.getLong(4)))
      .toSeq

  test("t19 exact-symbol merges: chained picks do not alias substring boundaries (driver mode)") {
    val floorKey = "graft.bpe.driverFloorVocab"
    val prev = sys.props.get(floorKey)
    sys.props(floorKey) = Long.MaxValue.toString
    ArtifactCache.invalidate(spark, chainDir)
    try assert(runT19(chainDir) === expectedChain)
    finally {
      prev match {
        case Some(v) => sys.props(floorKey) = v
        case None => sys.props.remove(floorKey)
      }
      ArtifactCache.invalidate(spark, chainDir)
    }
  }

  test("t19 exact-symbol merges: chained picks do not alias substring boundaries (distributed mode)") {
    val floorKey = "graft.bpe.driverFloorVocab"
    val prev = sys.props.get(floorKey)
    sys.props(floorKey) = "0" // force the distributed rounds
    ArtifactCache.invalidate(spark, chainDir)
    try assert(runT19(chainDir) === expectedChain)
    finally {
      prev match {
        case Some(v) => sys.props(floorKey) = v
        case None => sys.props.remove(floorKey)
      }
      ArtifactCache.invalidate(spark, chainDir)
    }
  }

  test("brute-force baseline refuses corpora beyond the declared driver-collect ceiling") {
    val key = "graft.brute.maxRows"
    val prev = sys.props.get(key)
    sys.props(key) = "3" // tiny ceiling so the sf fixture trips it
    try {
      val e = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
        .select(col("vec_id"), expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("v"))
      val ex = intercept[IllegalArgumentException] {
        BruteForce.cosinePairs(e, 0.38).collect()
      }
      assert(ex.getMessage.contains("d8_embed_lsh_dedup"),
        s"guard must name the scale path: ${ex.getMessage}")
    } finally {
      prev match {
        case Some(v) => sys.props(key) = v
        case None => sys.props.remove(key)
      }
    }
  }
}
