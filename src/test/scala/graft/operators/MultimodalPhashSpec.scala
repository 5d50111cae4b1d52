package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.core.TestSpark

/** m6's perceptual contract on an ENGINEERED corpus: identical content at
  * three scales and two codecs fingerprints identically (the invariance a
  * perceptual hash exists to provide), a one-character edit lands within
  * the hamming threshold (near-miss pair), and unrelated content falls
  * outside it. The corpus-level oracle gate checks fingerprint arithmetic
  * cross-engine; this spec checks the perceptual SEMANTICS on pairs whose
  * ground truth is known by construction.
  */
class MultimodalPhashSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  // The canonical image is exactly the first 288 text bytes (18x16), so a
  // 288-char text IS the image and cell sums are controllable per 2x2
  // block: base decreases across the grid (every adjacent comparison TRUE,
  // all 64 bits set), near raises ONE cell enough to invert exactly one
  // comparison (deterministic hamming 1), far increases across the grid
  // (every comparison FALSE, hamming 64). All bytes printable ASCII.
  private def cellText(f: (Int, Int) => Int): String =
    (0 until 288).map { j => f((j % 18) / 2, (j / 18) / 2).toChar }.mkString
  private val baseText = cellText((gx, _) => 100 - gx * 5)
  private val nearText = (0 until 288).map { j =>
    if ((j % 18) / 2 == 3 && (j / 18) / 2 == 0) 120.toChar else baseText(j)
  }.mkString
  private val farText = cellText((gx, _) => 60 + gx * 5)

  private lazy val dir: String = {
    import spark.implicits._
    val out = java.nio.file.Files.createTempDirectory("phash_docs").toString
    val rows = Seq(
      (0L, baseText), (1L, baseText), (2L, baseText), // scales 1, 2, 3; bmp/png/bmp
      (10L, nearText), (20L, farText))
      .map { case (id, t) => (id, t, "en", "src1", t.length.toLong) }
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.parquet(s"$out/documents.parquet")
    out
  }

  test("identical content at three scales and two codecs hashes identically") {
    val fps = Multimodal.imageDhash(Multimodal.scaledMediaTable(spark, dir))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fps.keySet === Set(0L, 1L, 2L, 10L, 20L))
    assert(fps(0L) === fps(1L), "scale 1 (BMP) vs scale 2 (PNG) drifted")
    assert(fps(0L) === fps(2L), "scale 1 vs scale 3 drifted")
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(fps(0L) === -1L, "all-decreasing cells must set all 64 bits")
    assert(ham(fps(0L), fps(10L)) === 1, "one-cell raise must flip exactly one bit")
    assert(ham(fps(0L), fps(20L)) === 64, "all-increasing cells must clear every bit")
  }

  test("m6 pairs exactly the near-dups: dup trio at hamming 0, edit above 0") {
    val pairs = Multimodal.queries("m6_phash_pairs")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    val trio = Set((0L, 1L), (0L, 2L), (1L, 2L))
    trio.foreach { p => assert(pairs.get(p).contains(0), s"$p should pair at 0") }
    // hamming 1 leaves 3 of 4 bands unchanged — the near doc MUST pair
    // with all three base copies
    Seq((0L, 10L), (1L, 10L), (2L, 10L)).foreach { p =>
      assert(pairs.get(p).contains(1), s"$p should pair at hamming 1")
    }
    assert(!pairs.keys.exists(p => p._1 == 20L || p._2 == 20L),
      "unrelated content must not pair")
  }
}
