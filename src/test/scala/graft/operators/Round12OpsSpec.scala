package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.core.TestSpark

/** Round-12 additions: t24 incremental pack append (the standing layout
  * never re-derives when a batch lands) and the explicit zero-token guard
  * in the pack-tensor assembly. References are driver-side first-principles
  * re-packs, independent of the engine's window/append machinery; the
  * DuckDB oracle checks the same append==re-pack contract cross-engine.
  */
class Round12OpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"
  private val P = TextOps.PackSize

  test("t24 append equals a full re-pack with the batch appended per shard") {
    val got = TextOps.queries("t24_pack_append")(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Int]("shard"), r.getAs[Int]("n_tokens"),
          r.getAs[Int]("pack_id"), r.getAs[Int]("pack_offset"))).toMap
    assert(got.nonEmpty)
    // driver-side reference: concatenate each shard's stream in
    // (is_new, doc_id) order and read off the new docs' positions
    val all = TextOps.queries("t13_pack")(spark, sf).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Int]("shard"), r.getAs[Int]("n_tokens")))
    val ref = all.groupBy(_._2).iterator.flatMap { case (shard, rows) =>
      var cum = 0L
      rows.sortBy(r => (r._1 % 5 == 4, r._1)).map { case (id, _, n) =>
        val g = cum; cum += n
        id -> (shard, n, (g / P).toInt, (g % P).toInt)
      }
    }.filter(_._1 % 5 == 4).toMap
    assert(got === ref)
  }

  test("packAppend starts shards absent from the standing layout at zero") {
    import spark.implicits._
    // standing layout occupies only the shards its docs hash into; a batch
    // doc landing in a fresh shard must start at (pack 0, offset 0)
    val standing = Seq.empty[(Long, Int, Int, Int, Int)]
      .toDF("doc_id", "shard", "n_tokens", "pack_id", "pack_offset")
    val batch = Seq((7L, 5), (11L, 3)).toDF("doc_id", "n_tokens")
    val out = TextOps.packAppend(spark, standing, batch, P, TextOps.PackShards)
      .collect().map(r => r.getLong(0) -> (r.getInt(3), r.getInt(4))).toMap
    // both docs are firsts of their (possibly shared) shard streams
    assert(out.keySet === Set(7L, 11L))
    assert(out.values.forall { case (packId, _) => packId === 0 })
  }

  test("assemblePacks drops zero-token docs instead of fabricating pieces") {
    import spark.implicits._
    val layout = Seq(
      (1L, 0, 3, 0, 0),  // doc 1: 3 tokens at stream position 0
      (2L, 0, 0, 0, 3),  // doc 2: ZERO tokens — must contribute nothing
      (3L, 0, 2, 0, 3)   // doc 3: 2 tokens at stream position 3
    ).toDF("doc_id", "shard", "n_tokens", "pack_id", "pack_offset")
    val seqs = Seq(
      (1L, Seq(10L, 11L, 12L)), (2L, Seq.empty[Long]), (3L, Seq(30L, 31L)))
      .toDF("doc_id", "ids")
    val packs = TextOps.assemblePacks(layout, seqs, P).collect()
    assert(packs.length === 1)
    val r = packs.head
    assert(r.getAs[Long]("n_docs") === 2L) // doc 2 contributes no piece
    assert(r.getSeq[Long](3) === Seq(10L, 11L, 12L, 30L, 31L))
  }
}
