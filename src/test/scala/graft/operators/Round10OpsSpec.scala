package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.core.TestSpark

/** Round-10 surface: t21 BPE token-id sequences and t22 trained-tokenizer
  * packing, each pinned against an INDEPENDENT driver-side reference (the
  * classic min-rank-pair encoder + a from-scratch id assignment / cumsum),
  * not against the Spark plans they share code with.
  */
class Round10OpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  /** Independent min-rank-pair encoder (subword-nmt's apply_bpe) — same
    * reference as Round9OpsSpec's t20 check. */
  private def encodeRef(word: String, ranks: Map[(String, String), Int]): Vector[String] = {
    var syms = word.map(_.toString).toVector
    var done = false
    while (!done && syms.length >= 2) {
      val best = syms.zip(syms.tail).filter(ranks.contains).sortBy(ranks).headOption
      best match {
        case None => done = true
        case Some((l, r)) =>
          val b = Vector.newBuilder[String]
          var i = 0
          while (i < syms.length) {
            if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
              b += (l + r); i += 2
            } else { b += syms(i); i += 1 }
          }
          syms = b.result()
      }
    }
    syms
  }

  /** Driver-side replica of the portable 60-bit hash (15 md5 hex digits). */
  private def hash60(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.substring(0, 15), 16)
  }

  /** UTF-8 byte order — the engines' shared string collation. */
  private def utf8Order(a: String, b: String): Boolean = {
    val (x, y) = (a.getBytes("UTF-8"), b.getBytes("UTF-8"))
    val n = math.min(x.length, y.length)
    var i = 0
    while (i < n) {
      val c = (x(i) & 0xff) - (y(i) & 0xff)
      if (c != 0) return c < 0
      i += 1
    }
    x.length < y.length
  }

  test("t21 id sequences match an independent encoder + from-scratch id assignment") {
    val merges = TextOps.queries("t19_bpe_train")(spark, sf).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getString(3)))
    val ranks = merges.map(m => (m._2, m._3) -> m._1).toMap
    val docs = graft.Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    // independent vocabulary ids: sorted base alphabet, then merge ranks;
    // duplicate surface strings resolve to the smallest id
    val alphabet = docs.flatMap(_._2.trim.split("\\s+")).filter(_.nonEmpty)
      .flatMap(_.map(_.toString)).distinct.sortWith(utf8Order)
    val ids = scala.collection.mutable.Map[String, Long]()
    alphabet.zipWithIndex.foreach { case (c, i) => ids(c) = i.toLong }
    merges.foreach { m =>
      val sym = m._4
      val id = alphabet.length.toLong + m._1 - 1
      if (!ids.contains(sym)) ids(sym) = id
    }
    val want = docs.flatMap { case (docId, text) =>
      val words = text.trim.split("\\s+").filter(_.nonEmpty)
      if (words.isEmpty) None
      else {
        val seq = words.toSeq.flatMap(w => encodeRef(w, ranks)).map(ids)
        Some((docId, seq.length.toLong, seq.head, seq.last,
          hash60(seq.mkString(","))))
      }
    }.sortBy(_._1).toSeq
    val got = TextOps.queries("t21_bpe_ids")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSeq
    assert(got === want)
  }

  test("t21 sequence lengths agree with t20's token accounting") {
    val t20 = TextOps.queries("t20_bpe_encode")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSeq
    val t21 = TextOps.queries("t21_bpe_ids")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(t21 === t20)
  }

  test("t22 packs exactly the sharded cumsum of t20's BPE counts") {
    val counts = TextOps.queries("t20_bpe_encode")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(2)))
    // independent driver-side pack: shard hash, per-shard doc_id-ordered
    // running sum, window arithmetic
    val want = counts
      .map { case (doc, n) => (doc, (hash60(s"pack:$doc") % 16).toInt, n) }
      .groupBy(_._2).toSeq
      .flatMap { case (_, rows) =>
        var cum = 0L
        rows.sortBy(_._1).map { case (doc, shard, n) =>
          val start = cum
          cum += n
          (doc, shard, n, (start / 256).toInt, (start % 256).toInt)
        }
      }
      .sortBy(_._1)
    val got = TextOps.queries("t22_pack_bpe")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getInt(3), r.getInt(4)))
      .toSeq
    assert(got === want)
  }
}
