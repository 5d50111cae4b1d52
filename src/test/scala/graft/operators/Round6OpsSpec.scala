package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.core.TestSpark

/** Behavior specs for the round-6 additions (t17 per-source cap, t18 BM25,
  * d12 incremental dedup): each result is re-derived independently
  * driver-side from the raw tables (or from an already-oracled sibling
  * query) and compared exactly — the DuckDB gate checks cross-engine
  * parity, these specs check the semantics against a second, simpler
  * implementation.
  */
class Round6OpsSpec extends AnyFunSuite {
  private lazy val spark: SparkSession = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("t17 keeps exactly the per-source top-10 by (n_chars desc, doc_id)") {
    val got = TextOps.queries("t17_source_cap")(spark, sf)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getLong(3)))
    val docs = graft.Tables.documents(spark, sf)
      .select("source", "doc_id", "n_chars")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val expected = docs.groupBy(_._1).toSeq.sortBy(_._1).flatMap { case (src, rows) =>
      rows.sortBy(r => (-r._3, r._2)).take(10).zipWithIndex
        .map { case (r, i) => (src, i + 1, r._2, r._3) }
    }
    assert(got.toSeq === expected)
    val perSource = got.groupBy(_._1).values.map(_.length)
    assert(perSource.forall(_ <= 10))
  }

  test("t18 matches a driver-side BM25 re-derivation for every term") {
    val k1 = 1.2; val b = 0.75
    val terms = Seq("spark", "merge", "customer", "hash")
    val got = TextOps.queries("t18_bm25")(spark, sf)
      .collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5)))
    // replicate Spark's SPACE-only trim (String.trim also strips tabs/CR/LF,
    // which Spark's trim keeps — a doc with leading non-space whitespace
    // would otherwise give this re-derivation a different dl)
    val docs = graft.Tables.documents(spark, sf).select("doc_id", "text")
      .collect().map { r =>
        val sparkTrimmed = r.getString(1).dropWhile(_ == ' ').reverse.dropWhile(_ == ' ').reverse
        (r.getLong(0), sparkTrimmed.split("\\s+").toSeq)
      }
    val n = docs.length.toLong
    val avgdl = docs.map(_._2.length.toLong).sum.toDouble / n
    val expected = terms.sorted.flatMap { term =>
      val hits = docs.flatMap { case (id, toks) =>
        val tf = toks.count(_ == term)
        if (tf == 0) None else Some((id, tf.toLong, toks.length.toLong))
      }
      val df = hits.length.toLong
      val idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
      // rank by the RAW score (then doc_id), exactly as the query does —
      // sorting by the rounded score could flip two docs whose raw scores
      // differ but round equal; round only for the final comparison
      hits.map { case (id, tf, dl) =>
        val score = idf * (tf * (k1 + 1)) / (tf + k1 * (1 - b + b * dl / avgdl))
        (term, id, tf, dl, score)
      }.sortBy(h => (-h._5, h._2)).take(5).zipWithIndex
        .map { case (h, i) => (h._1, i + 1, h._2, h._3, h._4,
          math.floor(h._5 * 1000000).toLong) }
    }
    assert(got.toSeq === expected)
  }

  test("d12's best-match agrees with an orientation of the oracled d3 pairs") {
    val estByPair = Dedup.queries("d3_minhash_pairs")(spark, sf)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    val mixed = estByPair.toSeq.collect {
      case ((a, b), est) if (a % 5 == 4) != (b % 5 == 4) =>
        if (a % 5 == 4) (a, b, est) else (b, a, est)
    }
    val expected = mixed.groupBy(_._1).map { case (dn, rows) =>
      val bestEst = rows.map(_._3).max
      val bestOld = rows.filter(_._3 == bestEst).map(_._2).min
      dn -> (rows.length.toLong, bestOld, bestEst)
    }
    val got = Dedup.queries("d12_incremental")(spark, sf).collect()
    got.foreach { r =>
      val dn = r.getLong(0)
      assert(dn % 5 === 4) // only new-batch docs appear
      if (r.getLong(1) == 0L) {
        assert(!expected.contains(dn))
        assert(r.isNullAt(2) && r.isNullAt(3) && r.getInt(4) === 0)
      } else {
        val (nc, bo, be) = expected(dn)
        assert(r.getLong(1) === nc)
        assert(r.getLong(2) === bo)
        assert(r.getDouble(3) === be)
        assert(r.getInt(4) === (if (be >= 0.7) 1 else 0))
      }
    }
    // every new-batch doc surfaces exactly once
    val newDocs = graft.Tables.documents(spark, sf)
      .where("doc_id % 5 = 4").count()
    assert(got.length.toLong === newDocs)
  }
}
