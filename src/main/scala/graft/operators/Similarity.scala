package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Similarity search over the embedding column (training-data surface):
  *
  *  - s1: brute-force cosine top-k — the exactness baseline. Queries are a
  *    tiny broadcast side; the corpus scans once; TakeOrdered-style window
  *    rank bounds the output. At 100 TB this is the "small query batch x
  *    huge corpus" shape: one corpus scan per batch, no corpus shuffle.
  *  - s2: multi-table LSH ANN — the standard (L, k) construction: L=4
  *    independent tables keyed by k=4 hyperplane sign bits (planes drawn
  *    from the data itself — embeddings of fixed vec_ids — so both engines
  *    derive identical planes without a shared RNG). Candidates = shared
  *    key in ANY table; the join key is (table, key), which is the scale
  *    path (corpus shuffles once on it; candidate dedup on scalar pairs
  *    before the vector rejoin). Single-table sign-LSH has near-zero
  *    recall at moderate cosine — SimilaritySpec pins both recall and
  *    strong-pair key coverage.
  *
  * Cosines are computed with sequential higher-order-function folds (same
  * index order as DuckDB's list functions) so results are bit-deterministic.
  */
object Similarity {

  private val TopK = 10
  // multi-table LSH parameterization — shared with Dedup.d8 (same planes,
  // same keys), so retuning here keeps both operators and their oracles
  // in sync
  private[operators] val LshTables = 4
  private[operators] val LshTableBits = 4

  private def vecsD(s: SparkSession, d: String): DataFrame = {
    graft.functions.VectorFunctions.register(s)
    Tables.embeddings(s, d)
      .select(col("vec_id"), col("label"),
        expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("v"))
      .withColumn("nrm", sqrt(expr("graft_dot(v, v)")))
  }

  /** cos(a,b) = dot/(sqrt(aa)*sqrt(bb)) — codegen'd dot, precomputed norms;
    * arithmetic identical to DuckDB's list_cosine_similarity.
    */
  private val cosCol = expr("graft_dot(ad, bd)") / (col("na") * col("nb"))

  // ---------------------------------------------------------------------------
  // s1 — brute-force cosine top-k for a fixed query batch (vec_id < 5).
  private def s1CosineTopK(s: SparkSession, d: String): DataFrame = {
    val e = vecsD(s, d)
    val q = e.where(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("v").as("ad"), col("nrm").as("na"))
    val c = e.select(col("vec_id").as("cid"), col("v").as("bd"), col("nrm").as("nb"))
    val scored = broadcast(q).join(c, col("qid") =!= col("cid"))
      .withColumn("cos", cosCol)
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("cid"))
    scored.withColumn("rk", row_number().over(w))
      .where(col("rk") <= TopK)
      .select(col("qid"), col("rk"), col("cid"), round(col("cos"), 6).as("cos_r"))
      .orderBy("qid", "rk")
  }

  private val s1Sql =
    s"""WITH ev AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings)
       |SELECT qid, rk, cid, cos_r FROM (
       |  SELECT q.vec_id AS qid, c.vec_id AS cid,
       |    round(list_cosine_similarity(q.v, c.v), 6) AS cos_r,
       |    row_number() OVER (PARTITION BY q.vec_id
       |      ORDER BY list_cosine_similarity(q.v, c.v) DESC, c.vec_id) AS rk
       |  FROM ev q JOIN ev c ON q.vec_id <> c.vec_id
       |  WHERE q.vec_id < 5)
       |WHERE rk <= $TopK
       |ORDER BY qid, rk""".stripMargin

  // ---------------------------------------------------------------------------
  // s2 — MULTI-TABLE LSH ANN: LshTables independent hash tables, each keyed
  // by LshTableBits sign bits against data-derived hyperplanes (embeddings
  // of fixed vec_ids, so both engines derive identical planes without a
  // shared RNG). A candidate is any corpus vector sharing a query's key in
  // ANY table — the standard (L, k) LSH construction: single-table sign-LSH
  // has near-zero recall at moderate cosine, while L tables multiply recall
  // at L x the bucket probes. Query batch vec_id in [100, 105); top-3 by
  // cosine over the deduped candidates. At scale the corpus shuffles ONCE
  // on (table, key) — the exploded corpus is L x rows of (key, id) pairs,
  // vectors rejoin by id after the (tiny) candidate dedup.
  private def s2LshAnn(s: SparkSession, d: String): DataFrame = {
    val e = vecsD(s, d).cache() // reused: planes, signatures, query, corpus
    val nPlanes = LshTables * LshTableBits
    val planes = e.where(col("vec_id") < nPlanes)
      .select(col("vec_id").as("pid"), col("v").as("pv"))
    // 16-bit signature: sum over planes of 2^pid * (dot > 0)
    val sigs = e.crossJoin(broadcast(planes))
      .withColumn("dot", expr("graft_dot(v, pv)"))
      .groupBy("vec_id")
      .agg(sum(when(col("dot") > 0,
        expr("shiftleft(CAST(1 AS BIGINT), pid)")).otherwise(0L)).as("sig"))
    val keyed = sigs.select(col("vec_id"),
      posexplode(expr(s"transform(sequence(0, ${LshTables - 1}), " +
        s"t -> shiftright(sig, t * $LshTableBits) & ${(1 << LshTableBits) - 1})"))
        .as(Seq("tbl", "key")))
    val qk = keyed.where(col("vec_id") >= 100 && col("vec_id") < 105)
      .select(col("vec_id").as("qid"), col("tbl"), col("key"))
    val cand = broadcast(qk).join(keyed.select(col("vec_id").as("cid"), col("tbl"), col("key")),
        Seq("tbl", "key"))
      .where(col("qid") =!= col("cid"))
      .select("qid", "cid").distinct()
    // only the query batch broadcasts — NOT the whole corpus
    val qv = e.where(col("vec_id") >= 100 && col("vec_id") < 105)
      .select(col("vec_id").as("qid"), col("v").as("ad"), col("nrm").as("na"))
    val cv = e.select(col("vec_id").as("cid"), col("v").as("bd"), col("nrm").as("nb"))
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("cid"))
    cand.join(broadcast(qv), "qid").join(cv, "cid")
      .withColumn("cos", cosCol)
      .withColumn("rk", row_number().over(w))
      .where(col("rk") <= 3)
      .select(col("qid"), col("rk"), col("cid"), round(col("cos"), 6).as("cos_r"))
      .orderBy("qid", "rk")
  }

  private val s2Sql = {
    val nPlanes = LshTables * LshTableBits
    val mask = (1 << LshTableBits) - 1
    s"""WITH ev AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
       |planes AS (
       |  SELECT vec_id AS pid, v AS pv FROM ev WHERE vec_id < $nPlanes
       |), sigs AS (
       |  SELECT e.vec_id, CAST(sum(CASE WHEN list_dot_product(e.v, p.pv) > 0
       |    THEN (1::BIGINT << p.pid) ELSE 0 END) AS BIGINT) AS sig
       |  FROM ev e, planes p GROUP BY e.vec_id
       |), keyed AS (
       |  SELECT vec_id, r.range AS tbl, (sig >> (r.range * $LshTableBits)) & $mask AS key
       |  FROM sigs, range(0, $LshTables) r
       |), cand AS (
       |  SELECT DISTINCT q.vec_id AS qid, c.vec_id AS cid
       |  FROM keyed q JOIN keyed c ON q.tbl = c.tbl AND q.key = c.key AND q.vec_id <> c.vec_id
       |  WHERE q.vec_id >= 100 AND q.vec_id < 105
       |)
       |SELECT qid, rk, cid, cos_r FROM (
       |  SELECT cand.qid, cand.cid,
       |    round(list_cosine_similarity(q.v, c.v), 6) AS cos_r,
       |    row_number() OVER (PARTITION BY cand.qid
       |      ORDER BY list_cosine_similarity(q.v, c.v) DESC, cand.cid) AS rk
       |  FROM cand JOIN ev q ON q.vec_id = cand.qid JOIN ev c ON c.vec_id = cand.cid)
       |WHERE rk <= 3
       |ORDER BY qid, rk""".stripMargin
  }

  // ---------------------------------------------------------------------------
  // s3 — IVF-style ANN: coarse quantization by nearest of 8 data-derived
  // centroids (cells), queries probe their nprobe=2 best cells and rank only
  // those candidates. At scale the corpus partitions by cell id once
  // (shuffle on cell), and each query touches nprobe partitions — the
  // classic inverted-file trade of recall for a bounded candidate set.
  private val NumCells = 8
  private val NProbe = 2

  private def s3IvfAnn(s: SparkSession, d: String): DataFrame = {
    val e = vecsD(s, d).cache()
    val cents = e.where(col("vec_id") < NumCells)
      .select(col("vec_id").as("cell"), col("v").as("cv"), col("nrm").as("cnrm"))
    // rank centroids per vector by cosine; rank 1 = assignment, <= NProbe = probes
    val ranked = e.crossJoin(broadcast(cents))
      .withColumn("ccos", expr("graft_dot(v, cv)") / (col("nrm") * col("cnrm")))
      .withColumn("crk", row_number().over(
        Window.partitionBy(col("vec_id")).orderBy(col("ccos").desc, col("cell"))))
    val assigned = ranked.where(col("crk") === 1)
      .select(col("vec_id").as("cid"), col("v").as("bd"), col("nrm").as("nb"), col("cell"))
    val probes = ranked.where(col("crk") <= NProbe &&
        col("vec_id") >= 200 && col("vec_id") < 205)
      .select(col("vec_id").as("qid"), col("v").as("ad"), col("nrm").as("na"), col("cell"))
    broadcast(probes).join(assigned, Seq("cell"))
      .where(col("qid") =!= col("cid"))
      .withColumn("cos", cosCol)
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("cid"))))
      .where(col("rk") <= 3)
      .select(col("qid"), col("rk"), col("cid"), col("cell"), round(col("cos"), 6).as("cos_r"))
      .orderBy("qid", "rk")
  }

  private val s3Sql =
    s"""WITH ev AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
       |cents AS (SELECT vec_id AS cell, v AS cv FROM ev WHERE vec_id < $NumCells),
       |ranked AS (
       |  SELECT e.vec_id, e.v, c.cell,
       |    row_number() OVER (PARTITION BY e.vec_id
       |      ORDER BY list_cosine_similarity(e.v, c.cv) DESC, c.cell) AS crk
       |  FROM ev e, cents c
       |), assigned AS (
       |  SELECT vec_id AS cid, v AS bv, cell FROM ranked WHERE crk = 1
       |), probes AS (
       |  SELECT vec_id AS qid, v AS qv, cell FROM ranked
       |  WHERE crk <= $NProbe AND vec_id >= 200 AND vec_id < 205
       |)
       |SELECT qid, rk, cid, cell, cos_r FROM (
       |  SELECT p.qid, a.cid, a.cell,
       |    round(list_cosine_similarity(p.qv, a.bv), 6) AS cos_r,
       |    row_number() OVER (PARTITION BY p.qid
       |      ORDER BY list_cosine_similarity(p.qv, a.bv) DESC, a.cid) AS rk
       |  FROM probes p JOIN assigned a USING (cell)
       |  WHERE p.qid <> a.cid)
       |WHERE rk <= 3
       |ORDER BY qid, rk""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "s1_cosine_topk" -> s1CosineTopK _,
    "s2_lsh_ann"     -> s2LshAnn _,
    "s3_ivf_ann"     -> s3IvfAnn _)

  val oracles: Map[String, String] = Map(
    "s1_cosine_topk" -> s1Sql,
    "s2_lsh_ann"     -> s2Sql,
    "s3_ivf_ann"     -> s3Sql)
}
