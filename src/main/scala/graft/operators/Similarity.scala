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
  *  - s2: LSH-bucketed ANN — random-hyperplane signs, with hyperplanes drawn
  *    from the data itself (embeddings of fixed vec_ids) so both engines
  *    derive identical planes without a shared RNG. Candidates = same
  *    bucket -> the join key is the bucket hash, which is the scale path
  *    (corpus shuffles once by bucket; queries probe their bucket only).
  *
  * Cosines are computed with sequential higher-order-function folds (same
  * index order as DuckDB's list functions) so results are bit-deterministic.
  */
object Similarity {

  private val TopK = 10
  private val NumPlanes = 6 // 64 buckets
  private def planeIds: Seq[Int] = 0 until NumPlanes

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
  // s2 — LSH-bucketed ANN: bucket = sign bits of dot products against
  // NumPlanes data-derived hyperplanes; query batch vec_id in [100, 105);
  // top-3 by cosine within the query's bucket.
  private def s2LshAnn(s: SparkSession, d: String): DataFrame = {
    val e = vecsD(s, d).cache() // reused: planes, bucketing, query, corpus
    val planes = e.where(col("vec_id") < NumPlanes)
      .select(col("vec_id").as("pid"), col("v").as("pv"))
    // bucket each vector: sum over planes of 2^pid * (dot > 0)
    val dots = e.crossJoin(broadcast(planes))
      .withColumn("dot", expr("graft_dot(v, pv)"))
      .groupBy("vec_id")
      .agg(sum(when(col("dot") > 0,
        expr("shiftleft(CAST(1 AS BIGINT), pid)")).otherwise(0L)).as("bucket"))
    val bucketed = e.join(dots, "vec_id")
    val q = bucketed.where(col("vec_id") >= 100 && col("vec_id") < 105)
      .select(col("vec_id").as("qid"), col("v").as("ad"), col("nrm").as("na"), col("bucket"))
    val c = bucketed.select(col("vec_id").as("cid"), col("v").as("bd"), col("nrm").as("nb"), col("bucket"))
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("cid"))
    broadcast(q).join(c, Seq("bucket"))
      .where(col("qid") =!= col("cid"))
      .withColumn("cos", cosCol)
      .withColumn("rk", row_number().over(w))
      .where(col("rk") <= 3)
      .select(col("qid"), col("bucket"), col("rk"), col("cid"), round(col("cos"), 6).as("cos_r"))
      .orderBy("qid", "rk")
  }

  private val s2Sql =
    s"""WITH ev AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
       |planes AS (
       |  SELECT vec_id AS pid, v AS pv FROM ev WHERE vec_id < $NumPlanes
       |), buckets AS (
       |  SELECT e.vec_id, CAST(sum(CASE WHEN list_dot_product(e.v, p.pv) > 0
       |    THEN (1::BIGINT << p.pid) ELSE 0 END) AS BIGINT) AS bucket
       |  FROM ev e, planes p GROUP BY e.vec_id
       |), b AS (
       |  SELECT e.vec_id, e.v, buckets.bucket FROM ev e JOIN buckets USING (vec_id)
       |)
       |SELECT qid, bucket, rk, cid, cos_r FROM (
       |  SELECT q.vec_id AS qid, q.bucket AS bucket, c.vec_id AS cid,
       |    round(list_cosine_similarity(q.v, c.v), 6) AS cos_r,
       |    row_number() OVER (PARTITION BY q.vec_id
       |      ORDER BY list_cosine_similarity(q.v, c.v) DESC, c.vec_id) AS rk
       |  FROM b q JOIN b c ON q.bucket = c.bucket AND q.vec_id <> c.vec_id
       |  WHERE q.vec_id >= 100 AND q.vec_id < 105)
       |WHERE rk <= 3
       |ORDER BY qid, rk""".stripMargin

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
