package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables

/** Multimodal-column support: image/audio/video payloads as opaque `binary`
  * columns with typed metadata, plus batch feature extraction.
  *
  * The decode step is STUBBED (this environment ships no image/audio codecs):
  * [[FakeDecoder]] is a deterministic stand-in that treats the payload bytes
  * as the "decoded" sample stream. Everything around it — the schema, the
  * per-partition batching, the UDF-free metadata path, and the
  * `mapPartitions` feature extractor with one reusable buffer per partition
  * (the Scala analog of `mapInPandas` batch shape) — is the real plumbing a
  * production decoder would drop into.
  */
object Multimodal {

  /** Deterministic decode stub: replace with a real codec at deployment.
    * "Decodes" bytes into n samples and extracts fixed-size features.
    */
  object FakeDecoder {
    /** Mean/min/max/energy over the byte stream, as a 4-feature vector. */
    def features(payload: Array[Byte]): Array[Double] = {
      if (payload.isEmpty) return Array(0.0, 0.0, 0.0, 0.0)
      var sum = 0.0; var mn = 255.0; var mx = 0.0; var energy = 0.0
      var i = 0
      while (i < payload.length) {
        val v = (payload(i) & 0xff).toDouble
        sum += v; energy += v * v
        if (v < mn) mn = v
        if (v > mx) mx = v
        i += 1
      }
      Array(sum / payload.length, mn, mx, energy / payload.length)
    }

    /** "Frame sampling": take every `stride`-th byte window of size `w`. */
    def sampleFrames(payload: Array[Byte], w: Int, stride: Int): Seq[Array[Byte]] =
      (0 until math.max(0, (payload.length - w) / stride + 1))
        .map(i => java.util.Arrays.copyOfRange(payload, i * stride, i * stride + w))
  }

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType),
    StructField("media", BinaryType),
    StructField("mime", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType)))

  /** A media table synthesized from document text bytes — the plumbing test
    * corpus (payload bytes are opaque to everything downstream).
    */
  def mediaTable(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d).select(
      col("doc_id").as("media_id"),
      col("text").cast(BinaryType).as("media"),
      lit("application/octet-stream").as("mime"),
      (col("n_chars") % 640).cast(IntegerType).as("width"),
      (col("n_chars") % 480).cast(IntegerType).as("height"))

  /** Batch feature extraction via mapPartitions: one decoder instance per
    * partition, rows streamed — the shape that scales to arbitrary
    * partition counts without per-row setup cost.
    */
  def extractFeatures(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    val outSchema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("n_bytes", IntegerType),
      StructField("feat", ArrayType(DoubleType))))
    val rdd = media.select("media_id", "media").rdd.mapPartitions { it =>
      // per-partition decoder init would go here
      it.map { r =>
        val bytes = r.getAs[Array[Byte]](1)
        Row(r.getLong(0), bytes.length, FakeDecoder.features(bytes).toSeq)
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  // ---------------------------------------------------------------------------
  // m1 — metadata + byte-level stats of the binary column, pure column
  // expressions (oracle-checkable: byte length + md5 of the payload).
  private def m1BinaryMeta(s: SparkSession, d: String): DataFrame =
    mediaTable(s, d)
      .select(
        col("media_id"),
        octet_length(col("media")).as("n_bytes"),
        md5(col("media")).as("payload_md5"),
        col("mime"), col("width"), col("height"))
      .orderBy("media_id")

  private val m1Sql =
    """SELECT doc_id AS media_id,
      |  octet_length(encode(text)) AS n_bytes,
      |  md5(text) AS payload_md5,
      |  'application/octet-stream' AS mime,
      |  CAST(n_chars % 640 AS INTEGER) AS width,
      |  CAST(n_chars % 480 AS INTEGER) AS height
      |FROM documents ORDER BY media_id""".stripMargin

  // ---------------------------------------------------------------------------
  // m2 — frame-sample planning: every media row explodes to its sampled
  // frame windows (width 32, stride 16 over the decoded sample stream — the
  // FakeDecoder's "samples" are the payload chars), each fingerprinted.
  // The plan shape IS the production one: per-row frame count from
  // metadata, lateral explode, windowed extraction — a real codec changes
  // only the decode expression. Guarded sequence(): n_frames = 0 must give
  // an empty array, not sequence(0, -1) (which Spark reads as step -1).
  private val FrameW = 32
  private val FrameStride = 16

  private def m2FrameSample(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .withColumn("n_frames",
        greatest(expr(s"(length(text) - $FrameW) div $FrameStride + 1"), lit(0)))
      .select(col("doc_id").as("media_id"), col("text"),
        explode(expr("CASE WHEN n_frames > 0 THEN sequence(0, n_frames - 1) ELSE array() END"))
          .as("frame_idx"))
      .select(col("media_id"), col("frame_idx"),
        (col("frame_idx") * FrameStride).as("frame_off"),
        md5(expr(s"substring(text, frame_idx * $FrameStride + 1, $FrameW)")).as("frame_md5"))
      .orderBy("media_id", "frame_idx")

  private val m2Sql =
    s"""WITH m AS (SELECT doc_id AS media_id, text, length(text) AS n FROM documents),
       |f AS (SELECT media_id, text,
       |        unnest(range(0, greatest((n - $FrameW) // $FrameStride + 1, 0))) AS frame_idx
       |      FROM m)
       |SELECT media_id, frame_idx, frame_idx * $FrameStride AS frame_off,
       |  md5(substring(text, frame_idx * $FrameStride + 1, $FrameW)) AS frame_md5
       |FROM f ORDER BY media_id, frame_idx""".stripMargin

  // ---------------------------------------------------------------------------
  // m3 — the mapPartitions feature-extraction path itself, DuckDB-oracled:
  // the stub decoder's features are integer byte arithmetic (sums of values
  // <= 255 and squares <= 65025 over ~300-byte payloads are exact in IEEE
  // doubles regardless of order), so even the RDD batch path gets a SQL
  // cross-check — a real codec swaps FakeDecoder and keeps the plumbing.
  // The oracle re-derives per-byte values via ord() over the (ASCII) text.
  private def m3Features(s: SparkSession, d: String): DataFrame =
    extractFeatures(mediaTable(s, d))
      .where(col("n_bytes") > 0)
      .select(col("media_id"), col("n_bytes"),
        round(expr("feat[0]"), 6).as("mean_r"),
        expr("CAST(feat[1] AS INT)").as("min_b"),
        expr("CAST(feat[2] AS INT)").as("max_b"),
        round(expr("feat[3]"), 6).as("energy_r"))
      .orderBy("media_id")

  private val m3Sql =
    """WITH chars AS (
      |  SELECT doc_id AS media_id, length(text) AS n,
      |    list_transform(range(1, length(text) + 1), i -> ord(substr(text, i, 1))) AS bs
      |  FROM documents
      |)
      |SELECT media_id, CAST(n AS INTEGER) AS n_bytes,
      |  round(CAST(list_sum(bs) AS DOUBLE) / n, 6) AS mean_r,
      |  CAST(list_min(bs) AS INT) AS min_b,
      |  CAST(list_max(bs) AS INT) AS max_b,
      |  round(CAST(list_sum(list_transform(bs, b -> b * b)) AS DOUBLE) / n, 6) AS energy_r
      |FROM chars WHERE n > 0 ORDER BY media_id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "m1_binary_meta"  -> m1BinaryMeta _,
    "m2_frame_sample" -> m2FrameSample _,
    "m3_features"     -> m3Features _)

  val oracles: Map[String, String] = Map(
    "m1_binary_meta"  -> m1Sql,
    "m2_frame_sample" -> m2Sql,
    "m3_features"     -> m3Sql)
}
