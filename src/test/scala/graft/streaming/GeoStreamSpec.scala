package graft.streaming

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite
import graft.core.{Grid, SpatialPipeline, TestSpark}

/** §2.11 stretch goal: the radohydro weighted aggregation running as a
  * Structured Streaming query over incrementally-arriving grid values, with
  * results equal to the batch execution.
  */
class GeoStreamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val t = Grid.Transform(0.0, 1.0, 3.0, -1.0)

  test("streaming weighted series equals batch on the golden fixture") {
    import spark.implicits._
    val basins = Seq(
      (1, Seq(Seq(0.5, 1.5, 2.5, 1.5, 2.5, 2.5, 0.5, 2.5)))).toDF("basinID", "geom")
    val cellMap = SpatialPipeline.basinCellMap(basins, t, 3, 3, 1.0, "epsg:4326", "epsg:4326")
    val kept = cellMap.select("basinID", "row", "col").withColumn("keep", lit(true))
    val wgts = SpatialPipeline.weights(cellMap, kept)

    val values = (for {
      k <- 1 to 3; row <- 0 until 3; col <- 0 until 3
    } yield (java.sql.Timestamp.valueOf(f"2018-01-01 0$k:00:00"), row, col,
      java.lang.Double.valueOf(10.0 * (row * 3 + col + 1) + k)))
      .toDF("ts", "row", "col", "v")
    val dir = Files.createTempDirectory("geo_stream").toString
    values.coalesce(2).write.mode("overwrite").parquet(dir)

    // batch truth through the SAME streaming operator graph (values compared
    // with tolerance: double-sum order differs between execution modes)
    val batch = SpatialPipeline.weightedSeriesStream(
      spark.read.parquet(dir), wgts, 10.0)
      .collect().map(r => (r.getInt(0), r.getTimestamp(1)) -> r.getDouble(2)).toMap

    val stream = spark.readStream.schema(values.schema).parquet(dir)
    val q = SpatialPipeline.weightedSeriesStream(stream, wgts, 10.0)
      .writeStream.outputMode(OutputMode.Complete)
      .format("memory").queryName("geo_stream_parity").start()
    try q.processAllAvailable()
    finally q.stop()
    val streamed = spark.table("geo_stream_parity")
      .collect().map(r => (r.getInt(0), r.getTimestamp(1)) -> r.getDouble(2)).toMap

    def close(a: Map[(Int, java.sql.Timestamp), Double],
        b: Map[(Int, java.sql.Timestamp), Double]): Unit = {
      assert(a.keySet == b.keySet)
      a.foreach { case (k, v) => assert(math.abs(v - b(k)) < 1e-9, s"$k: $v vs ${b(k)}") }
    }
    assert(streamed.nonEmpty)
    close(streamed, batch)
    // and agreement with the batch weightedSeries chain (hour windows align
    // with the hourly timestamps)
    val full = SpatialPipeline.weightedSeries(values, cellMap, 10.0)
      .collect().map(r => (r.getInt(0), r.getTimestamp(1)) -> r.getDouble(2)).toMap
    close(full, streamed)
  }
}
