package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.core.{Grid, SpatialPipeline}

/** Scale probe for the flagship spatial join: N synthetic basins (the
  * reference's published cliff is >10k polygons, README:18 — its GEOS
  * overlay is per-feature) through `basinCellMap` + a weighted series over
  * T synthetic timesteps.
  *
  * Usage: runMain graft.tools.ScaleProbe [nBasins] [nTimesteps]
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val nBasins = if (args.nonEmpty) args(0).toInt else 10000
    val nTs = if (args.length > 1) args(1).toInt else 24
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    // 900x900 km grid; basins are irregular pentagons ~6x6 km placed on a
    // hash-scattered layout (deterministic, no RNG-in-plan issues)
    val t = Grid.Transform(-523.462, 1.0, -3758.645, -1.0)
    val basins = spark.range(1, nBasins + 1)
      .select(col("id").cast("int").as("basinID"),
        (lit(-523.462 + 2.0) + pmod(hash(col("id"), lit(1)), lit(880)).cast("double")).as("x0"),
        (lit(-3758.645 - 880.0) + pmod(hash(col("id"), lit(2)), lit(878)).cast("double")).as("y0"),
        (lit(3.0) + pmod(hash(col("id"), lit(3)), lit(40)).cast("double") / 10).as("w"))
      .select(col("basinID"), array(array(
        col("x0"), col("y0"),
        col("x0") + col("w"), col("y0") + 1.0,
        col("x0") + col("w") + 1.0, col("y0") + col("w"),
        col("x0") + col("w") / 2, col("y0") + col("w") + 1.0,
        col("x0"), col("y0") + col("w"))).as("geom"))
    val cellMap = SpatialPipeline.basinCellMap(
      basins, t, 900, 900, 1.0, "radolan_km", "epsg:25833").cache()

    var t0 = System.nanoTime()
    val nCells = cellMap.count()
    val tJoin = (System.nanoTime() - t0) / 1e9

    // synthetic raster: T timesteps x the covered window, long layout
    val values = spark.range(nTs).select(col("id").as("tsn"))
      .crossJoin(cellMap.select("row", "col").distinct())
      .select(timestamp_millis(col("tsn") * 3600000L).as("ts"), col("row"), col("col"),
        (pmod(hash(col("row"), col("col"), col("tsn")), lit(4000)).cast("double") / 10).as("v"))
    t0 = System.nanoTime()
    val series = SpatialPipeline.weightedSeries(values, cellMap, 10.0)
    val nRows = series.count()
    val tSeries = (System.nanoTime() - t0) / 1e9

    println(f"""{"probe":"basin_scale","n_basins":$nBasins,"n_cells":$nCells,"join_sec":$tJoin%.1f,"series_rows":$nRows,"series_sec":$tSeries%.1f}""")
    spark.stop()
  }
}
