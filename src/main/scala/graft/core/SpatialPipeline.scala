package graft.core

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.geo.{Clip, Crs, Geom}

/** The flagship operator chain (SURVEY J2 + A2 + A3 + A4): basin polygons x
  * raster cell grid -> area-weighted per-basin time series.
  *
  * Spark formulation (SURVEY §4, the "grid-bucketed spatial join"): instead
  * of a geometric overlay (the reference's GEOS `gp.overlay`,
  * geotools.py:215-219 — its published scaling cliff at >10k polygons), each
  * basin's bbox is mapped to the covered cell-index ranges and EXPLODED to
  * (basinID, row, col) keys; the raster joins on plain (row, col) equi-keys.
  * Catalyst plans a broadcast hash join (cell map is small: clipped window x
  * basins), so the raster — the 100 TB side — is never shuffled. The exact
  * geometry work (Sutherland-Hodgman clip vs an axis-aligned cell) happens
  * once per (basin, cell), not per (basin, cell, timestamp).
  *
  * Areas are measured in the OUTPUT CRS (quirk Q9: the reference reprojects
  * before computing `gridcellarea` and intersection areas): we clip in grid
  * CRS (where cells are axis-aligned — exact), then reproject the clipped
  * rings and take the shoelace area. For ~1 km cells the deviation from
  * clipping after reprojection (the reference's order) is below 1e-6
  * relative — documented divergence.
  */
object SpatialPipeline {

  // geometry kernels are native Catalyst expressions (functions/GeoExpressions
  // .scala — no ScalaUDF row boxing); registered per session, idempotent
  private def geo(df: DataFrame): DataFrame = {
    graft.functions.GeoSql.register(df.sparkSession)
    df
  }

  /** Build the basin->cell map: one row per (basin, covered cell) with areas.
    *
    * @param basins   (basinID, geom) with geometry in GRID CRS units (already
    *                 divided for the km case — same space as the cell boxes).
    * @param t        transform of the (windowed) grid, raw units.
    * @param divisor  Q8 coordinate divisor (1000 for RADOLAN km, 1 otherwise).
    * @param gridCrs  CRS name of cell/basin coordinates (e.g. "radolan_km").
    * @param outCrs   output CRS name for area measurement (e.g. "epsg:25833").
    */
  /** Explode each polygon row to its bbox-covered (row, col) cell indices —
    * the shared bucketing step of the spatial join and rasterize. Input must
    * carry a `geom` column in grid-CRS/divisor units; all columns pass
    * through.
    */
  def explodeToCells(polys: DataFrame, t: Grid.Transform, nrows: Int, ncols: Int,
      divisor: Double): DataFrame = {
    val tx = t.ulx / divisor; val rx = t.xres / divisor
    val ty = t.uly / divisor; val ry = t.yres / divisor // ry < 0
    geo(polys)
      // empty geometries would bbox to +/-Infinity and blow up the ANSI int
      // casts below — drop them here (they cover no cells by definition)
      .where(size(col("geom")) > 0)
      .withColumn("bb", expr("st_bbox(geom)"))
      .withColumn("colLo", greatest(lit(0), floor((col("bb.xmin") - lit(tx)) / lit(rx))).cast("int"))
      .withColumn("colHi", least(lit(ncols - 1), floor((col("bb.xmax") - lit(tx)) / lit(rx))).cast("int"))
      .withColumn("rowLo", greatest(lit(0), floor((col("bb.ymax") - lit(ty)) / lit(ry))).cast("int"))
      .withColumn("rowHi", least(lit(nrows - 1), floor((col("bb.ymin") - lit(ty)) / lit(ry))).cast("int"))
      .where(col("colLo") <= col("colHi") && col("rowLo") <= col("rowHi"))
      .withColumn("row", explode(expr("sequence(rowLo, rowHi)")))
      .withColumn("col", explode(expr("sequence(colLo, colHi)")))
      .drop("bb", "colLo", "colHi", "rowLo", "rowHi")
  }

  def basinCellMap(basins: DataFrame, t: Grid.Transform, nrows: Int, ncols: Int,
      divisor: Double, gridCrs: String, outCrs: String): DataFrame = {
    val exploded = explodeToCells(basins, t, nrows, ncols, divisor)
    val boxed = Cells.withCellBox(exploded, t, divisor)
    geo(boxed)
      .withColumn("areas",
        expr(s"graft_clip_areas(geom, xmin, ymin, xmax, ymax, '$gridCrs', '$outCrs')"))
      .withColumn("clip_area", col("areas.clip_area"))
      .withColumn("cell_area", col("areas.cell_area"))
      .where(col("clip_area") > lit(1e-12) * col("cell_area"))
      .select("basinID", "row", "col", "clip_area", "cell_area")
  }

  /** A2 — the reference's per-basin NaN-cleaning gate over cells
    * (geotools.py:254-260). Input: joined (basinID,row,col,ts,v) long rows.
    * Output: (basinID,row,col, keep) per cell. Per basin: if the number of
    * cells with MORE THAN ONE missing timestamp is smaller than the cell
    * count, drop cells with ANY missing timestamp; otherwise keep all.
    */
  def nanCleanGate(joined: DataFrame): DataFrame = {
    val perCell = joined
      .groupBy("basinID", "row", "col")
      .agg(count(when(col("v").isNull, lit(1))).as("nan_cnt"))
    val w = Window.partitionBy("basinID")
    perCell
      .withColumn("bad_cells", sum(when(col("nan_cnt") > 1, 1).otherwise(0)).over(w))
      .withColumn("total_cells", count(lit(1)).over(w))
      .withColumn("keep",
        when(col("bad_cells") < col("total_cells"), col("nan_cnt") === 0).otherwise(lit(true)))
      .select("basinID", "row", "col", "keep")
  }

  /** A3 — weight normalization over surviving cells (geotools.py:262):
    * w = (clip/cell) / sum(clip/cell) per basin.
    */
  def weights(cellMap: DataFrame, kept: DataFrame): DataFrame = {
    val w = Window.partitionBy("basinID")
    cellMap
      .join(kept, Seq("basinID", "row", "col"))
      .where(col("keep"))
      .withColumn("ratio", col("clip_area") / col("cell_area"))
      .withColumn("wgt", col("ratio") / sum(col("ratio")).over(w))
      .select("basinID", "row", "col", "wgt")
  }

  /** Full chain: values (ts,row,col,v with nodata as null) + basin cell map
    * -> (basinID, ts, rain). A missing value on a surviving cell propagates
    * NaN into that basin-timestamp (numpy sum semantics), matching the
    * reference.
    *
    * @param numerator F7 scale divide (10: 0.1 mm -> mm).
    */
  /** Streaming variant of the weighted aggregation (§2.11 stretch goal):
    * identical join/weight arithmetic over a STREAMING values frame, with a
    * watermark bounding the (basinID, window) state. The NaN-cleaning gate
    * is inherently retrospective (it needs the cell's full history), so the
    * streaming path takes precomputed weights — e.g. from a previous batch
    * run or `weights(cellMap, allKept)` — which is also the correct
    * production shape: the cell map is static dimension state.
    */
  def weightedSeriesStream(valuesStream: DataFrame, wgts: DataFrame,
      numerator: Double, window_ : String = "1 hour",
      watermark: String = "2 hours"): DataFrame =
    valuesStream
      .withWatermark("ts", watermark)
      .join(broadcast(wgts), Seq("row", "col"))
      .select(col("basinID"), col("ts"),
        (coalesce(col("v"), lit(Double.NaN)) / lit(numerator) * col("wgt")).as("contrib"))
      .groupBy(col("basinID"), window(col("ts"), window_))
      .agg(sum(col("contrib")).as("rain"))
      .select(col("basinID"), col("window.start").as("wstart"), col("rain"))

  def weightedSeries(values: DataFrame, cellMap: DataFrame, numerator: Double): DataFrame = {
    // persist the basin-joined window: it feeds BOTH the NaN gate and the
    // final aggregation, and without materialization each action would
    // re-execute the full raster lineage (gunzip + untar + text parse) twice.
    // This is the clipped window x basins — the same working set the
    // reference holds as its stacked array, orders of magnitude smaller than
    // the raw raster.
    val joined = values
      .join(broadcast(cellMap.select("basinID", "row", "col")), Seq("row", "col"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val kept = nanCleanGate(joined)
    val wgts = weights(cellMap, kept)
    joined
      .join(broadcast(wgts), Seq("basinID", "row", "col"))
      .select(col("basinID"), col("ts"),
        (coalesce(col("v"), lit(Double.NaN)) / lit(numerator) * col("wgt")).as("contrib"))
      .groupBy("basinID", "ts")
      .agg(sum(col("contrib")).as("rain"))
  }
}
