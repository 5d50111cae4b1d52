package graft.core

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Footprint cell grid (SURVEY J3/F11/F12; reference
  * `create_footprint_cells`, geotools/geotools.py:105-152).
  *
  * A cell is fully determined by its (row, col) index and the grid
  * transform, so the "cell table" is pure arithmetic over a single
  * `spark.range(nrows*ncols)` — no cross join, no shuffle, no driver
  * materialization. At RADOLAN scale (900x900 = 810k cells, or a clipped
  * ~20x20 window) this is negligible; at 100 TB the same code generates
  * cells lazily next to whatever joins them.
  *
  * `divisor` replicates quirk Q8 (coords/1000 for the RADOLAN km CRS).
  * Row/col indices are window-relative, matching the reference's
  * `Index_row`/`Index_column` built from the clipped transform.
  */
object Cells {

  /** Add xmin/ymin/xmax/ymax box columns derived from row/col columns. */
  def withCellBox(df: DataFrame, t: Grid.Transform, divisor: Double): DataFrame = {
    val tx = t.ulx / divisor; val rx = t.xres / divisor
    val ty = t.uly / divisor; val ry = t.yres / divisor // negative
    df
      .withColumn("xmin", lit(tx) + col("col") * lit(rx))
      .withColumn("xmax", lit(tx) + (col("col") + 1) * lit(rx))
      .withColumn("ymax", lit(ty) + col("row") * lit(ry))
      .withColumn("ymin", lit(ty) + (col("row") + 1) * lit(ry))
  }

  /** The full cell frame for a (windowed) grid: (row, col, xmin..ymax). */
  def cellFrame(spark: SparkSession, t: Grid.Transform, nrows: Int, ncols: Int,
      divisor: Double = 1.0): DataFrame = {
    val base = spark.range(nrows.toLong * ncols)
      .select(
        (col("id") / ncols).cast("int").as("row"),
        (col("id") % ncols).cast("int").as("col"))
    withCellBox(base, t, divisor)
  }

  /** Cell area column (axis-aligned, grid CRS): (xmax-xmin)*(ymax-ymin). */
  def cellAreaCol: Column =
    (col("xmax") - col("xmin")) * (col("ymax") - col("ymin"))
}
