package graft.core

/** Grid georeferencing + window (pushdown) math.
  *
  * Replicates the reference's `buffered_raster_clipping`
  * (geotools/geotools.py:85-99): expand the basin bounds by
  * `bufferCells * cellsize` (quirk Q7: edge basins keep full coverage), map
  * to fractional indices, truncate toward zero (quirk Q6: `astype(int)`,
  * not floor — identical for the positive in-grid coordinates that occur in
  * practice), slice, and re-origin the transform.
  *
  * Divergence from the reference (documented): indices are clamped to
  * [0, n] — numpy would wrap negative indices around, which is never
  * meaningful for a basin near the grid edge.
  */
object Grid {

  /** GDAL-style transform: x = ulx + col*xres, y = uly + row*yres (yres<0). */
  final case class Transform(ulx: Double, xres: Double, uly: Double, yres: Double)

  /** Half-open slice [rowLo,rowHi) x [colLo,colHi) in raster indices. */
  final case class Window(rowLo: Int, rowHi: Int, colLo: Int, colHi: Int) {
    def nrows: Int = rowHi - rowLo
    def ncols: Int = colHi - colLo
  }

  /** The buffered clip window for basin bounds (grid-CRS units). */
  def bufferedWindow(t: Transform, nrows: Int, ncols: Int,
      bounds: (Double, Double, Double, Double), bufferCells: Int = 2): Window = {
    val (xmin, ymin, xmax, ymax) = bounds
    val cellsize = math.min(math.abs(t.xres), math.abs(t.yres))
    val bx0 = xmin - bufferCells * cellsize
    val by0 = ymin - bufferCells * cellsize
    val bx1 = xmax + bufferCells * cellsize
    val by1 = ymax + bufferCells * cellsize
    // reference: colums = ((bounds[[0,2]]-ulx)/xres).astype(int)  (truncate)
    val c0 = ((bx0 - t.ulx) / t.xres).toInt
    val c1 = ((bx1 - t.ulx) / t.xres).toInt
    // rows from (ymin -> large index, ymax -> small index) since yres < 0
    val r0 = ((by0 - t.uly) / t.yres).toInt // bottom -> rowHi
    val r1 = ((by1 - t.uly) / t.yres).toInt // top -> rowLo
    Window(
      rowLo = math.max(0, math.min(r1, nrows)),
      rowHi = math.max(0, math.min(r0, nrows)),
      colLo = math.max(0, math.min(c0, ncols)),
      colHi = math.max(0, math.min(c1, ncols)))
  }

  /** Transform of the window's sub-grid (geotools.py:96-99). */
  def shifted(t: Transform, w: Window): Transform =
    Transform(t.ulx + w.colLo * t.xres, t.xres, t.uly + w.rowLo * t.yres, t.yres)
}
