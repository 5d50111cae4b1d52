package graft.ingest

/** ESRI ASCII grid parser (SURVEY S6) — replaces the reference's
  * rasterio/GDAL decode (radohydro.py:211-222) with a dependency-free text
  * parser that supports **window pushdown**: callers pass the clip window
  * (row/col ranges) and rows outside it are skipped at parse time, mirroring
  * the reference's hand-rolled predicate pushdown (geotools.py:94, SURVEY X1).
  *
  * Header: `ncols nrows xllcorner yllcorner cellsize [nodata_value]`,
  * then `nrows` whitespace-separated data rows, row 0 = north.
  */
object AsciiGrid {

  /** Grid georeferencing: GDAL-style (ulx, xres, uly, yres), yres < 0. */
  final case class Header(
      ncols: Int, nrows: Int,
      xll: Double, yll: Double,
      cellsize: Double, nodata: Double) {
    def ulx: Double = xll
    def uly: Double = yll + nrows * cellsize
    def xres: Double = cellsize
    def yres: Double = -cellsize
  }

  final case class Cell(row: Int, col: Int, value: Double)

  /** Parse just the header lines (cheap; used to derive the cell grid). */
  def parseHeader(text: String): Header = {
    var ncols = -1; var nrows = -1
    var xll = Double.NaN; var yll = Double.NaN
    var xllCenter = Double.NaN; var yllCenter = Double.NaN
    var cs = Double.NaN; var nodata = Double.NaN
    val it = text.linesIterator
    var reading = true
    while (reading && it.hasNext) {
      val line = it.next().trim
      val parts = line.split("\\s+")
      if (parts.length == 2 && parts(0).headOption.exists(c => c.isLetter)) {
        parts(0).toLowerCase match {
          case "ncols"        => ncols = parts(1).toInt
          case "nrows"        => nrows = parts(1).toInt
          case "xllcorner"    => xll = parts(1).toDouble
          case "yllcorner"    => yll = parts(1).toDouble
          // legal ESRI variant: lower-left CELL CENTER instead of corner
          case "xllcenter"    => xllCenter = parts(1).toDouble
          case "yllcenter"    => yllCenter = parts(1).toDouble
          case "cellsize"     => cs = parts(1).toDouble
          case "nodata_value" => nodata = parts(1).toDouble
          case _              => ()
        }
      } else reading = false
    }
    if (xll.isNaN && !xllCenter.isNaN) xll = xllCenter - cs / 2
    if (yll.isNaN && !yllCenter.isNaN) yll = yllCenter - cs / 2
    require(ncols > 0 && nrows > 0 && !cs.isNaN && !xll.isNaN && !yll.isNaN,
      s"bad ASCII grid header (ncols=$ncols nrows=$nrows cellsize=$cs xll=$xll yll=$yll)")
    Header(ncols, nrows, xll, yll, cs, nodata)
  }

  /** Parse the full grid (optionally windowed) into (row, col, value) cells.
    *
    * @param rowRange inclusive-exclusive [r0, r1) rows to keep (raster rows,
    *                 0 = north); None = all. Rows outside are skipped without
    *                 number parsing — the pushdown.
    * @param colRange inclusive-exclusive [c0, c1) columns to keep.
    */
  def parse(text: String,
      rowRange: Option[(Int, Int)] = None,
      colRange: Option[(Int, Int)] = None): (Header, Iterator[Cell]) = {
    val h = parseHeader(text)
    val (r0, r1) = rowRange.getOrElse((0, h.nrows))
    val (c0, c1) = colRange.getOrElse((0, h.ncols))
    val it = text.linesIterator.filter(_.trim.nonEmpty) // skip blank/space-only lines
    // skip header lines (those starting with a letter)
    val dataLines = it.dropWhile { l =>
      val t = l.trim
      t.nonEmpty && (t.head.isLetter)
    }
    val cells = dataLines.zipWithIndex.flatMap { case (line, row) =>
      if (row < r0 || row >= r1) Iterator.empty
      else {
        val toks = line.trim.split("\\s+")
        Iterator.range(math.max(c0, 0), math.min(c1, toks.length)).map { col =>
          Cell(row, col, toks(col).toDouble)
        }
      }
    }
    (h, cells)
  }

  /** Parse from raw bytes (tar members arrive as bytes). */
  def parseBytes(bytes: Array[Byte],
      rowRange: Option[(Int, Int)] = None,
      colRange: Option[(Int, Int)] = None): (Header, Iterator[Cell]) =
    parse(new String(bytes, java.nio.charset.StandardCharsets.US_ASCII), rowRange, colRange)

  /** Render a grid to ASCII text (test fixtures + GeoTIFF-stub replacement). */
  def render(h: Header, values: Array[Array[Double]]): String = {
    val sb = new StringBuilder
    sb ++= s"ncols ${h.ncols}\nnrows ${h.nrows}\n"
    sb ++= s"xllcorner ${h.xll}\nyllcorner ${h.yll}\ncellsize ${h.cellsize}\n"
    sb ++= s"NODATA_value ${h.nodata}\n"
    values.foreach { row => sb ++= row.mkString(" "); sb += '\n' }
    sb.toString
  }
}
