package graft.out

import java.io.{BufferedOutputStream, DataOutputStream, FileOutputStream}
import java.nio.{ByteBuffer, ByteOrder}
import org.apache.spark.sql.DataFrame
import graft.core.Grid

/** Real GeoTIFF writer (K4 — reference `export_geotiff`,
  * geotools/geotools.py:369-381: GTiff driver, one float band, nodata
  * -9999). Produces a single-band float64, uncompressed, stripped,
  * little-endian GeoTIFF with the GDAL-standard georeferencing tags
  * (ModelPixelScale + ModelTiepoint) and GDAL_NODATA — exactly the subset
  * [[graft.ingest.GeoTiff.parse]] reads back, so write -> read round-trips.
  *
  * Like every single-file sink, rows stream through the driver
  * (`toLocalIterator` over the row-sorted frame — one row buffer in memory,
  * not the whole raster); an exported raster is a bounded window by
  * construction, the distributed twin being a partitioned parquet dump of
  * the same (row, col, value) frame.
  */
object GeoTiffWriter {

  private val HeaderSize = 8
  private val NumEntries = 13
  private val IfdSize = 2 + NumEntries * 12 + 4

  /** @param cells (row, col, attr) sparse raster in grid indices
    * @param t     grid transform (yres < 0, GDAL convention)
    */
  def write(cells: DataFrame, t: Grid.Transform, nrows: Int, ncols: Int,
      path: String, nodata: Double = -9999): Unit = {
    val nodataAscii = {
      // GDAL writes the nodata value as ASCII; integral values render bare
      val s = if (nodata == nodata.toLong.toDouble) nodata.toLong.toString else nodata.toString
      (s + "\u0000").getBytes("US-ASCII") // TIFF ASCII values are NUL-terminated
    }
    // layout: header | IFD | pixel-scale(24) | tiepoint(48) | nodata ascii | strip
    val scaleOff = HeaderSize + IfdSize
    val tieOff = scaleOff + 24
    val nodataOff = tieOff + 48
    val stripOff = nodataOff + ((nodataAscii.length + 1) & ~1) // keep data word-aligned
    val stripBytes = nrows.toLong * ncols * 8
    // classic TIFF caps offsets/counts at 4 bytes; exported rasters are
    // bounded windows by construction, so guard rather than silently wrap
    require(stripBytes + stripOff <= Int.MaxValue.toLong,
      s"GeoTiffWriter: raster ${nrows}x$ncols exceeds the classic-TIFF 2GB bound")

    val head = ByteBuffer.allocate(stripOff).order(ByteOrder.LITTLE_ENDIAN)
    head.put('I'.toByte).put('I'.toByte).putShort(42).putInt(HeaderSize)
    // IFD — entries MUST be in ascending tag order
    head.putShort(NumEntries.toShort)
    def entry(tag: Int, typ: Int, count: Int, value: Long): Unit = {
      head.putShort(tag.toShort).putShort(typ.toShort).putInt(count)
      if (typ == 3 && count == 1) { head.putShort(value.toShort).putShort(0) }
      else head.putInt(value.toInt)
    }
    entry(256, 4, 1, ncols)               // ImageWidth
    entry(257, 4, 1, nrows)               // ImageLength
    entry(258, 3, 1, 64)                  // BitsPerSample
    entry(259, 3, 1, 1)                   // Compression = none
    entry(262, 3, 1, 1)                   // Photometric = BlackIsZero
    entry(273, 4, 1, stripOff)            // StripOffsets (single strip)
    entry(277, 3, 1, 1)                   // SamplesPerPixel
    entry(278, 4, 1, nrows)               // RowsPerStrip
    entry(279, 4, 1, stripBytes)          // StripByteCounts
    entry(339, 3, 1, 3)                   // SampleFormat = IEEE float
    entry(33550, 12, 3, scaleOff)         // ModelPixelScale
    entry(33922, 12, 6, tieOff)           // ModelTiepoint
    entry(42113, 2, nodataAscii.length, nodataOff) // GDAL_NODATA
    head.putInt(0) // next IFD
    head.putDouble(t.xres).putDouble(-t.yres).putDouble(0.0)
    head.putDouble(0.0).putDouble(0.0).putDouble(0.0)
      .putDouble(t.ulx).putDouble(t.uly).putDouble(0.0)
    head.put(nodataAscii)

    val out = new DataOutputStream(new BufferedOutputStream(new FileOutputStream(path), 1 << 16))
    try {
      out.write(head.array(), 0, stripOff)
      // stream the raster in row-major order, padding untouched cells with
      // nodata; the sort pushes ordering into the engine, the driver holds
      // one row buffer
      val it = cells.select("row", "col", "attr").sort("row", "col").toLocalIterator()
      val rowBuf = ByteBuffer.allocate(ncols * 8).order(ByteOrder.LITTLE_ENDIAN)
      var curRow = 0
      def flushRowsUntil(target: Int): Unit =
        while (curRow < target) { out.write(rowBuf.array()); resetRow(); curRow += 1 }
      def resetRow(): Unit = {
        rowBuf.clear()
        var c = 0
        while (c < ncols) { rowBuf.putDouble(c * 8, nodata); c += 1 }
      }
      resetRow()
      while (it.hasNext) {
        val r = it.next()
        val row = r.getInt(0); val colI = r.getInt(1)
        require(row >= 0 && row < nrows && colI >= 0 && colI < ncols,
          s"cell ($row,$colI) outside $nrows x $ncols raster")
        flushRowsUntil(row)
        rowBuf.putDouble(colI * 8, r.getAs[Number](2).doubleValue())
      }
      flushRowsUntil(nrows)
    } finally out.close()
  }
}
