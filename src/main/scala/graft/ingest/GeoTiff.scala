package graft.ingest

import java.nio.{ByteBuffer, ByteOrder}

/** Minimal GeoTIFF reader (SURVEY S9 — the reference's `gdal.Open` branch,
  * geotools/geotools.py:49-54, reachable only when a raster path is passed
  * directly; implemented here so the engine accepts .tif members the same
  * way it accepts ASCII grids).
  *
  * Scope: single-band, uncompressed (Compression=1), stripped TIFF in
  * either byte order; 8/16/32-bit integer (signed/unsigned) and 32/64-bit
  * float samples; georeferencing from ModelPixelScale + ModelTiepoint
  * (the GDAL-standard tags), nodata from GDAL_NODATA. Tiled or compressed
  * files are rejected with a clear error — at pipeline scale, raster
  * decompression belongs upstream of the columnar engine anyway.
  */
object GeoTiff {

  final case class Meta(ncols: Int, nrows: Int,
      ulx: Double, uly: Double, xres: Double, yres: Double, nodata: Double)

  final case class Cell(row: Int, col: Int, value: Double)

  private final case class Entry(tag: Int, typ: Int, count: Int, valueOffset: Long)

  def parse(bytes: Array[Byte],
      rowRange: Option[(Int, Int)] = None,
      colRange: Option[(Int, Int)] = None): (Meta, Iterator[Cell]) = {
    val buf = ByteBuffer.wrap(bytes)
    val order = bytes(0) match {
      case 'I' => ByteOrder.LITTLE_ENDIAN
      case 'M' => ByteOrder.BIG_ENDIAN
      case _   => throw new IllegalArgumentException("not a TIFF (bad byte-order mark)")
    }
    buf.order(order)
    require((buf.getShort(2) & 0xffff) == 42, "not a TIFF (magic != 42)")
    val ifdOffset = buf.getInt(4) & 0xffffffffL

    // --- IFD ---------------------------------------------------------------
    val n = buf.getShort(ifdOffset.toInt) & 0xffff
    val entries = (0 until n).map { i =>
      val off = ifdOffset.toInt + 2 + i * 12
      Entry(buf.getShort(off) & 0xffff, buf.getShort(off + 2) & 0xffff,
        buf.getInt(off + 4), buf.getInt(off + 8) & 0xffffffffL)
    }.map(e => e.tag -> e).toMap

    def intVal(tag: Int, default: => Int): Int = entries.get(tag) match {
      case None    => default
      case Some(e) =>
        // SHORT values live inline in the first 2 bytes of the value field
        if (e.typ == 3) shortInline(e) else e.valueOffset.toInt
    }
    def shortInline(e: Entry): Int = {
      // value field starts at entry offset + 8; find the entry position
      val idx = (0 until n).find { i =>
        (buf.getShort(ifdOffset.toInt + 2 + i * 12) & 0xffff) == e.tag
      }.get
      buf.getShort(ifdOffset.toInt + 2 + idx * 12 + 8) & 0xffff
    }
    def longArray(e: Entry): Array[Long] =
      if (e.count == 1) Array(if (e.typ == 3) shortInline(e) else e.valueOffset)
      else {
        val off = e.valueOffset.toInt
        Array.tabulate(e.count) { i =>
          if (e.typ == 3) (buf.getShort(off + 2 * i) & 0xffff).toLong
          else buf.getInt(off + 4 * i) & 0xffffffffL
        }
      }
    def doubleArray(e: Entry): Array[Double] = {
      val off = e.valueOffset.toInt
      Array.tabulate(e.count)(i => buf.getDouble(off + 8 * i))
    }
    def asciiVal(e: Entry): String =
      if (e.count <= 4) "" // inline, not needed for GDAL_NODATA in practice
      else new String(bytes, e.valueOffset.toInt, e.count - 1, "US-ASCII").trim

    val ncols = intVal(256, throw new IllegalArgumentException("TIFF: no ImageWidth"))
    val nrows = intVal(257, throw new IllegalArgumentException("TIFF: no ImageLength"))
    val bits = intVal(258, 1)
    val compression = intVal(259, 1)
    require(compression == 1, s"GeoTiff: only uncompressed supported (compression=$compression)")
    require(!entries.contains(322), "GeoTiff: tiled TIFFs not supported (stripped only)")
    val samplesPerPixel = intVal(277, 1)
    require(samplesPerPixel == 1, s"GeoTiff: single-band only (got $samplesPerPixel)")
    val rowsPerStrip = intVal(278, nrows)
    val sampleFormat = intVal(339, 1) // 1 uint, 2 int, 3 float
    val stripOffsets = longArray(entries(273))
    val stripCounts = entries.get(279).map(longArray).getOrElse(Array.empty[Long])

    val (scaleX, scaleY) = entries.get(33550).map(doubleArray) match {
      case Some(Array(sx, sy, _*)) => (sx, sy)
      case _ => (1.0, 1.0)
    }
    val (ulx, uly) = entries.get(33922).map(doubleArray) match {
      // tiepoint: (i, j, k, x, y, z) — raster point (i,j) maps to model (x,y)
      case Some(a) if a.length >= 6 => (a(3) - a(0) * scaleX, a(4) + a(1) * scaleY)
      case _ => (0.0, 0.0)
    }
    val nodata = entries.get(42113).map(e => asciiVal(e)).filter(_.nonEmpty)
      .map(_.toDouble).getOrElse(Double.NaN)

    val meta = Meta(ncols, nrows, ulx, uly, scaleX, -scaleY, nodata)
    val bytesPerSample = bits / 8
    val (r0, r1) = rowRange.getOrElse((0, nrows))
    val (c0, c1) = colRange.getOrElse((0, ncols))

    def sampleAt(stripData: Int, idx: Int): Double = {
      val off = stripData + idx * bytesPerSample
      (sampleFormat, bits) match {
        case (3, 32) => buf.getFloat(off).toDouble
        case (3, 64) => buf.getDouble(off)
        case (2, 16) => buf.getShort(off).toDouble
        case (2, 32) => buf.getInt(off).toDouble
        case (1, 8)  => (bytes(off) & 0xff).toDouble
        case (1, 16) => (buf.getShort(off) & 0xffff).toDouble
        case (1, 32) => (buf.getInt(off) & 0xffffffffL).toDouble
        case other   => throw new IllegalArgumentException(s"GeoTiff: unsupported sample $other")
      }
    }

    val cells = Iterator.range(math.max(0, r0), math.min(nrows, r1)).flatMap { row =>
      val strip = row / rowsPerStrip
      val rowInStrip = row % rowsPerStrip
      val stripData = stripOffsets(strip).toInt
      Iterator.range(math.max(0, c0), math.min(ncols, c1)).map { col =>
        Cell(row, col, sampleAt(stripData, rowInStrip * ncols + col))
      }
    }
    (meta, cells)
  }
}
