package graft.ingest

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.file.{Files, Paths}
import org.scalatest.funsuite.AnyFunSuite

/** Minimal GeoTIFF byte builder for tests: single-band int16, stripped,
  * little-endian, with ModelPixelScale + ModelTiepoint + GDAL_NODATA.
  */
object TiffFixture {
  def build(nrows: Int, ncols: Int, ulx: Double, uly: Double, cell: Double,
      nodata: Double, value: (Int, Int) => Int): Array[Byte] = {
    val data = Array.tabulate(nrows * ncols)(i => value(i / ncols, i % ncols).toShort)
    val nEntries = 12
    val ifdOffset = 8
    val afterIfd = ifdOffset + 2 + nEntries * 12 + 4
    val scaleOff = afterIfd
    val tieOff = scaleOff + 24
    val nodataStr = s"$nodata "
    val nodataOff = tieOff + 48
    val dataOff = nodataOff + nodataStr.length
    val buf = ByteBuffer.allocate(dataOff + data.length * 2).order(ByteOrder.LITTLE_ENDIAN)
    buf.put('I'.toByte).put('I'.toByte).putShort(42).putInt(ifdOffset)
    buf.putShort(nEntries.toShort)
    def entry(tag: Int, typ: Int, count: Int, v: Long): Unit = {
      buf.putShort(tag.toShort).putShort(typ.toShort).putInt(count)
      if (typ == 3 && count == 1) { buf.putShort(v.toShort).putShort(0) }
      else buf.putInt(v.toInt)
    }
    entry(256, 3, 1, ncols); entry(257, 3, 1, nrows)
    entry(258, 3, 1, 16); entry(259, 3, 1, 1)
    entry(273, 4, 1, dataOff); entry(277, 3, 1, 1)
    entry(278, 3, 1, nrows); entry(279, 4, 1, data.length * 2)
    entry(339, 3, 1, 2)
    entry(33550, 12, 3, scaleOff)
    entry(33922, 12, 6, tieOff)
    entry(42113, 2, nodataStr.length, nodataOff)
    buf.putInt(0)
    buf.position(scaleOff); buf.putDouble(cell).putDouble(cell).putDouble(0.0)
    buf.position(tieOff)
    buf.putDouble(0).putDouble(0).putDouble(0).putDouble(ulx).putDouble(uly).putDouble(0)
    buf.position(nodataOff); buf.put(nodataStr.getBytes("US-ASCII"))
    buf.position(dataOff); data.foreach(buf.putShort)
    buf.array()
  }
}

class GeoTiffSpec extends AnyFunSuite {
  private def tiff = TiffFixture.build(3, 4, 406000, 5620800, 1000.0, -1.0,
    (r, c) => r * 10 + c)

  test("parses int16 stripped LE tiff with scale/tiepoint/nodata tags") {
    val (meta, cells) = GeoTiff.parse(tiff)
    assert(meta.ncols == 4 && meta.nrows == 3)
    assert(meta.ulx == 406000.0 && meta.uly == 5620800.0)
    assert(meta.xres == 1000.0 && meta.yres == -1000.0)
    assert(meta.nodata == -1.0)
    val m = cells.toSeq
    assert(m.size == 12)
    assert(m.head == GeoTiff.Cell(0, 0, 0.0))
    assert(m.last == GeoTiff.Cell(2, 3, 23.0))
    assert(m.find(c => c.row == 1 && c.col == 2).get.value == 12.0)
  }

  test("window pushdown restricts parsed cells") {
    val (_, cells) = GeoTiff.parse(tiff, rowRange = Some((1, 3)), colRange = Some((2, 4)))
    assert(cells.toSeq.map(_.value) == Seq(12.0, 13.0, 22.0, 23.0))
  }

  test("rejects compressed input with a clear error") {
    val bytes = tiff
    val compValueOff = 8 + 2 + 3 * 12 + 8 // 4th entry's value field
    bytes(compValueOff) = 5 // LZW
    val e = intercept[IllegalArgumentException](GeoTiff.parse(bytes))
    assert(e.getMessage.contains("uncompressed"))
  }

  test("pipeline parity: .tif members produce the same series as .asc members") {
    val examples = "/root/reference/Examples"
    assume(Files.exists(Paths.get(s"$examples/einzugsgebiet.shp")))
    val spark = graft.core.TestSpark.spark
    import graft.geo.{Crs, Geom}
    val stereoM = Crs.RadolanStereo(unitsKm = false)
    val layer = Shp.read(s"$examples/einzugsgebiet.shp")
    val boxes = layer.features.map(f => Geom.bbox(Crs.reproject(f.geom, Crs.Utm33N, stereoM)))
    val xll = math.floor(boxes.map(_._1).min / 1000).toInt * 1000 - 5000
    val yll = math.floor(boxes.map(_._2).min / 1000).toInt * 1000 - 5000
    val ncols = math.ceil((boxes.map(_._3).max - xll) / 1000).toInt + 10
    val nrows = math.ceil((boxes.map(_._4).max - yll) / 1000).toInt + 10
    def v(r: Int, c: Int) = ((r * 13 + c * 3) % 300)

    val ascDir = Files.createTempDirectory("parity_asc").toString
    val h = AsciiGrid.Header(ncols, nrows, xll, yll, 1000.0, -1.0)
    Files.write(Paths.get(ascDir, "RW_20180101_0050.asc"),
      AsciiGrid.render(h, Array.tabulate(nrows, ncols)((r, c) => v(r, c).toDouble)).getBytes)
    val tifDir = Files.createTempDirectory("parity_tif").toString
    Files.write(Paths.get(tifDir, "RW_20180101_0050.tif"),
      TiffFixture.build(nrows, ncols, xll, yll + nrows * 1000.0, 1000.0, -1.0, v))

    def series(dir: String) = graft.api.RadoHydro
      .run(spark, dir, s"$examples/einzugsgebiet.shp",
        graft.api.RadoHydro.Config(datasource = "radolan"))
      .series.collect().map(r => (r.getInt(0), r.getTimestamp(1)) -> r.getDouble(2)).toMap
    val a = series(ascDir); val t = series(tifDir)
    assert(a.nonEmpty && a.keySet == t.keySet)
    a.foreach { case (k, va) => assert(math.abs(va - t(k)) < 1e-12, s"$k") }
  }
}
