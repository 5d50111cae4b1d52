package graft.ingest

import org.scalatest.funsuite.AnyFunSuite
import graft.geo.Geom

class AsciiGridSpec extends AnyFunSuite {
  val fixture: String =
    """ncols 3
      |nrows 3
      |xllcorner 100.0
      |yllcorner 200.0
      |cellsize 10.0
      |NODATA_value -1
      |1 2 3
      |4 5 6
      |7 8 9
      |""".stripMargin

  test("header parse + derived transform") {
    val h = AsciiGrid.parseHeader(fixture)
    assert(h.ncols == 3 && h.nrows == 3)
    assert(h.ulx == 100.0 && h.uly == 230.0)
    assert(h.xres == 10.0 && h.yres == -10.0)
    assert(h.nodata == -1.0)
  }

  test("full parse row-major from north") {
    val (_, cells) = AsciiGrid.parse(fixture)
    val m = cells.toSeq
    assert(m.size == 9)
    assert(m.head == AsciiGrid.Cell(0, 0, 1.0)) // north-west corner
    assert(m.last == AsciiGrid.Cell(2, 2, 9.0))
  }

  test("window pushdown prunes rows and cols at parse time") {
    val (_, cells) = AsciiGrid.parse(fixture, rowRange = Some((1, 3)), colRange = Some((0, 2)))
    val m = cells.toSeq
    assert(m.map(_.value) == Seq(4.0, 5.0, 7.0, 8.0))
  }

  test("whitespace-only trailing line is ignored, not parsed as a data row") {
    val (_, cells) = AsciiGrid.parse(fixture + "   \n")
    assert(cells.size == 9)
  }

  test("render round-trips") {
    val h = AsciiGrid.Header(3, 3, 100, 200, 10, -1)
    val txt = AsciiGrid.render(h, Array(Array(1, 2, 3), Array(4, 5, 6), Array(7, 8, 9)))
    val (h2, cells) = AsciiGrid.parse(txt)
    assert(h2 == h)
    assert(cells.size == 9)
  }
}

class ArchivesSpec extends AnyFunSuite {
  test("tar round-trip with padding and multiple members") {
    val members = Seq(
      Archives.Member("a-20180101_0050.asc", "hello grid".getBytes),
      Archives.Member("b-20180101_0150.asc", Array.fill[Byte](513)(7)),
      Archives.Member("c.txt", Array.emptyByteArray))
    val out = Archives.untar(Archives.tar(members)).toSeq
    assert(out.map(_.name) == members.map(_.name))
    assert(out.zip(members).forall { case (a, b) => a.bytes.sameElements(b.bytes) })
  }

  test("gzip detection and decode") {
    val raw = "regnie line data".getBytes
    val bos = new java.io.ByteArrayOutputStream()
    val gz = new java.util.zip.GZIPOutputStream(bos)
    gz.write(raw); gz.close()
    val got = Archives.expand("ra180101.gz", bos.toByteArray).toSeq
    assert(got.size == 1 && got.head.name == "ra180101")
    assert(got.head.bytes.sameElements(raw))
  }

  test("truncated tar fails loudly instead of zero-padding member bytes") {
    val full = Archives.tar(Seq(
      Archives.Member("grid.asc", Array.fill[Byte](1024)(5))))
    val truncated = java.util.Arrays.copyOf(full, 700) // header + partial data
    val e = intercept[IllegalArgumentException](Archives.untar(truncated).toSeq)
    assert(e.getMessage.contains("truncated"))
  }

  test("corrupt gzip surfaces a zip exception, not garbage members") {
    val bad = Array[Byte](0x1f, 0x8b.toByte, 1, 2, 3, 4, 5, 6, 7, 8)
    intercept[java.util.zip.ZipException](Archives.expand("x.gz", bad).toSeq)
  }

  test("nested tar (monthly of daily) expands with two passes") {
    val daily = Archives.tar(Seq(Archives.Member("h1.asc", "x".getBytes)))
    val monthly = Archives.tar(Seq(Archives.Member("d1.tar", daily)))
    val level1 = Archives.expand("m.tar", monthly).toSeq
    assert(level1.map(_.name) == Seq("d1.tar"))
    val level2 = level1.flatMap(m => Archives.expand(m.name, m.bytes))
    assert(level2.map(_.name) == Seq("h1.asc"))
  }
}

class RegnieSpec extends AnyFunSuite {
  test("normal line: 4-char fixed width splits on whitespace, -999 nodata") {
    val line = (1 to 611).map(i => f"${i % 900}%4d").mkString("")
    val vals = Regnie.parseLine(line.grouped(4).mkString(" ")) // explicit spacing
    assert(vals.length == 611)
    assert(vals(0) == 1 && vals(610) == 611 % 900)
  }

  test("fixed-width line without explicit separators still splits (right-aligned values)") {
    // right-aligned 4-char values: "   1   2  33" style parses via whitespace
    val line = Seq(1, 22, 333, -999, 55).map(v => f"$v%4d").mkString("")
    val vals = Regnie.parseLine(line)
    assert(vals.toSeq == Seq(1, 22, 333, -999, 55))
  }

  test("repair: 8-char concatenation (mod 4 == 0) splits into 4-char chunks") {
    // 1234 concatenated with 5678: "12345678" -> 1234, 5678
    val vals = Regnie.parseLine("  11 12345678  22")
    assert(vals.toSeq == Seq(11, 1234, 5678, 22))
  }

  test("repair: 7-char with leading '1' emits trailing 3 digits first (reference order quirk)") {
    // "1234567" head '1' -> append "567" THEN chunks of "1234"
    val vals = Regnie.parseLine("  11 1234567  22")
    assert(vals.toSeq == Seq(11, 567, 1234, 22))
  }

  test("repair: 7-char with leading '9' takes first 3 digits as a value") {
    // "9994567" head '9' -> "999" then "4567"
    val vals = Regnie.parseLine("  11 9994567  22")
    assert(vals.toSeq == Seq(11, 999, 4567, 22))
  }

  test("repair: '-' starts a new token; -999 concatenated with 1000") {
    // "-9991000" tokenizes to "-9991000"? no: '-' inserts a space before,
    // giving token "-9991000" (8 chars, mod4==0) -> "-999", "1000"
    val vals = Regnie.parseLine(" 11 -9991000 22")
    assert(vals.toSeq == Seq(11, -999, 1000, 22))
  }

  test("parseFile: drops nodata, maps grid positions, discards the trailer line") {
    val l1 = Seq(10, -999, 30).map(v => f"$v%4d").mkString("")
    val l2 = Seq(-999, 50, -999).map(v => f"$v%4d").mkString("")
    // real REGNIE files end with a metadata trailer the reference discards
    val cells = Regnie.parseFile(l1 + "\n" + l2 + "\nTRAILER METADATA\n").toSeq
    assert(cells == Seq(Regnie.Cell(0, 0, 10), Regnie.Cell(0, 2, 30), Regnie.Cell(1, 1, 50)))
  }

  test("REGNIE georeferencing constants") {
    // first cell center: 6°E - 10' ; north edge per radohydro.py:393-394
    assert(math.abs(Regnie.ulx + Regnie.xres / 2 - (6.0 - 10.0 / 60.0)) < 1e-12)
    assert(math.abs(Regnie.uly + Regnie.yres / 2 - (55.0 + 10.0 / 120.0)) < 1e-12)
  }
}

class ShpSpec extends AnyFunSuite {
  val examplesDir = "/root/reference/Examples"

  def available: Boolean = java.nio.file.Files.exists(java.nio.file.Paths.get(s"$examplesDir/einzugsgebiet.shp"))

  test("einzugsgebiet: 5 basins, attributes and shoelace areas match dbf") {
    assume(available)
    val layer = Shp.read(s"$examplesDir/einzugsgebiet.shp")
    assert(layer.features.size == 5)
    val gridcodes = layer.features.map(_.attrs("gridcode"))
    assert(gridcodes == Seq(2L, 6L, 1L, 3L, 7L))
    // shoelace area (outer CCW convention) must match the dbf Shape_Area field
    layer.features.foreach { f =>
      val expected = f.attrs("Shape_Area").asInstanceOf[Double]
      assert(math.abs(Geom.area(f.geom) - expected) / expected < 1e-6,
        s"area ${Geom.area(f.geom)} vs dbf $expected")
    }
  }

  test("einzugsgebiet bbox matches FIXTURES.md") {
    assume(available)
    val layer = Shp.read(s"$examplesDir/einzugsgebiet.shp")
    val boxes = layer.features.map(f => Geom.bbox(f.geom))
    val xmin = boxes.map(_._1).min; val ymin = boxes.map(_._2).min
    val xmax = boxes.map(_._3).max; val ymax = boxes.map(_._4).max
    assert(math.abs(xmin - 414439.42) < 0.01 && math.abs(ymin - 5625369.23) < 0.01)
    assert(math.abs(xmax - 420400.70) < 0.01 && math.abs(ymax - 5635532.16) < 0.01)
  }

  test("debug1x3: three 1km boxes with UTM attribute coords") {
    assume(available)
    val layer = Shp.read(s"$examplesDir/radohydro_debug1x3.shp")
    assert(layer.features.size == 3)
    assert(layer.features.map(_.attrs("OBJECTID")) == Seq(1L, 2L, 3L))
    assert(layer.features.map(_.attrs("left")).forall(_ == 406000.0))
    assert(layer.features.map(_.attrs("bottom")) == Seq(5617800.0, 5618800.0, 5619800.0))
  }

  test("Mueglitz: single polygon, area field ~213.6 km^2") {
    assume(available)
    val layer = Shp.read(s"$examplesDir/Mueglitz_Basin.shp")
    assert(layer.features.size == 1)
    val f = layer.features.head
    assert(math.abs(f.attrs("AREA_QKM").asInstanceOf[Double] - 213.578339679975642) < 1e-9)
    // geometry is in EPSG:25833 meters; shoelace area should approximate AREA_QM
    val areaQm = f.attrs("AREA_QM").asInstanceOf[Double]
    assert(math.abs(Geom.area(f.geom) - areaQm) / areaQm < 0.01,
      s"geom area ${Geom.area(f.geom)} vs dbf $areaQm")
  }
}
