package graft.api

import java.nio.file.{Files, Paths}
import org.scalatest.funsuite.AnyFunSuite
import graft.core.TestSpark
import graft.geo.{Clip, Crs, Geom}
import graft.ingest.{Archives, AsciiGrid, Shp}
import graft.out.{CsvSink, WideSink}

/** End-to-end: synthetic RADOLAN-style tar.gz archives + the reference's own
  * einzugsgebiet basins (read from /root/reference/Examples, EPSG:25833) ->
  * per-basin series, validated against an independent driver-side shadow
  * computation that uses absolute coordinates (catching any window-shift /
  * index-alignment bug in the distributed path), plus the faithful CSV sink.
  */
class RadoHydroE2ESpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val examples = "/root/reference/Examples"
  private def available = Files.exists(Paths.get(s"$examples/einzugsgebiet.shp"))

  // Deterministic synthetic precipitation in 0.1 mm
  private def value(row: Int, col: Int, hour: Int): Int =
    ((row * 31 + col * 7 + hour * 13) % 400) + hour

  private def buildFixture(): (String, AsciiGrid.Header) = {
    val stereoM = Crs.RadolanStereo(unitsKm = false)
    val layer = Shp.read(s"$examples/einzugsgebiet.shp")
    // basin bounds in stereographic meters
    val boxes = layer.features.map(f => Geom.bbox(Crs.reproject(f.geom, Crs.Utm33N, stereoM)))
    val xmin = boxes.map(_._1).min; val ymin = boxes.map(_._2).min
    val xmax = boxes.map(_._3).max; val ymax = boxes.map(_._4).max
    // 1 km grid with ample margin (> 2-cell buffer) around the basins
    val xll = math.floor(xmin / 1000).toInt * 1000 - 5000
    val yll = math.floor(ymin / 1000).toInt * 1000 - 5000
    val ncols = math.ceil((xmax - xll) / 1000).toInt + 10
    val nrows = math.ceil((ymax - yll) / 1000).toInt + 10
    val h = AsciiGrid.Header(ncols, nrows, xll, yll, 1000.0, -1.0)
    val dir = Files.createTempDirectory("rado_e2e").toString
    // two daily tar.gz archives x 3 hourly members each
    for (day <- 1 to 2) {
      val members = (0 until 3).map { hour =>
        val vals = Array.tabulate(nrows, ncols) { (r, c) =>
          value(r, c, (day - 1) * 3 + hour).toDouble
        }
        Archives.Member(f"RW_2018010${day}_${hour}%02d50.asc", AsciiGrid.render(h, vals).getBytes)
      }
      val tarBytes = Archives.tar(members)
      val bos = new java.io.ByteArrayOutputStream()
      val gz = new java.util.zip.GZIPOutputStream(bos)
      gz.write(tarBytes); gz.close()
      Files.write(Paths.get(dir, f"RW-2018010$day.tar.gz"), bos.toByteArray)
    }
    (dir, h)
  }

  /** Independent shadow: absolute coords, plain loops, same geometry kernels. */
  private def shadow(h: AsciiGrid.Header): Map[(Int, String), Double] = {
    val stereoM = Crs.RadolanStereo(unitsKm = false)
    val stereoKm = Crs.RadolanStereo(unitsKm = true)
    val layer = Shp.read(s"$examples/einzugsgebiet.shp")
    val out = scala.collection.mutable.Map.empty[(Int, String), Double]
    layer.features.zipWithIndex.foreach { case (f, i) =>
      val id = i + 1
      val gKm = Crs.reproject(f.geom, Crs.Utm33N, stereoM).map(_.map(_ / 1000.0))
      // candidate cells from bbox (absolute indices over the FULL grid)
      val (bx0, by0, bx1, by1) = Geom.bbox(gKm)
      val cells = for {
        row <- 0 until h.nrows
        col <- 0 until h.ncols
        cx0 = (h.ulx + col * h.xres) / 1000.0
        cx1 = (h.ulx + (col + 1) * h.xres) / 1000.0
        cy1 = (h.uly + row * h.yres) / 1000.0
        cy0 = (h.uly + (row + 1) * h.yres) / 1000.0
        if cx0 < bx1 && cx1 > bx0 && cy0 < by1 && cy1 > by0
        clipped = Clip.clipPolygonToBox(gKm, cx0, cy0, cx1, cy1)
        if clipped.nonEmpty
        clipArea = Geom.area(Crs.reproject(clipped, stereoKm, Crs.Utm33N))
        cellArea = Geom.area(Crs.reproject(
          Array(Geom.boxRing(cx0, cy0, cx1, cy1)): Geom.Polygon, stereoKm, Crs.Utm33N))
        if clipArea > 1e-12 * cellArea
      } yield (row, col, clipArea / cellArea)
      val ratioSum = cells.map(_._3).sum
      for (hr <- 0 until 6) {
        val day = hr / 3 + 1; val hh = hr % 3
        val tstr = f"2018-01-0$day ${hh}%02d:50:00"
        val rain = cells.map { case (r, c, ratio) =>
          (value(r, c, hr) / 10.0) * (ratio / ratioSum)
        }.sum
        out((id, tstr)) = rain
      }
    }
    out.toMap
  }

  test("RADOLAN e2e matches independent shadow computation on all basins/hours") {
    assume(available)
    val (dir, h) = buildFixture()
    val res = RadoHydro.run(spark, dir, s"$examples/einzugsgebiet.shp",
      RadoHydro.Config(datasource = "radolan"))
    val got = res.series.collect().map { r =>
      (r.getInt(0), r.getTimestamp(1).toString.stripSuffix(".0")) -> r.getDouble(2)
    }.toMap
    val exp = shadow(h)
    assert(got.size == exp.size, s"${got.size} vs ${exp.size} series points")
    exp.foreach { case (k, v) =>
      assert(got.contains(k), s"missing $k")
      assert(math.abs(got(k) - v) <= 1e-9 * math.max(1.0, math.abs(v)), s"$k: ${got(k)} vs $v")
    }
  }

  test("date-range filter prunes archives (P1) and CSV sink writes faithful files") {
    assume(available)
    val (dir, _) = buildFixture()
    val res = RadoHydro.run(spark, dir, s"$examples/einzugsgebiet.shp",
      RadoHydro.Config(datasource = "radolan",
        startDate = Some("20180101"), endDate = Some("20180101")))
    val n = res.series.select("ts").distinct().count()
    assert(n == 3, s"expected 3 hourly steps on day 1, got $n")

    val outDir = Files.createTempDirectory("rado_csv").toString
    val files = CsvSink.writeFaithful(res.series, res.basins, outDir)
    assert(files.size == 5)
    // Q3: zfill width = ceil(ln(5)) = 2
    assert(files.forall(f => f.matches(".*radohydro_\\d{2}\\.csv")))
    val lines = Files.readAllLines(Paths.get(files.head))
    assert(lines.get(0).startsWith("basin ID: 1"))
    assert(lines.get(1).matches("basin_area: \\d+\\.\\d{3}"))
    assert(lines.get(2) == "Time[yymmddhh],rainfall[mm/h]")
    assert(lines.get(3).matches("1801010050,\\d+(\\.\\d+)?"))
    assert(lines.size == 3 + 3)
  }

  test("default sink is the scalable partitionBy path; content matches faithful modulo headers") {
    assume(available)
    val (dir, _) = buildFixture()
    val res = RadoHydro.run(spark, dir, s"$examples/einzugsgebiet.shp",
      RadoHydro.Config(datasource = "radolan"))
    val scalDir = Files.createTempDirectory("rado_csv_scal").toString
    val faithDir = Files.createTempDirectory("rado_csv_faith").toString
    // default dispatch: no flag -> partitionBy tree, faithful=true -> per-basin files
    assert(CsvSink.write(res.series, res.basins, scalDir) == Seq(scalDir))
    val files = CsvSink.write(res.series, res.basins, faithDir, faithful = true)
    assert(files.size == 5)
    // parse faithful: skip the 3 header lines, rows are "yyMMddHHmm,value"
    def parseVal(s: String): Double = if (s == "nan") Double.NaN else s.toDouble
    val faithful = files.flatMap { f =>
      val lines = Files.readAllLines(Paths.get(f))
      val id = lines.get(0).stripPrefix("basin ID: ").trim.toInt
      (3 until lines.size).map { i =>
        val Array(t, v) = lines.get(i).split(",", 2)
        (id, t) -> parseVal(v)
      }
    }.toMap
    // parse scalable: basinID=<id>/ partition dirs of header'd (time, rainfall_mm)
    val scalable = spark.read.option("header", "true").csv(scalDir)
      .selectExpr("cast(basinID as string) AS id", "time", "rainfall_mm")
      .collect().map { r =>
        (r.getString(0).toInt, r.getString(1)) -> parseVal(r.getString(2))
      }.toMap
    assert(scalable.keySet == faithful.keySet,
      s"row sets differ: ${scalable.keySet.size} vs ${faithful.keySet.size}")
    faithful.foreach { case (k, fv) =>
      val sv = scalable(k)
      if (fv.isNaN) assert(sv.isNaN, s"$k: faithful nan, scalable $sv")
      // both sides round to 3 dp; they differ only in half-rounding mode
      // (faithful = numpy half-even, scalable = Spark round half-up), so
      // parity holds to half an ULP at 3 dp
      else assert(math.abs(sv - fv) <= 5.0001e-4, s"$k: faithful $fv, scalable $sv")
    }
  }

  test("wide SHAPEFILE sink (K2) writes basins + ts columns, readable back") {
    assume(available)
    val (dir, _) = buildFixture()
    val res = RadoHydro.run(spark, dir, s"$examples/einzugsgebiet.shp",
      RadoHydro.Config(datasource = "radolan"))
    val base = Files.createTempDirectory("rado_shp").toString + "/polygon_values"
    assert(graft.out.WideSink.writeShapefile(res.series, res.basins, res.attrOrder, base))
    val back = Shp.read(s"$base.shp")
    assert(back.features.size == 5)
    // ts columns present as digit-named numeric fields (P4 semantics)
    val digitFields = back.fields.map(_._1).filter(_.forall(_.isDigit))
    assert(digitFields.size == 6)
    assert(back.features.head.attrs("BasinIDNew") == 1L)
    // geometry survives: areas match the Q10 basin areas
    back.features.zip(res.basins.sortBy(_.basinID)).foreach { case (f, b) =>
      assert(math.abs(graft.geo.Geom.area(f.geom) - b.areaOut) / b.areaOut < 1e-9)
    }
    // values match the series pivot
    val rain = res.series.collect().map(r =>
      (r.getInt(0), new java.text.SimpleDateFormat("yyMMddHHmm").format(r.getTimestamp(1))) -> r.getDouble(2)).toMap
    back.features.foreach { f =>
      val id = f.attrs("BasinIDNew").asInstanceOf[Long].toInt
      digitFields.foreach { t =>
        val got = f.attrs(t).asInstanceOf[Double]
        assert(math.abs(got - rain((id, t))) < 1e-6, s"basin $id ts $t")
      }
    }
  }

  test("wide sink pivots to one column per timestamp with <500 guard") {
    assume(available)
    val (dir, _) = buildFixture()
    val res = RadoHydro.run(spark, dir, s"$examples/einzugsgebiet.shp",
      RadoHydro.Config(datasource = "radolan"))
    val outPath = Files.createTempDirectory("rado_wide").toString + "/wide.parquet"
    assert(WideSink.write(res.series, outPath))
    val wide = spark.read.parquet(outPath)
    assert(wide.count() == 5)
    assert(wide.columns.length == 1 + 6) // basinID + 6 timestamps
    assert(wide.columns.count(_.forall(_.isDigit)) == 6) // P4 digit-named columns
  }
}
