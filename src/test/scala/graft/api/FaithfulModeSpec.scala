package graft.api

import java.nio.file.{Files, Paths}
import org.scalatest.funsuite.AnyFunSuite
import graft.core.TestSpark
import graft.ingest.{Archives, AsciiGrid}
import graft.geo.{Crs, Geom}
import graft.ingest.Shp

/** Quirk Q1 (radohydro.py:217): RADOLAN nodata is captured but never masked
  * in the reference — sentinels flow into the weighted sums. Sane default
  * masks; `maskNodata = false` reproduces the leak.
  */
class FaithfulModeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val examples = "/root/reference/Examples"
  private def available = Files.exists(Paths.get(s"$examples/einzugsgebiet.shp"))

  private def buildGrid(nodataEverywhere: Boolean): String = {
    val stereoM = Crs.RadolanStereo(unitsKm = false)
    val layer = Shp.read(s"$examples/einzugsgebiet.shp")
    val boxes = layer.features.map(f => Geom.bbox(Crs.reproject(f.geom, Crs.Utm33N, stereoM)))
    val xll = math.floor(boxes.map(_._1).min / 1000).toInt * 1000 - 5000
    val yll = math.floor(boxes.map(_._2).min / 1000).toInt * 1000 - 5000
    val ncols = math.ceil((boxes.map(_._3).max - xll) / 1000).toInt + 10
    val nrows = math.ceil((boxes.map(_._4).max - yll) / 1000).toInt + 10
    val h = AsciiGrid.Header(ncols, nrows, xll, yll, 1000.0, -1.0)
    val vals = Array.tabulate(nrows, ncols)((r, c) =>
      if (nodataEverywhere) -1.0 else 100.0)
    val dir = Files.createTempDirectory("rado_faithful").toString
    // 3 timestamps: with a single one, every cell has exactly ONE missing
    // value, the >1-NaN gate (A2) sees no "bad" cells and dropna() empties
    // every basin — the reference behaves identically (quirk of G:258)
    for (hh <- 0 until 3)
      Files.write(Paths.get(dir, f"RW_20180101_$hh%02d50.asc"),
        AsciiGrid.render(h, vals).getBytes)
    dir
  }

  test("single all-nodata timestamp: the >1-NaN gate drops every cell (G:258 quirk)") {
    assume(available)
    val stereoM = Crs.RadolanStereo(unitsKm = false)
    val layer = Shp.read(s"$examples/einzugsgebiet.shp")
    val boxes = layer.features.map(f => Geom.bbox(Crs.reproject(f.geom, Crs.Utm33N, stereoM)))
    val xll = math.floor(boxes.map(_._1).min / 1000).toInt * 1000 - 5000
    val yll = math.floor(boxes.map(_._2).min / 1000).toInt * 1000 - 5000
    val ncols = math.ceil((boxes.map(_._3).max - xll) / 1000).toInt + 10
    val nrows = math.ceil((boxes.map(_._4).max - yll) / 1000).toInt + 10
    val h = AsciiGrid.Header(ncols, nrows, xll, yll, 1000.0, -1.0)
    val dir = Files.createTempDirectory("rado_single").toString
    Files.write(Paths.get(dir, "RW_20180101_0050.asc"),
      AsciiGrid.render(h, Array.fill(nrows, ncols)(-1.0)).getBytes)
    val res = RadoHydro.run(spark, dir, s"$examples/einzugsgebiet.shp",
      RadoHydro.Config(datasource = "radolan", maskNodata = true))
    assert(res.series.collect().isEmpty)
  }

  test("sane default masks nodata -> NaN propagates through surviving cells") {
    assume(available)
    val dir = buildGrid(nodataEverywhere = true)
    val res = RadoHydro.run(spark, dir, s"$examples/einzugsgebiet.shp",
      RadoHydro.Config(datasource = "radolan", maskNodata = true))
    // every cell nodata -> gate keeps all (all equally bad) -> NaN rain
    val rains = res.series.collect().map(_.getDouble(2))
    assert(rains.nonEmpty && rains.forall(_.isNaN))
  }

  test("faithful mode (Q1) leaks the sentinel into the weighted sum") {
    assume(available)
    val dir = buildGrid(nodataEverywhere = true)
    val res = RadoHydro.run(spark, dir, s"$examples/einzugsgebiet.shp",
      RadoHydro.Config(datasource = "radolan", maskNodata = false))
    // -1 (0.1mm) / 10 = -0.1 mm everywhere; weights sum to 1 per basin
    val rains = res.series.collect().map(_.getDouble(2))
    assert(rains.nonEmpty)
    rains.foreach(r => assert(math.abs(r - (-0.1)) < 1e-9, s"got $r"))
  }

  test("uniform field: weighted average equals the field value exactly") {
    assume(available)
    val dir = buildGrid(nodataEverywhere = false)
    val res = RadoHydro.run(spark, dir, s"$examples/einzugsgebiet.shp",
      RadoHydro.Config(datasource = "radolan"))
    val rains = res.series.collect().map(_.getDouble(2))
    assert(rains.length == 15) // 5 basins x 3 timestamps
    rains.foreach(r => assert(math.abs(r - 10.0) < 1e-9, s"got $r")) // 100/10
  }
}
