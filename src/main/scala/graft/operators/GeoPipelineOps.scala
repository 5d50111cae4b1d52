package graft.operators

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.api.RadoHydro
import graft.geo.{Crs, Geom}
import graft.ingest.{Archives, AsciiGrid, Shp}

/** The flagship geospatial pipeline as a harness query (SURVEY §3.1): a
  * deterministic RADOLAN-style fixture (2 days x 3 hourly grids over the
  * reference's einzugsgebiet basins) through the full
  * binaryFile -> window-pushdown parse -> spatial join -> NaN gate ->
  * weights -> weighted series chain. Not SQL-expressible in DuckDB (no
  * oracle entry -> driver records the rows-only check); exact-value
  * correctness is pinned by RadoHydroE2ESpec's independent shadow
  * computation and the hand-computed goldens in SpatialPipelineGoldenSpec.
  */
object GeoPipelineOps {

  private val examples = "/root/reference/Examples"
  private val fixtureDir = "/tmp/graft_geo_fixture_v1"

  private def value(row: Int, col: Int, hour: Int): Int =
    ((row * 31 + col * 7 + hour * 13) % 400) + hour

  /** Build (once) the deterministic grid fixture next to the basins. */
  private def ensureFixture(): String = synchronized {
    val marker = Paths.get(fixtureDir, "_done")
    if (Files.exists(marker)) return fixtureDir
    val stereoM = Crs.RadolanStereo(unitsKm = false)
    val layer = Shp.read(s"$examples/einzugsgebiet.shp")
    val boxes = layer.features.map(f => Geom.bbox(Crs.reproject(f.geom, Crs.Utm33N, stereoM)))
    val xll = math.floor(boxes.map(_._1).min / 1000).toInt * 1000 - 5000
    val yll = math.floor(boxes.map(_._2).min / 1000).toInt * 1000 - 5000
    val ncols = math.ceil((boxes.map(_._3).max - xll) / 1000).toInt + 10
    val nrows = math.ceil((boxes.map(_._4).max - yll) / 1000).toInt + 10
    val h = AsciiGrid.Header(ncols, nrows, xll, yll, 1000.0, -1.0)
    Files.createDirectories(Paths.get(fixtureDir))
    for (day <- 1 to 2) {
      val members = (0 until 3).map { hour =>
        val vals = Array.tabulate(nrows, ncols)((r, c) =>
          value(r, c, (day - 1) * 3 + hour).toDouble)
        Archives.Member(f"RW_2018010${day}_$hour%02d50.asc", AsciiGrid.render(h, vals).getBytes)
      }
      val bos = new java.io.ByteArrayOutputStream()
      val gz = new java.util.zip.GZIPOutputStream(bos)
      gz.write(Archives.tar(members)); gz.close()
      Files.write(Paths.get(fixtureDir, f"RW-2018010$day.tar.gz"), bos.toByteArray)
    }
    Files.write(marker, Array.emptyByteArray)
    fixtureDir
  }

  private def g1Radohydro(s: SparkSession, d: String): DataFrame = {
    val dir = ensureFixture()
    val res = RadoHydro.run(s, dir, s"$examples/einzugsgebiet.shp",
      RadoHydro.Config(datasource = "radolan"))
    import org.apache.spark.sql.functions._
    res.series
      .select(col("basinID"),
        date_format(col("ts"), "yyMMddHHmm").as("t"),
        round(col("rain"), 6).as("rain_mm"))
      .orderBy("basinID", "t")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] =
    if (Files.exists(Paths.get(s"$examples/einzugsgebiet.shp")))
      Map("g1_radohydro_pipeline" -> g1Radohydro _)
    else Map.empty

  val oracles: Map[String, String] = Map.empty // geometry: ScalaTest goldens instead
}
