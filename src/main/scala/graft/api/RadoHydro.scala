package graft.api

import java.sql.Timestamp
import java.time.LocalDateTime
import java.time.format.DateTimeFormatter

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.{Cells, Grid, SpatialPipeline}
import graft.geo.{Crs, Geom}
import graft.ingest.{Archives, AsciiGrid, GeoTiff, Regnie, Shp}

/** The `radohydro()`-equivalent entry point (reference radohydro.py:503-546),
  * re-expressed as one lazy Spark plan:
  *
  *   binaryFile scan -> archive expand -> windowed raster parse (long rows)
  *     -> broadcast-join basin/cell map -> NaN gate -> weights
  *     -> groupBy(basinID, ts) weighted sum -> sinks
  *
  * The clip window is computed once from the first grid's header + basin
  * bounds (reference X9/X1) and pushed into the parser as a row/col range, so
  * tasks never materialize full 900x900 grids. The basin dimension is read
  * driver-side (small shapefile), reprojected with closed-form CRS math, and
  * broadcast. Scale notes: the raster side is never shuffled until the final
  * (basinID, ts) aggregation, whose cardinality is |basins| x |timestamps|.
  */
object RadoHydro {

  final case class Config(
      datasource: String = "radolan",  // "radolan" | "regnie"
      startDate: Option[String] = None, // yyyyMMdd inclusive
      endDate: Option[String] = None,
      outCrs: String = "epsg:25833",
      shapeCrs: String = "epsg:25833",
      bufferCells: Int = 2,            // quirk Q7
      numerator: Double = 10.0,        // F7: 0.1 mm -> mm
      maskNodata: Boolean = true,      // false = faithful quirk Q1 (RADOLAN)
      dedupeInputs: Boolean = true)    // drop duplicate (ts,row,col) readings
                                       // (overlapping recent+historical archives
                                       // would otherwise double-count rainfall)

  final case class BasinInfo(basinID: Int, areaOut: Double, attrs: Map[String, Any],
      geomOut: Geom.Polygon)

  /** Grid metadata with independent x/y resolutions (REGNIE cells are
    * 1/60° x 1/120° — NOT square; ASCII grids are square by format).
    */
  final case class GridMeta(nrows: Int, ncols: Int, t: Grid.Transform, nodata: Double)

  final case class Result(series: DataFrame, basins: Seq[BasinInfo],
      window: Grid.Window, meta: GridMeta, attrOrder: Seq[String],
      cellMap: DataFrame, values: DataFrame)

  private def gridCrsNames(cfg: Config): (String, String, Double) = cfg.datasource match {
    // (CRS for windowing in raw units, CRS of cell/divided coords, divisor Q8)
    case "radolan" => ("radolan_m", "radolan_km", 1000.0)
    case "regnie"  => ("epsg:4326", "epsg:4326", 1.0)
    case other     => throw new IllegalArgumentException(s"unknown datasource $other")
  }

  private val radolanTsFmt = DateTimeFormatter.ofPattern("yyyyMMddHHmm")

  /** LocalDateTime -> Timestamp pinned to UTC (Timestamp.valueOf would use
    * the JVM default zone and skew every label on non-UTC hosts — the
    * session timezone is UTC everywhere in this engine).
    */
  private def utcTs(ldt: LocalDateTime): Timestamp =
    Timestamp.from(ldt.toInstant(java.time.ZoneOffset.UTC))

  /** Digits-concat filename timestamp parse (reference radohydro.py:64-78).
    * REGNIE member names carry 2-digit years parsed with Python's %y pivot
    * (69-99 -> 19xx, 00-68 -> 20xx; radohydro.py:434) — Java's 'yy' (base
    * 2000) would push 1999 data into 2099.
    */
  def parseMemberTs(datasource: String, name: String): Timestamp = {
    val digits = name.replaceAll("[^0-9]", "")
    datasource match {
      case "radolan" =>
        utcTs(LocalDateTime.parse(digits.take(12), radolanTsFmt))
      case _ =>
        val yy = digits.take(2).toInt
        val year = if (yy >= 69) 1900 + yy else 2000 + yy
        val d = java.time.LocalDate.of(year, digits.slice(2, 4).toInt, digits.slice(4, 6).toInt)
        utcTs(d.atStartOfDay)
    }
  }

  /** Peek the first grid member in a directory (driver-side, reference X9:
    * the cell grid derives from the first grid only).
    */
  def peekFirstGrid(dir: String, datasource: String): GridMeta = {
    val files = Option(new java.io.File(dir).listFiles())
      .getOrElse(Array.empty).filter(_.isFile).sortBy(_.getName)
    require(files.nonEmpty, s"no grid files in $dir")
    val bytes = java.nio.file.Files.readAllBytes(files.head.toPath)
    val members = Archives.expand(files.head.getName, bytes)
      .flatMap(m => Archives.expand(m.name, m.bytes))
    require(members.hasNext, s"no members in ${files.head}")
    val m = members.next()
    if (datasource == "regnie") {
      val text = new String(m.bytes, java.nio.charset.StandardCharsets.US_ASCII)
      // minus the discarded trailer line (radohydro.py:442)
      val lines = math.max(0, text.linesIterator.size - 1)
      GridMeta(lines, Regnie.ValuesPerLine,
        Grid.Transform(Regnie.ulx, Regnie.xres, Regnie.uly, Regnie.yres),
        Regnie.Nodata.toDouble)
    } else if (isTiff(m.name)) {
      val (t, _) = GeoTiff.parse(m.bytes, rowRange = Some((0, 0)))
      GridMeta(t.nrows, t.ncols, Grid.Transform(t.ulx, t.xres, t.uly, t.yres), t.nodata)
    } else {
      val h = AsciiGrid.parseHeader(new String(m.bytes, java.nio.charset.StandardCharsets.US_ASCII))
      GridMeta(h.nrows, h.ncols, Grid.Transform(h.ulx, h.xres, h.uly, h.yres), h.nodata)
    }
  }

  private def isTiff(name: String): Boolean = {
    val n = name.toLowerCase
    n.endsWith(".tif") || n.endsWith(".tiff")
  }

  /** Run the pipeline. `gridDir` holds raster files (plain .asc, .tar,
    * .tar.gz or .gz members); `shpPath` the basin polygons.
    */
  def run(spark: SparkSession, gridDir: String, shpPath: String,
      cfg: Config = Config()): Result = {
    import spark.implicits._
    val (rawCrsName, cellCrsName, divisor) = gridCrsNames(cfg)
    val rawCrs = Crs.of(rawCrsName)
    val shapeCrs = Crs.of(cfg.shapeCrs)
    val outCrs = Crs.of(cfg.outCrs)

    // --- basin dimension (driver-side: small; broadcast below) -------------
    val layer = Shp.read(shpPath)
    val basinsRaw = layer.features.zipWithIndex.map { case (f, i) =>
      (i + 1, f.geom, f.attrs) // basinID in polygon order (geotools.py:213)
    }
    val basinInfos = basinsRaw.map { case (id, g, attrs) =>
      val gOut = Crs.reproject(g, shapeCrs, outCrs)
      BasinInfo(id, Geom.area(gOut), attrs, gOut) // Q10 area + output-CRS geometry
    }

    // --- window from first grid + basin bounds (X1/X9, Q6/Q7) --------------
    val meta = peekFirstGrid(gridDir, cfg.datasource)
    val t = meta.t
    val basinsRawCrs = basinsRaw.map { case (id, g, _) => (id, Crs.reproject(g, shapeCrs, rawCrs)) }
    val allBounds = {
      val bs = basinsRawCrs.map { case (_, g) => Geom.bbox(g) }
      (bs.map(_._1).min, bs.map(_._2).min, bs.map(_._3).max, bs.map(_._4).max)
    }
    val win = Grid.bufferedWindow(t, meta.nrows, meta.ncols, allBounds, cfg.bufferCells)
    val tShift = Grid.shifted(t, win)

    // --- basin -> cell map (grid-bucketed spatial join, J2) -----------------
    val basinsDf = basinsRawCrs.map { case (id, g) =>
      // cell coordinates are divided by `divisor` (Q8) — bring basins to the
      // same space: raw grid CRS coords / divisor == cellCrsName units
      (id, g.map(r => r.map(_ / divisor).toSeq).toSeq)
    }.toDF("basinID", "geom")
    val cellMap = SpatialPipeline.basinCellMap(
      basinsDf, tShift, win.nrows, win.ncols, divisor, cellCrsName, cfg.outCrs)

    // --- distributed raster scan with window pushdown -----------------------
    val ds = cfg.datasource
    val (rLo, rHi, cLo, cHi) = (win.rowLo, win.rowHi, win.colLo, win.colHi)
    val mask = cfg.maskNodata
    val (startTs, endTs) = (
      cfg.startDate.map(s => utcTs(LocalDateTime.parse(s + "0000", radolanTsFmt))),
      cfg.endDate.map(s => utcTs(LocalDateTime.parse(s + "2359", radolanTsFmt))))
    val bin = spark.read.format("binaryFile").load(gridDir)
      .select("path", "content").as[(String, Array[Byte])]
    val values: Dataset[(Timestamp, Int, Int, java.lang.Double)] = bin.flatMap { case (path, bytes) =>
      val fname = path.substring(path.lastIndexOf('/') + 1)
      Archives.expand(fname, bytes)
        .filter { m =>
          // S4 inter-level pruning (radohydro.py:296-297): skip a nested
          // daily archive entirely when its name-carried date is out of
          // range — members are never decompressed. RADOLAN names carry
          // yyyyMMdd (8 digits); REGNIE daily members carry yyMMdd (6,
          // Python %y pivot).
          val digits = m.name.replaceAll("[^0-9]", "")
          if (startTs.isEmpty && endTs.isEmpty) true
          else {
            val day8 =
              if (digits.length >= 8) Some(digits.take(8))
              else if (digits.length >= 6) {
                val yy = digits.take(2).toInt
                val year = if (yy >= 69) 1900 + yy else 2000 + yy
                Some(f"$year%04d" + digits.slice(2, 6))
              } else None
            day8 match {
              case None => true
              case Some(d8) =>
                try {
                  val dayStart = utcTs(LocalDateTime.parse(d8 + "0000", radolanTsFmt))
                  val dayEnd = utcTs(LocalDateTime.parse(d8 + "2359", radolanTsFmt))
                  startTs.forall(!dayEnd.before(_)) && endTs.forall(!dayStart.after(_))
                } catch { case _: Exception => true }
            }
          }
        }
        .flatMap(m => Archives.expand(m.name, m.bytes))
        .flatMap { m =>
          val ts = parseMemberTs(ds, m.name)
          val inRange = startTs.forall(!ts.before(_)) && endTs.forall(!ts.after(_))
          if (!inRange) Iterator.empty
          else {
            val text = new String(m.bytes, java.nio.charset.StandardCharsets.US_ASCII)
            if (ds == "regnie") {
              Regnie.parseFile(text, keepNodata = true,
                  rowRange = Some((rLo, rHi))).flatMap { c =>
                if (c.col < cLo || c.col >= cHi) Iterator.empty
                else {
                  val v: java.lang.Double =
                    if (c.value.isNaN) { if (mask) null else java.lang.Double.valueOf(Regnie.Nodata.toDouble) }
                    else java.lang.Double.valueOf(c.value)
                  Iterator.single((ts, c.row - rLo, c.col - cLo, v))
                }
              }
            } else if (isTiff(m.name)) {
              val (t, cells) = GeoTiff.parse(m.bytes, Some((rLo, rHi)), Some((cLo, cHi)))
              cells.map { c =>
                val v: java.lang.Double =
                  if (mask && c.value == t.nodata) null else java.lang.Double.valueOf(c.value)
                (ts, c.row - rLo, c.col - cLo, v)
              }
            } else {
              val (h, cells) = AsciiGrid.parse(text, Some((rLo, rHi)), Some((cLo, cHi)))
              cells.map { c =>
                val v: java.lang.Double =
                  if (mask && c.value == h.nodata) null else java.lang.Double.valueOf(c.value)
                (ts, c.row - rLo, c.col - cLo, v)
              }
            }
          }
        }
    }
    // the values frame is already window-clipped, so this dedup shuffles only
    // the clipped working set, not the raw raster
    val valuesDf0 = values.toDF("ts", "row", "col", "v")
    val valuesDf =
      if (cfg.dedupeInputs) valuesDf0.dropDuplicates("ts", "row", "col") else valuesDf0

    // --- weighted aggregation (A2/A3/A4) ------------------------------------
    val series = SpatialPipeline.weightedSeries(valuesDf, cellMap, cfg.numerator)
    Result(series, basinInfos, win, meta, layer.fields.map(_._1), cellMap, valuesDf)
  }
}
