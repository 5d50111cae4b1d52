package graft.out

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._
import graft.api.RadoHydro.BasinInfo

/** Output sinks (SURVEY K1/K2).
  *
  * [[CsvSink.writeFaithful]] reproduces the reference's per-basin CSV bytes
  * (geotools/geotools.py:295-319) including quirk Q3 — the zero-pad width is
  * `ceil(ln(n))` with the NATURAL log — and Q10 (basin_area = area of the
  * original basin polygon in the output CRS, 3 dp). The final series is
  * |basins| x |timestamps| — inherently driver-sized, like the reference's
  * files. [[CsvSink.writeScalable]] is the cluster path: one partition
  * directory per basin via partitionBy, no driver materialization.
  */
object CsvSink {

  /** DEFAULT sink entry: the cluster-scale [[writeScalable]] path (one
    * partition directory per basin, fully distributed). `faithful = true`
    * opts into the reference's byte-identical per-basin CSVs — that path
    * collects the |basins| x |timestamps| series to the driver (bounded,
    * but inherently non-distributed), so it is NOT the default. Returns the
    * written file paths (faithful) or the output directory (scalable).
    */
  def write(series: DataFrame, basins: Seq[BasinInfo], outDir: String,
      faithful: Boolean = false, outName: String = "radohydro",
      header: String = "rainfall[mm/h]"): Seq[String] =
    if (faithful) writeFaithful(series, basins, outDir, outName, header)
    else { writeScalable(series, outDir); Seq(outDir) }

  /** Q3: zfill width via natural log (geotools.py:300). */
  def zfillWidth(nBasins: Int): Int =
    math.ceil(math.log(nBasins.toDouble)).toInt

  private def fmtValue(v: Double): String =
    if (v.isNaN) "nan"
    else {
      // np.around(x, 3) rounds half-to-even; then str() of the float
      val r = BigDecimal(v).setScale(3, BigDecimal.RoundingMode.HALF_EVEN).toDouble
      if (r == r.toLong.toDouble) s"${r.toLong}.0" else r.toString
    }

  /** Write one CSV per basin: header lines + (yyMMddHHmm, value) rows. */
  def writeFaithful(series: DataFrame, basins: Seq[BasinInfo], outDir: String,
      outName: String = "radohydro", header: String = "rainfall[mm/h]"): Seq[String] = {
    Files.createDirectories(Paths.get(outDir))
    // order by the timestamp itself, not its 2-digit-year string (lexical
    // 'yyMMddHHmm' order breaks across the 1999->2000 boundary)
    val rows = series
      .select(col("basinID"), date_format(col("ts"), "yyMMddHHmm").as("tstr"),
        col("rain"), col("ts"))
      .orderBy("basinID", "ts")
      .collect()
    val width = zfillWidth(basins.size)
    val byBasin = rows.groupBy(_.getInt(0))
    basins.flatMap { b =>
      byBasin.get(b.basinID).map { rs =>
        val id = b.basinID.toString
        val padded = ("0" * math.max(0, width - id.length)) + id
        val path = Paths.get(outDir, s"${outName}_$padded.csv")
        val sb = new StringBuilder
        sb ++= f"basin ID: ${b.basinID}%d\n"
        sb ++= f"basin_area: ${b.areaOut}%.3f\n"
        sb ++= s"Time[yymmddhh],$header\n"
        rs.foreach { r => sb ++= s"${r.getString(1)},${fmtValue(r.getDouble(2))}\n" }
        Files.write(path, sb.toString.getBytes("UTF-8"))
        path.toString
      }
    }
  }

  /** Cluster-scale variant: long CSV partitioned by basin, no collect. */
  def writeScalable(series: DataFrame, outDir: String): Unit =
    series
      .select(col("basinID"), date_format(col("ts"), "yyMMddHHmm").as("time"),
        round(col("rain"), 3).as("rainfall_mm"))
      .repartition(col("basinID"))
      .sortWithinPartitions("time")
      .write.mode(SaveMode.Overwrite)
      .partitionBy("basinID")
      .option("header", "true")
      .csv(outDir)
}

/** K2 — wide table: one column per timestamp (pivot at the sink only;
  * SURVEY U4). Keeps the reference's documented <500-column guard
  * (README:17, geotools.py:321) as a hard check, writing parquet instead of
  * the dbase-limited shapefile.
  */
object WideSink {

  /** The reference's actual K2 output: basin polygons + one numeric dbf
    * column per timestamp + BasinIDNew, as a real shapefile (readable back
    * by [[graft.ingest.Shp]]). Honors the <500-column dbase guard.
    *
    * Sane default sorts features by basinID. `faithful = true` reproduces
    * quirk Q2 (geotools/geotools.py:324-325): the reference argsorts the
    * VALUE MATRIX by its last data column (`polyg_values[:, -2]`, NaN last)
    * and writes those rows back into the geodataframe WITHOUT reordering
    * geometries or the original attributes — so with >1 differently-ordered
    * timestep, rainfall columns + BasinIDNew are misaligned with the
    * polygons they describe.
    */
  def writeShapefile(series: DataFrame, basins: Seq[BasinInfo], attrOrder: Seq[String],
      basePath: String, maxCols: Int = 500, faithful: Boolean = false): Boolean = {
    val rows = series
      .select(col("basinID"), date_format(col("ts"), "yyMMddHHmm").as("t"),
        col("rain"), col("ts"))
      .orderBy("ts")
      .collect()
    val tsCols = rows.map(_.getString(1)).distinct.toSeq // chronological order
    if (tsCols.size >= maxCols) return false
    val byBasin = rows.groupBy(_.getInt(0))
      .view.mapValues(_.map(r => r.getString(1) -> r.getDouble(2)).toMap).toMap
    if (faithful) {
      // geometries + original attrs stay in input (gdfbnd) order; the data
      // matrix rows are sorted by the LAST timestamp column independently
      val dataRows = basins.map { b =>
        val ts2v = byBasin.getOrElse(b.basinID, Map.empty[String, Double])
        (b.basinID, tsCols.map(t => ts2v.getOrElse(t, Double.NaN)))
      }
      val sortedRows = dataRows.sortBy { case (_, vals) =>
        val last = vals.lastOption.getOrElse(Double.NaN)
        (last.isNaN, last) // np.argsort: NaN sorts last
      }
      val attrs = basins.zip(sortedRows).map { case (b, (sortedId, vals)) =>
        b.attrs ++ tsCols.zip(vals.map(v => v: Any)).toMap +
          ("BasinIDNew" -> sortedId.toLong)
      }
      ShpWriter.write(basePath, basins.map(_.geomOut).toSeq, attrs,
        attrOrder ++ tsCols :+ "BasinIDNew")
    } else {
      val ordered = basins.sortBy(_.basinID)
      val attrs = ordered.map { b =>
        val ts2v = byBasin.getOrElse(b.basinID, Map.empty[String, Double])
        b.attrs ++
          tsCols.map(t => t -> (ts2v.getOrElse(t, Double.NaN): Any)).toMap +
          ("BasinIDNew" -> b.basinID.toLong)
      }
      ShpWriter.write(basePath, ordered.map(_.geomOut).toSeq, attrs,
        attrOrder ++ tsCols :+ "BasinIDNew")
    }
    true
  }

  def write(series: DataFrame, outPath: String, maxCols: Int = 500): Boolean = {
    val tsCols = series.select(col("ts"), date_format(col("ts"), "yyMMddHHmm").as("t"))
      .distinct().orderBy("ts").collect().map(_.getString(1))
    if (tsCols.length >= maxCols) false
    else {
      series
        .groupBy("basinID")
        .pivot(date_format(col("ts"), "yyMMddHHmm"), tsCols.toIndexedSeq)
        .agg(first("rain"))
        .orderBy("basinID")
        .write.mode(SaveMode.Overwrite).parquet(outPath)
      true
    }
  }
}
