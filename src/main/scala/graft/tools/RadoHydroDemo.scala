package graft.tools

import org.apache.spark.sql.SparkSession
import graft.api.RadoHydro
import graft.out.CsvSink

/** CLI entry for the radohydro pipeline: grid archive dir + basin shapefile
  * -> per-basin rainfall series printed and written as faithful CSVs.
  *
  * Usage: runMain graft.tools.RadoHydroDemo <gridDir> <shpPath> <outDir>
  *        [datasource=radolan|regnie] [start=yyyyMMdd] [end=yyyyMMdd]
  */
object RadoHydroDemo {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: RadoHydroDemo <gridDir> <shpPath> <outDir> [datasource] [start] [end]")
    val Array(gridDir, shpPath, outDir) = args.take(3)
    val datasource = if (args.length > 3) args(3) else "radolan"
    val cfg = RadoHydro.Config(
      datasource = datasource,
      startDate = if (args.length > 4) Some(args(4)) else None,
      endDate = if (args.length > 5) Some(args(5)) else None)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .appName("radohydro")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val res = RadoHydro.run(spark, gridDir, shpPath, cfg)
    println(s"window=${res.window} meta=${res.meta}")
    res.series.orderBy("basinID", "ts").show(24, truncate = false)
    val files = CsvSink.writeFaithful(res.series, res.basins, outDir)
    println(s"wrote ${files.size} basin CSVs to $outDir")
    files.take(2).foreach(f => println(s"--- $f\n" +
      new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(f)))))
    spark.stop()
  }
}
