package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch profiler: times one SparkEntry query N times back-to-back so the
  * cost of shared-cache population (first run) vs steady state (later runs)
  * is visible. Not part of the driver surface.
  */
object Prof {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.codegen.wholeStage", sys.env.getOrElse("SPARK_GRAFT_WSCG", "true"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val jobStart = scala.collection.mutable.Map[Int, Long]()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobStart(js.jobId) = System.nanoTime()
      override def onJobEnd(je: org.apache.spark.scheduler.SparkListenerJobEnd): Unit =
        jobStart.remove(je.jobId).foreach { t0 =>
          println(f"[job] ${je.jobId}%3d ${(System.nanoTime() - t0) / 1e9}%6.2f s")
        }
    })
    try graft.SparkEntry.entry(spark).count() catch { case _: Throwable => () }
    try graft.Tables.documents(spark, sfDir).cache().count() catch { case _: Throwable => () }
    try graft.Tables.embeddings(spark, sfDir).cache().count() catch { case _: Throwable => () }
    for (name <- args; i <- 1 to 3) {
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      println(f"[prof] $name run$i ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
