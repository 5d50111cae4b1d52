package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables

// Throwaway profiling probe — not part of the library surface.
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.HashRegistry.register(spark)
    val li = Tables.lineitem(spark, sfDir)
    li.cache().count()

    def time(name: String)(f: => Unit): Unit = {
      for (i <- 1 to 3) {
        val t0 = System.nanoTime()
        f
        println(f"[scratch] $name run$i ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    }

    time("conv_hash60") {
      li.select(conv(substring(md5(col("l_orderkey").cast(StringType)), 1, 15), 16, 10).cast(LongType).as("h"))
        .agg(sum(col("h") % 1000)).collect()
    }
    time("graft_hash60") {
      li.select(expr("graft_hash60(CAST(l_orderkey AS STRING))").as("h"))
        .agg(sum(col("h") % 1000)).collect()
    }
    time("bin_rho") {
      li.select(expr("graft_hash60(CAST(l_orderkey AS STRING))").as("h"))
        .withColumn("w", expr("h div 256"))
        .select((lit(53) - length(bin(col("w")))).as("rho"))
        .agg(sum(col("rho"))).collect()
    }
    time("countdistinct") {
      li.groupBy("l_returnflag").agg(countDistinct("l_orderkey")).collect()
    }
    spark.stop()
  }
}
