package graft.core

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper

/** Bucketed co-located join: writing both join sides bucketed by the join
  * key lets Spark plan a SortMergeJoin with ZERO Exchange — the 100 TB
  * recipe for repeated fact-fact joins (pay the shuffle once at write time,
  * never at read time). Asserted at plan level.
  */
class BucketingSpec extends AnyFunSuite with AdaptiveSparkPlanHelper {
  private lazy val spark = TestSpark.spark

  test("join of two tables bucketed on the key plans with no shuffle exchange") {
    // warehouse dir is a static conf — use the session default (repo-local
    // spark-warehouse/); tables are dropped in the finally block
    spark.sql("DROP TABLE IF EXISTS li_bucketed")
    spark.sql("DROP TABLE IF EXISTS o_bucketed")
    val sfDir = "/root/testdata/sf0.001"
    graft.Tables.lineitem(spark, sfDir)
      .select("l_orderkey", "l_quantity", "l_extendedprice")
      .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("li_bucketed")
    graft.Tables.orders(spark, sfDir)
      .select("o_orderkey", "o_orderdate", "o_totalprice")
      .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("o_bucketed")
    // disable broadcast so the join would otherwise need a full shuffle
    val prior = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("li_bucketed")
        .join(spark.table("o_bucketed"), col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderdate").agg(sum("l_quantity").as("q"))
      joined.collect()
      val shuffles = collect(joined.queryExecution.executedPlan) {
        case s: ShuffleExchangeExec => s
      }
      // the join itself is exchange-free; only the groupBy on a NON-bucket
      // key shuffles (its input is the joined stream, unavoidable)
      assert(shuffles.size <= 1,
        s"bucketed join must not shuffle its inputs:\n${joined.queryExecution.executedPlan}")
      val planStr = joined.queryExecution.executedPlan.toString
      assert(planStr.contains("SortMergeJoin") || planStr.contains("ShuffledHashJoin"))
      // sanity: equal to the unbucketed computation
      val expected = graft.Tables.lineitem(spark, sfDir)
        .join(graft.Tables.orders(spark, sfDir), col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderdate").agg(sum("l_quantity").as("q"))
        .collect().map(r => r.get(0) -> r.get(1)).toMap
      val got = joined.collect().map(r => r.get(0) -> r.get(1)).toMap
      assert(got == expected)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prior)
      spark.sql("DROP TABLE IF EXISTS li_bucketed")
      spark.sql("DROP TABLE IF EXISTS o_bucketed")
    }
  }
}
