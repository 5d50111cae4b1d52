package graft.api

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Temporal resampling for basin series (the reference's users' first
  * downstream step: hourly RADOLAN -> daily/monthly totals, pandas
  * `resample('D').sum()`), plus explicit gap filling — a resampled series
  * with silent holes misreads as zero rain, so missing buckets surface as
  * NaN (sane) or a chosen fill.
  *
  * All operators are groupBy/sequence+join formulations: partial
  * aggregation map-side, the calendar spine generated per group — no
  * driver-side date loops, scale-independent.
  */
object Resample {

  /** Sum a (basinID, ts, rain) series into truncated calendar buckets.
    * @param unit "day", "month", ... (date_trunc unit)
    */
  def aggregate(series: DataFrame, unit: String = "day"): DataFrame =
    series
      .groupBy(col("basinID"), date_trunc(unit, col("ts")).as("bucket"))
      .agg(sum(col("rain")).as("rain"), count(lit(1)).as("n_obs"))

  /** Complete each basin's series over the FULL bucket range (min..max over
    * the whole frame): missing buckets appear with `fill` (default NaN).
    */
  def fillGaps(bucketed: DataFrame, stepExpr: String = "interval 1 day",
      fill: Double = Double.NaN): DataFrame = {
    val bounds = bucketed.agg(
      min(col("bucket")).as("lo"), max(col("bucket")).as("hi"))
    val spine = bucketed.select(col("basinID")).distinct()
      .crossJoin(broadcast(bounds))
      .select(col("basinID"),
        explode(expr(s"sequence(lo, hi, $stepExpr)")).as("bucket"))
    spine.join(bucketed, Seq("basinID", "bucket"), "left")
      .select(col("basinID"), col("bucket"),
        coalesce(col("rain"), lit(fill)).as("rain"),
        coalesce(col("n_obs"), lit(0L)).as("n_obs"))
  }
}
