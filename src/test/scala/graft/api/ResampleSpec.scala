package graft.api

import java.sql.Timestamp
import org.scalatest.funsuite.AnyFunSuite
import graft.core.TestSpark

class ResampleSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("daily aggregation + gap fill completes the calendar spine") {
    import spark.implicits._
    def ts(s: String) = Timestamp.valueOf(s)
    // basin 1: days 1 and 3 (day 2 missing); basin 2: day 2 only
    val series = Seq(
      (1, ts("2018-01-01 00:50:00"), 1.5),
      (1, ts("2018-01-01 05:50:00"), 2.5),
      (1, ts("2018-01-03 10:50:00"), 4.0),
      (2, ts("2018-01-02 07:50:00"), 7.0)
    ).toDF("basinID", "ts", "rain")
    val daily = Resample.aggregate(series, "day")
    val filled = Resample.fillGaps(daily).collect()
      .map(r => (r.getInt(0), r.getTimestamp(1).toString.take(10),
        r.getDouble(2), r.getLong(3))).toSet
    // 2 basins x 3 days = 6 rows, missing buckets NaN with 0 observations
    assert(filled.size == 6)
    assert(filled.contains((1, "2018-01-01", 4.0, 2L)))
    assert(filled.exists(r => r._1 == 1 && r._2 == "2018-01-02" && r._3.isNaN && r._4 == 0L))
    assert(filled.contains((1, "2018-01-03", 4.0, 1L)))
    assert(filled.contains((2, "2018-01-02", 7.0, 1L)))
    assert(filled.exists(r => r._1 == 2 && r._2 == "2018-01-01" && r._3.isNaN))
    assert(filled.exists(r => r._1 == 2 && r._2 == "2018-01-03" && r._3.isNaN))
  }

  test("monthly aggregation buckets by calendar month") {
    import spark.implicits._
    def ts(s: String) = Timestamp.valueOf(s)
    val series = Seq(
      (1, ts("2018-01-15 00:00:00"), 1.0),
      (1, ts("2018-01-20 00:00:00"), 2.0),
      (1, ts("2018-02-01 00:00:00"), 5.0)
    ).toDF("basinID", "ts", "rain")
    val monthly = Resample.aggregate(series, "month").collect()
      .map(r => r.getTimestamp(1).toString.take(7) -> r.getDouble(2)).toMap
    assert(monthly == Map("2018-01" -> 3.0, "2018-02" -> 5.0))
  }
}
