package graft.sources

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.core.TestSpark
import graft.ingest.{Archives, AsciiGrid}

class AsciiGridSourceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val fmt = "graft.sources.AsciiGridSource"

  private lazy val dir: String = {
    val d = Files.createTempDirectory("dsv2_grid").toString
    val h = AsciiGrid.Header(6, 5, 0, 0, 1000.0, -1.0)
    for (hour <- 0 until 2) {
      val vals = Array.tabulate(5, 6)((r, c) => (r * 10 + c + hour * 100).toDouble)
      val members = Seq(Archives.Member(f"RW_20180101_$hour%02d50.asc",
        AsciiGrid.render(h, vals).getBytes))
      Files.write(Paths.get(d, f"RW-20180101-$hour.tar"), Archives.tar(members))
    }
    d
  }

  test("reads tar'd grids with schema (ts,row,col,value)") {
    val df = spark.read.format(fmt).load(dir)
    assert(df.columns.toSeq == Seq("ts", "row", "col", "value"))
    assert(df.count() == 2 * 5 * 6)
    val r = df.where(col("row") === 2 && col("col") === 3).orderBy("ts").collect()
    assert(r.map(_.getDouble(3)).toSeq == Seq(23.0, 123.0))
    assert(r.head.getTimestamp(0).toString.startsWith("2018-01-01 00:50"))
  }

  test("row/col filters are pushed into the parser (scan description) and correct") {
    val df = spark.read.format(fmt).load(dir)
      .where(col("row").between(1, 3) && col("col") >= 4)
    val scanDesc = df.queryExecution.executedPlan.toString
    assert(scanDesc.contains("window rows=[1,3] cols=[4,"), s"plan was:\n$scanDesc")
    val rows = df.collect()
    assert(rows.length == 2 * 3 * 2) // rows 1-3, cols 4-5, 2 timestamps
    assert(rows.forall(r => r.getInt(1) >= 1 && r.getInt(1) <= 3 && r.getInt(2) >= 4))
  }

  test("residual ts filter still applies post-scan") {
    val df = spark.read.format(fmt).load(dir)
      .where(col("value") > 100 && col("row") === 0)
    val rows = df.collect()
    assert(rows.length == 5) // second hour only, row 0, cols 1-5 (col 0 is exactly 100)
    assert(rows.forall(_.getDouble(3) > 100))
  }

  test("equality pushdown narrows to a single cell") {
    val one = spark.read.format(fmt).load(dir)
      .where(col("row") === 4 && col("col") === 0).collect()
    assert(one.length == 2 && one.forall(r => r.getInt(1) == 4 && r.getInt(2) == 0))
  }
}
