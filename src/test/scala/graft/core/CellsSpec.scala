package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** The standalone cell frame (K3 cell-grid surface + reference
  * create_footprint_cells semantics, geotools.py:105-152).
  */
class CellsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("cellFrame generates one box per (row, col) with divisor applied") {
    val t = Grid.Transform(2000.0, 1000.0, 5000.0, -1000.0)
    val df = Cells.cellFrame(spark, t, 2, 3, divisor = 1000.0)
      .withColumn("cell_area", Cells.cellAreaCol)
    val rows = df.collect().map(r =>
      (r.getInt(0), r.getInt(1)) ->
        (r.getDouble(2), r.getDouble(5), r.getDouble(3), r.getDouble(4), r.getDouble(6)))
      .toMap // (row,col) -> (xmin, ymin, xmax, ymax, area) — note select order
    assert(rows.size == 6)
    // cell (0,0): x [2,3] km, y [4,5] km (row 0 = north, divisor km)
    val (xmin, ymin, xmax, ymax, area) = rows((0, 0))
    assert(xmin == 2.0 && xmax == 3.0 && ymin == 4.0 && ymax == 5.0)
    assert(math.abs(area - 1.0) < 1e-12)
    // cell (1,2): x [4,5], y [3,4]
    val c12 = rows((1, 2))
    assert(c12._1 == 4.0 && c12._3 == 5.0 && c12._2 == 3.0 && c12._4 == 4.0)
  }
}
