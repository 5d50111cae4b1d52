package graft.geo

/** Planar geometry core for the engine.
  *
  * Model (SURVEY.md §1.1): a polygon is an array of rings; a ring is a packed
  * coordinate array `[x0,y0,x1,y1,...]` (not closed — last point != first).
  * Outer rings are CCW (positive shoelace), holes CW (negative), so the
  * polygon area is the plain signed-sum of ring areas. Multipolygons are just
  * more rings in the same array — the signed-area convention makes every
  * area/clip computation ring-local, which is what lets the hot spatial-join
  * path stay a flat `Seq[Seq[Double]]` Spark column (no geometry objects, no
  * JVM boxing beyond the arrays themselves).
  *
  * Mirrors the semantics of the reference's GEOS usage (shapely `.area`,
  * `box`, `total_bounds`): /root/reference/geotools/geotools.py:86,142-147,211.
  */
object Geom {

  type Ring = Array[Double]       // packed x0,y0,x1,y1,...
  type Polygon = Array[Ring]      // outer rings CCW, holes CW

  /** Signed shoelace area of one packed ring (positive = CCW). */
  def ringArea(r: Ring): Double = {
    val n = r.length / 2
    if (n < 3) return 0.0
    var sum = 0.0
    var i = 0
    while (i < n) {
      val j = (i + 1) % n
      sum += r(2 * i) * r(2 * j + 1) - r(2 * j) * r(2 * i + 1)
      i += 1
    }
    0.5 * sum
  }

  /** Polygon area = signed sum over rings (holes subtract). */
  def area(p: Polygon): Double = {
    var s = 0.0
    var i = 0
    while (i < p.length) { s += ringArea(p(i)); i += 1 }
    s
  }

  /** (xmin, ymin, xmax, ymax) over all rings; NaN-free inputs assumed. */
  def bbox(p: Polygon): (Double, Double, Double, Double) = {
    var xmin = Double.PositiveInfinity; var ymin = Double.PositiveInfinity
    var xmax = Double.NegativeInfinity; var ymax = Double.NegativeInfinity
    var i = 0
    while (i < p.length) {
      val r = p(i)
      var k = 0
      while (k < r.length) {
        val x = r(k); val y = r(k + 1)
        if (x < xmin) xmin = x
        if (x > xmax) xmax = x
        if (y < ymin) ymin = y
        if (y > ymax) ymax = y
        k += 2
      }
      i += 1
    }
    (xmin, ymin, xmax, ymax)
  }

  /** Ensure the ring at index 0 is CCW-positive, holes negative — used by
    * readers to normalize shapefile winding (shp outer=CW, holes=CCW).
    */
  def reversed(r: Ring): Ring = {
    val n = r.length / 2
    val out = new Array[Double](r.length)
    var i = 0
    while (i < n) {
      out(2 * i) = r(2 * (n - 1 - i))
      out(2 * i + 1) = r(2 * (n - 1 - i) + 1)
      i += 1
    }
    out
  }

  /** Axis-aligned box as a CCW ring. */
  def boxRing(xmin: Double, ymin: Double, xmax: Double, ymax: Double): Ring =
    Array(xmin, ymin, xmax, ymin, xmax, ymax, xmin, ymax)

  /** Apply a pointwise transform to every vertex. */
  def mapPoints(p: Polygon)(f: (Double, Double) => (Double, Double)): Polygon =
    p.map { r =>
      val out = new Array[Double](r.length)
      var k = 0
      while (k < r.length) {
        val (x, y) = f(r(k), r(k + 1))
        out(k) = x; out(k + 1) = y
        k += 2
      }
      out
    }
}
