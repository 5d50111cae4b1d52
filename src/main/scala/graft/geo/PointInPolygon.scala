package graft.geo

/** Point-in-polygon (ray casting, even-odd rule) — the primitive behind the
  * reference's `rasterize` path (geotools/geotools.py:363-367, SURVEY F17).
  * Holes are handled by the even-odd rule automatically (a point inside a
  * hole ring crosses boundaries twice).
  */
object PointInPolygon {

  def ringContains(r: Geom.Ring, x: Double, y: Double): Boolean = {
    val n = r.length / 2
    var inside = false
    var i = 0
    var j = n - 1
    while (i < n) {
      val xi = r(2 * i); val yi = r(2 * i + 1)
      val xj = r(2 * j); val yj = r(2 * j + 1)
      if (((yi > y) != (yj > y)) &&
          (x < (xj - xi) * (y - yi) / (yj - yi) + xi)) inside = !inside
      j = i
      i += 1
    }
    inside
  }

  /** Even-odd over all rings: inside the polygon iff inside an odd number of
    * rings (outer minus holes).
    */
  def contains(p: Geom.Polygon, x: Double, y: Double): Boolean = {
    var crossings = 0
    var i = 0
    while (i < p.length) {
      if (ringContains(p(i), x, y)) crossings += 1
      i += 1
    }
    crossings % 2 == 1
  }
}
