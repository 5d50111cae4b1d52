package graft.geo

import org.scalatest.funsuite.AnyFunSuite

class GeomSpec extends AnyFunSuite {
  test("shoelace area of unit square (CCW positive)") {
    assert(Geom.ringArea(Geom.boxRing(0, 0, 1, 1)) === 1.0)
    assert(Geom.ringArea(Geom.reversed(Geom.boxRing(0, 0, 1, 1))) === -1.0)
  }

  test("polygon area with hole subtracts") {
    val outer = Geom.boxRing(0, 0, 10, 10)
    val hole = Geom.reversed(Geom.boxRing(2, 2, 4, 4)) // CW = negative
    assert(Geom.area(Array(outer, hole)) === 100.0 - 4.0)
  }

  test("triangle area") {
    val tri: Geom.Ring = Array(0, 0, 4, 0, 0, 3)
    assert(Geom.ringArea(tri) === 6.0)
  }

  test("bbox") {
    val p: Geom.Polygon = Array(Array(1, 2, 5, -1, 3, 7))
    assert(Geom.bbox(p) === ((1.0, -1.0, 5.0, 7.0)))
  }
}

class ClipSpec extends AnyFunSuite {
  private val sq = Geom.boxRing _

  test("polygon fully inside box unchanged in area") {
    val p: Geom.Polygon = Array(sq(2, 2, 4, 4))
    assert(math.abs(Clip.clipArea(p, 0, 0, 10, 10) - 4.0) < 1e-12)
  }

  test("box fully inside polygon clips to box") {
    val p: Geom.Polygon = Array(sq(0, 0, 10, 10))
    assert(math.abs(Clip.clipArea(p, 3, 3, 5, 6) - 6.0) < 1e-12)
  }

  test("half overlap") {
    val p: Geom.Polygon = Array(sq(0, 0, 2, 2))
    assert(math.abs(Clip.clipArea(p, 1, 0, 3, 2) - 2.0) < 1e-12)
  }

  test("disjoint clips to zero") {
    val p: Geom.Polygon = Array(sq(0, 0, 1, 1))
    assert(Clip.clipArea(p, 5, 5, 6, 6) === 0.0)
  }

  test("concave subject (L-shape) clips exactly") {
    // L-shape: 3x3 square minus top-right 2x2 => area 5
    val l: Geom.Ring = Array(0, 0, 3, 0, 3, 1, 1, 1, 1, 3, 0, 3)
    assert(math.abs(Geom.ringArea(l) - 5.0) < 1e-12)
    // clip to right half x>=1.5: remaining: x in [1.5,3], y in [0,1] => 1.5
    assert(math.abs(Clip.clipArea(Array(l), 1.5, -1, 4, 4) - 1.5) < 1e-12)
    // clip to top half y>=1: remaining: x in [0,1], y in [1,3] => 2
    assert(math.abs(Clip.clipArea(Array(l), -1, 1, 4, 4) - 2.0) < 1e-12)
  }

  test("hole interacts with clip window") {
    val poly: Geom.Polygon = Array(sq(0, 0, 10, 10), Geom.reversed(sq(4, 4, 6, 6)))
    // window covers half the hole: box [0,0,5,10] area 50, hole part [4,4,5,6] area 2
    assert(math.abs(Clip.clipArea(poly, 0, 0, 5, 10) - 48.0) < 1e-12)
  }

  test("degenerate touch (shared edge) yields zero-area, dropped") {
    val p: Geom.Polygon = Array(sq(0, 0, 1, 1))
    val clipped = Clip.clipPolygonToBox(p, 1, 0, 2, 1) // touches at x=1 only
    assert(clipped.isEmpty)
  }

  test("property: clip area bounded by min(poly area, box area); union over a cover = poly area") {
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 200) {
      val x1 = rnd.nextDouble() * 8; val y1 = rnd.nextDouble() * 8
      val poly: Geom.Polygon =
        Array(sq(x1, y1, x1 + 1 + rnd.nextDouble() * 4, y1 + 1 + rnd.nextDouble() * 4))
      val pa = Geom.area(poly)
      // 4x4 grid of 4-unit cells covering [0,16)x[0,16) fully contains the poly
      var total = 0.0
      for (i <- 0 until 4; j <- 0 until 4) {
        val ca = Clip.clipArea(poly, i * 4.0, j * 4.0, (i + 1) * 4.0, (j + 1) * 4.0)
        assert(ca >= -1e-9 && ca <= math.min(pa, 16.0) + 1e-9)
        total += ca
      }
      assert(math.abs(total - pa) < 1e-9)
    }
  }

  test("property: random concave polygons — cover partition sums to polygon area") {
    val rnd = new scala.util.Random(7)
    for (_ <- 1 to 100) {
      // star-shaped (possibly concave) polygon around a center, CCW by angle sort
      val cx = 4 + rnd.nextDouble() * 8; val cy = 4 + rnd.nextDouble() * 8
      // anchor one angle per quadrant so the max gap < pi, guaranteeing the
      // center stays in the kernel (angular sort then yields a simple polygon)
      val k = 5 + rnd.nextInt(6)
      val angles = (Array.fill(k - 4)(rnd.nextDouble() * 2 * math.Pi) ++
        Array.tabulate(4)(q => q * math.Pi / 2 + rnd.nextDouble() * math.Pi / 2)).sorted
      val ring = new Array[Double](2 * k)
      for (i <- 0 until k) {
        val r = 0.5 + rnd.nextDouble() * 3.5
        ring(2 * i) = cx + r * math.cos(angles(i))
        ring(2 * i + 1) = cy + r * math.sin(angles(i))
      }
      val poly: Geom.Polygon = Array(ring)
      val pa = Geom.area(poly)
      assert(pa >= 0)
      var total = 0.0
      for (i <- 0 until 4; j <- 0 until 4)
        total += Clip.clipArea(poly, i * 4.0, j * 4.0, (i + 1) * 4.0, (j + 1) * 4.0)
      assert(math.abs(total - pa) < 1e-9, s"cover sum $total vs area $pa")
    }
  }
}

class CrsSpec extends AnyFunSuite {
  private def close(a: Double, b: Double, tol: Double) = math.abs(a - b) <= tol

  test("RADOLAN stereo: central meridian maps to x=0, y=-R/2 at 60N") {
    val crs = Crs.RadolanStereo(unitsKm = false)
    val (x, y) = crs.forward(10.0, 60.0)
    assert(close(x, 0.0, 1e-6))
    assert(close(y, -6370040.0 / 2, 1e-6)) // rho(60) = R*cos60 = R/2
  }

  test("RADOLAN stereo: north pole maps to origin") {
    val (x, y) = Crs.RadolanStereo(unitsKm = false).forward(10.0, 90.0)
    assert(close(x, 0, 1e-9) && close(y, 0, 1e-9))
  }

  test("RADOLAN stereo round-trip over Germany") {
    val crs = Crs.RadolanStereo(unitsKm = false)
    for (loni <- 0 to 4; lati <- 0 to 4) {
      val lon = 5.0 + loni * 2.5; val lat = 47.0 + lati * 2.0
      val (x, y) = crs.forward(lon, lat)
      val (lon2, lat2) = crs.inverse(x, y)
      assert(close(lon, lon2, 1e-9) && close(lat, lat2, 1e-9), s"($lon,$lat)")
    }
  }

  test("RADOLAN km units divide coordinates by 1000") {
    val m = Crs.RadolanStereo(unitsKm = false).forward(13.0, 51.0)
    val km = Crs.RadolanStereo(unitsKm = true).forward(13.0, 51.0)
    assert(close(m._1 / 1000, km._1, 1e-9) && close(m._2 / 1000, km._2, 1e-9))
  }

  test("RADOLAN stereo: scale factor 1 at the 60N standard parallel") {
    val crs = Crs.RadolanStereo(unitsKm = false)
    val dLat = 1e-6
    val (x1, y1) = crs.forward(10.0, 60.0 - dLat / 2)
    val (x2, y2) = crs.forward(10.0, 60.0 + dLat / 2)
    val dist = math.hypot(x2 - x1, y2 - y1)
    val arc = 6370040.0 * math.toRadians(dLat)
    assert(close(dist / arc, 1.0, 1e-6))
  }

  test("UTM33N: central meridian maps to easting 500000 and k0-scaled arc") {
    val (x0, y0) = Crs.Utm33N.forward(15.0, 0.0)
    assert(close(x0, 500000.0, 1e-6) && close(y0, 0.0, 1e-6))
    // quarter meridian on GRS80 is 10001965.729 m; at the pole N = k0 * that
    val (_, yPole) = Crs.Utm33N.forward(15.0, 90.0)
    assert(close(yPole, 0.9996 * 10001965.7293, 0.01), s"got $yPole")
  }

  test("UTM33N round-trip over the zone") {
    for (loni <- 0 to 4; lati <- 0 to 6) {
      val lon = 9.0 + loni * 3.0; val lat = 40.0 + lati * 5.0
      val (x, y) = Crs.Utm33N.forward(lon, lat)
      val (lon2, lat2) = Crs.Utm33N.inverse(x, y)
      assert(close(lon, lon2, 1e-10) && close(lat, lat2, 1e-10), s"($lon,$lat) -> ($lon2,$lat2)")
    }
  }

  test("UTM33N: reference einzugsgebiet bbox lands in the Mueglitz area (~13.7E 50.8N)") {
    // FIXTURES.md: einzugsgebiet bbox (414439, 5625369)-(420400, 5635532) EPSG:25833
    val (lon, lat) = Crs.Utm33N.inverse(417420.0, 5630450.0)
    assert(close(lon, 13.8, 0.15) && close(lat, 50.8, 0.12), s"got ($lon,$lat)")
  }

  test("UTM33N scale at central meridian is k0") {
    val dLat = 1e-6
    val (x1, y1) = Crs.Utm33N.forward(15.0, 50.0 - dLat / 2)
    val (x2, y2) = Crs.Utm33N.forward(15.0, 50.0 + dLat / 2)
    val dist = math.hypot(x2 - x1, y2 - y1)
    // meridional radius of curvature M = a(1-e^2)/(1-e^2 sin^2)^1.5 on GRS80 at 50N
    val a = 6378137.0; val e2 = 0.00669438002290
    val s = math.sin(math.toRadians(50.0))
    val m = a * (1 - e2) / math.pow(1 - e2 * s * s, 1.5)
    val arc = m * math.toRadians(dLat)
    assert(close(dist / arc, 0.9996, 1e-7), s"scale ${dist / arc}")
  }

  test("generalized UTM zones: 32N differs from 33N by the central meridian; of() parses families") {
    val utm32 = Crs.of("epsg:25832")
    val (x32, _) = utm32.forward(9.0, 50.0)   // zone 32 central meridian
    assert(close(x32, 500000.0, 1e-6))
    val (x33, _) = Crs.of("epsg:25833").forward(15.0, 50.0)
    assert(close(x33, 500000.0, 1e-6))
    // WGS84 zone (326xx) agrees with ETRS89 zone to sub-mm at mid-latitudes
    val (xe, ye) = Crs.of("epsg:25833").forward(13.5, 50.8)
    val (xw, yw) = Crs.of("epsg:32633").forward(13.5, 50.8)
    assert(close(xe, xw, 1e-3) && close(ye, yw, 1e-3))
    // round-trip a non-reference zone
    val (lon2, lat2) = utm32.inverse(utm32.forward(7.7, 47.3)._1, utm32.forward(7.7, 47.3)._2)
    assert(close(lon2, 7.7, 1e-10) && close(lat2, 47.3, 1e-10))
  }

  test("Web Mercator: known anchors and round-trip") {
    val wm = Crs.of("epsg:3857")
    val (x0, y0) = wm.forward(0.0, 0.0)
    assert(close(x0, 0.0, 1e-9) && close(y0, 0.0, 1e-9))
    // lon 180 -> 20037508.342789244 (the tile-pyramid half-width)
    assert(close(wm.forward(180.0, 0.0)._1, 20037508.342789244, 1e-6))
    // equatorial aspect: y(85.0511287798) ~ x(180) (square world)
    assert(close(wm.forward(0.0, 85.0511287798066)._2, 20037508.342789244, 1e-3))
    val (lon2, lat2) = wm.inverse(wm.forward(13.4, 52.5)._1, wm.forward(13.4, 52.5)._2)
    assert(close(lon2, 13.4, 1e-10) && close(lat2, 52.5, 1e-10))
  }

  test("cross-CRS reproject: RADOLAN km -> UTM33N round trip") {
    val src = Crs.RadolanStereo(unitsKm = true)
    val poly: Geom.Polygon = Array(Geom.boxRing(-100.0, -4400.0, -99.0, -4399.0))
    val there = Crs.reproject(poly, src, Crs.Utm33N)
    val back = Crs.reproject(there, Crs.Utm33N, src)
    poly(0).zip(back(0)).foreach { case (a, b) => assert(close(a, b, 1e-6)) }
  }
}
