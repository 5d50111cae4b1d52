package graft.geo

/** Coordinate reference systems the engine supports, with closed-form
  * forward/inverse transforms (no PROJ dependency). Exactly the three CRSs
  * the reference uses (SURVEY.md F15):
  *
  *  - [[RadolanStereo]] — DWD RADOLAN polar stereographic on a sphere
  *    (R = 6370040 m, lon0 = 10°E, true at 60°N): proj4 string at
  *    /root/reference/radohydro.py:59-60; the `+to_meter=1000` km variant
  *    (radohydro.py:375) is the `unitsKm = true` case.
  *  - [[Wgs84]] — EPSG:4326 geographic lon/lat degrees (radohydro.py:392).
  *  - [[Utm33N]] — EPSG:25833 (ETRS89 / UTM zone 33N, GRS80 ellipsoid), the
  *    default output projection (radohydro.py:507).
  *
  * Formulas: polar stereographic per Snyder (Map Projections — A Working
  * Manual, 1987, eqs. 21-33..34, 20-14..18 sphere case); transverse Mercator
  * per the Krüger n-series (6th order), the same series PROJ's `etmerc`/
  * UTM path uses — agreement with PROJ is sub-millimeter within UTM extents.
  * All transforms go through geographic lon/lat radians as the hub.
  */
sealed trait Crs {
  /** lon/lat (degrees) → projected (x, y) in this CRS's units. */
  def forward(lonDeg: Double, latDeg: Double): (Double, Double)
  /** projected (x, y) → lon/lat degrees. */
  def inverse(x: Double, y: Double): (Double, Double)
  def name: String
}

object Crs {
  import java.lang.Math._

  private[geo] def atanh(x: Double): Double = 0.5 * log((1 + x) / (1 - x))

  /** Parse the identifiers used across the reference surface, plus the
    * generalized families: any `epsg:258xx`/`epsg:326xx` UTM zone and Web
    * Mercator.
    */
  def of(s: String): Crs = s.trim.toLowerCase match {
    case "epsg:4326" | "wgs84" | "4326"            => Wgs84
    case "epsg:25833" | "25833" | "utm33n"         => Utm33N
    case "epsg:3857" | "webmercator"               => WebMercator
    case "radolan" | "radolan_m" | "stere"         => RadolanStereo(unitsKm = false)
    case "radolan_km"                              => RadolanStereo(unitsKm = true)
    case z if z.startsWith("epsg:258") && z.length == 10 =>
      TransverseMercator.utm(z.drop(8).toInt, grs80 = true)  // ETRS89 zones
    case z if z.startsWith("epsg:326") && z.length == 10 =>
      TransverseMercator.utm(z.drop(8).toInt, grs80 = false) // WGS84 north zones
    case other => throw new IllegalArgumentException(s"unsupported CRS: $other")
  }

  /** Reproject a packed polygon vertex-wise (what GeoPandas to_crs does —
    * geotools/geotools.py:75,207-208).
    */
  def reproject(p: Geom.Polygon, src: Crs, dst: Crs): Geom.Polygon =
    if (src == dst) p
    else Geom.mapPoints(p) { (x, y) =>
      val (lon, lat) = src.inverse(x, y)
      dst.forward(lon, lat)
    }

  case object Wgs84 extends Crs {
    val name = "EPSG:4326"
    def forward(lonDeg: Double, latDeg: Double): (Double, Double) = (lonDeg, latDeg)
    def inverse(x: Double, y: Double): (Double, Double) = (x, y)
  }

  /** North polar stereographic, spherical earth, true at latTs. */
  final case class RadolanStereo(unitsKm: Boolean) extends Crs {
    val name = if (unitsKm) "RADOLAN(km)" else "RADOLAN(m)"
    private val R = 6370040.0
    private val lon0 = toRadians(10.0)
    private val latTs = toRadians(60.0)
    private val scale = R * (1.0 + sin(latTs)) // rho = scale * tan(pi/4 - phi/2)
    private val unit = if (unitsKm) 1000.0 else 1.0

    def forward(lonDeg: Double, latDeg: Double): (Double, Double) = {
      val lon = toRadians(lonDeg); val lat = toRadians(latDeg)
      val rho = scale * tan(PI / 4 - lat / 2)
      val x = rho * sin(lon - lon0)
      val y = -rho * cos(lon - lon0)
      (x / unit, y / unit)
    }

    def inverse(xu: Double, yu: Double): (Double, Double) = {
      val x = xu * unit; val y = yu * unit
      val rho = sqrt(x * x + y * y)
      val lat = PI / 2 - 2 * atan(rho / scale)
      val lon = lon0 + (if (rho == 0) 0.0 else atan2(x, -y))
      (toDegrees(lon), toDegrees(lat))
    }
  }

  /** Spherical Web Mercator (EPSG:3857) — the tile-pyramid CRS. */
  case object WebMercator extends Crs {
    val name = "EPSG:3857"
    private val R = 6378137.0
    def forward(lonDeg: Double, latDeg: Double): (Double, Double) = {
      val lat = toRadians(latDeg)
      (R * toRadians(lonDeg), R * log(tan(PI / 4 + lat / 2)))
    }
    def inverse(x: Double, y: Double): (Double, Double) =
      (toDegrees(x / R), toDegrees(2 * atan(exp(y / R)) - PI / 2))
  }

  object TransverseMercator {
    /** Northern-hemisphere UTM zone on GRS80 (ETRS89 258xx) or WGS84
      * (326xx) — the two ellipsoids differ only in 1/f's 9th decimal.
      */
    def utm(zone: Int, grs80: Boolean): TransverseMercator = {
      require(zone >= 1 && zone <= 60, s"bad UTM zone $zone")
      TransverseMercator(
        name0 = s"EPSG:${if (grs80) 25800 + zone else 32600 + zone}",
        lon0Deg = zone * 6.0 - 183.0,
        invF = if (grs80) 298.257222101 else 298.257223563)
    }
  }

  /** Transverse Mercator (Krüger series, 6th order in n). */
  final case class TransverseMercator(name0: String, lon0Deg: Double, invF: Double) extends Crs {
    val name: String = name0
    private val a = 6378137.0
    private val f = 1.0 / invF
    private val k0 = 0.9996
    private val lon0 = toRadians(lon0Deg)
    private val fe = 500000.0
    private val fn = 0.0

    private val n = f / (2.0 - f)
    private val n2 = n * n; private val n3 = n2 * n; private val n4 = n3 * n
    private val n5 = n4 * n; private val n6 = n5 * n
    private val A = a / (1 + n) * (1 + n2 / 4 + n4 / 64 + n6 / 256)
    private val e = sqrt(f * (2 - f))

    private val alpha = Array(
      n / 2 - 2 * n2 / 3 + 5 * n3 / 16 + 41 * n4 / 180 - 127 * n5 / 288 + 7891 * n6 / 37800,
      13 * n2 / 48 - 3 * n3 / 5 + 557 * n4 / 1440 + 281 * n5 / 630 - 1983433 * n6 / 1935360,
      61 * n3 / 240 - 103 * n4 / 140 + 15061 * n5 / 26880 + 167603 * n6 / 181440,
      49561 * n4 / 161280 - 179 * n5 / 168 + 6601661 * n6 / 7257600,
      34729 * n5 / 80640 - 3418889 * n6 / 1995840,
      212378941 * n6 / 319334400)

    private val beta = Array(
      n / 2 - 2 * n2 / 3 + 37 * n3 / 96 - n4 / 360 - 81 * n5 / 512 + 96199 * n6 / 604800,
      n2 / 48 + n3 / 15 - 437 * n4 / 1440 + 46 * n5 / 105 - 1118711 * n6 / 3870720,
      17 * n3 / 480 - 37 * n4 / 840 - 209 * n5 / 4480 + 5569 * n6 / 90720,
      4397 * n4 / 161280 - 11 * n5 / 504 - 830251 * n6 / 7257600,
      4583 * n5 / 161280 - 108847 * n6 / 3991680,
      20648693 * n6 / 638668800)

    def forward(lonDeg: Double, latDeg: Double): (Double, Double) = {
      val lat = toRadians(latDeg)
      val dLon = toRadians(lonDeg) - lon0
      // isometric latitude -> conformal t
      val sinLat = sin(lat)
      val t = sinh(atanh(sinLat) - e * atanh(e * sinLat))
      val xiP = atan2(t, cos(dLon))
      val etaP = atanh(sin(dLon) / sqrt(1 + t * t))
      var xi = xiP; var eta = etaP
      var j = 1
      while (j <= 6) {
        xi += alpha(j - 1) * sin(2 * j * xiP) * cosh(2 * j * etaP)
        eta += alpha(j - 1) * cos(2 * j * xiP) * sinh(2 * j * etaP)
        j += 1
      }
      (fe + k0 * A * eta, fn + k0 * A * xi)
    }

    def inverse(x: Double, y: Double): (Double, Double) = {
      val xi = (y - fn) / (k0 * A)
      val eta = (x - fe) / (k0 * A)
      var xiP = xi; var etaP = eta
      var j = 1
      while (j <= 6) {
        xiP -= beta(j - 1) * sin(2 * j * xi) * cosh(2 * j * eta)
        etaP -= beta(j - 1) * cos(2 * j * xi) * sinh(2 * j * eta)
        j += 1
      }
      val chi = asin(sin(xiP) / cosh(etaP))
      // invert conformal latitude: sin(phi) = tanh(psi + e*atanh(e*sin(phi)))
      val psi = atanh(sin(chi))
      var sinPhi = sin(chi)
      var k = 0
      while (k < 12) {
        sinPhi = tanh(psi + e * atanh(e * sinPhi))
        k += 1
      }
      val lat = asin(sinPhi)
      val lon = lon0 + atan2(sinh(etaP), cos(xiP))
      (toDegrees(lon), toDegrees(lat))
    }
  }

  /** ETRS89 / UTM zone 33N — the reference's output CRS (radohydro.py:507). */
  val Utm33N: TransverseMercator = TransverseMercator.utm(33, grs80 = true)
}
