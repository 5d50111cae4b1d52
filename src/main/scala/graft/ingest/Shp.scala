package graft.ingest

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.file.{Files, Paths}
import graft.geo.Geom

/** Minimal ESRI shapefile (+DBF attribute) reader (SURVEY S8).
  *
  * Replaces the reference's Fiona/GDAL `gp.read_file` (geotools.py:61) for
  * the only case the pipeline needs: small basin shapefiles read driver-side
  * and parallelized via `createDataFrame` (the basin dim is broadcast in the
  * spatial join — it is never big). Supports shape types 5 (Polygon) and
  * 15 (PolygonZ, Z/M dropped). Ring winding is normalized to the engine
  * convention (outer CCW positive / holes CW negative — shapefiles store the
  * opposite, so every ring is reversed).
  *
  * Formats are public: ESRI Shapefile Technical Description (1998) and the
  * dBASE III header layout.
  */
object Shp {

  final case class Feature(geom: Geom.Polygon, attrs: Map[String, Any])
  final case class Layer(features: Seq[Feature], fields: Seq[(String, Char)])

  def read(shpPathStr: String): Layer = {
    val shpPath = Paths.get(shpPathStr)
    val dbfPath = Paths.get(shpPathStr.replaceAll("\\.shp$", ".dbf"))
    val geoms = readShp(Files.readAllBytes(shpPath))
    val (fields, records) =
      if (Files.exists(dbfPath)) readDbf(Files.readAllBytes(dbfPath))
      else (Seq.empty[(String, Char)], Seq.fill(geoms.size)(Map.empty[String, Any]))
    require(records.size == geoms.size || records.isEmpty,
      s"shp/dbf record count mismatch: ${geoms.size} vs ${records.size}")
    val attrs = if (records.isEmpty) Seq.fill(geoms.size)(Map.empty[String, Any]) else records
    Layer(geoms.zip(attrs).map { case (g, a) => Feature(g, a) }, fields)
  }

  /** Parse polygon records from .shp bytes. */
  def readShp(bytes: Array[Byte]): Seq[Geom.Polygon] = {
    val buf = ByteBuffer.wrap(bytes)
    buf.order(ByteOrder.BIG_ENDIAN)
    require(buf.getInt(0) == 9994, "not a shapefile (magic != 9994)")
    val fileLenBytes = buf.getInt(24).toLong * 2
    var off = 100
    val out = scala.collection.mutable.ArrayBuffer.empty[Geom.Polygon]
    while (off + 8 <= fileLenBytes && off + 8 <= bytes.length) {
      val contentLen = buf.getInt(off + 4) * 2 // bytes
      val rec = ByteBuffer.wrap(bytes, off + 8, contentLen).order(ByteOrder.LITTLE_ENDIAN)
      val shapeType = rec.getInt
      if (shapeType != 5 && shapeType != 15) {
        // null shapes (type 0) and unexpected types become empty polygons so
        // geometry/attribute records stay index-aligned with the dbf
        out += Array.empty[Geom.Ring]
      } else {
        rec.position(rec.position() + 32) // skip box
        val numParts = rec.getInt
        val numPoints = rec.getInt
        val parts = Array.fill(numParts)(rec.getInt)
        val xs = new Array[Double](numPoints)
        val ys = new Array[Double](numPoints)
        var i = 0
        while (i < numPoints) { xs(i) = rec.getDouble; ys(i) = rec.getDouble; i += 1 }
        val rings = (0 until numParts).map { p =>
          val start = parts(p)
          val end = if (p + 1 < numParts) parts(p + 1) else numPoints
          // drop the closing duplicate point; reverse winding to engine convention
          val n0 = end - start
          val n = if (n0 > 1 && xs(start) == xs(end - 1) && ys(start) == ys(end - 1)) n0 - 1 else n0
          val ring = new Array[Double](2 * n)
          var k = 0
          while (k < n) {
            ring(2 * k) = xs(start + k); ring(2 * k + 1) = ys(start + k)
            k += 1
          }
          Geom.reversed(ring)
        }.toArray
        out += rings
      }
      off += 8 + contentLen
    }
    out.toSeq
  }

  /** Parse a dBASE III .dbf: returns (fields, records). Field types:
    * N/F → Double (or Long when decimals == 0), C → String, D → String
    * (yyyymmdd), L → Boolean.
    */
  def readDbf(bytes: Array[Byte]): (Seq[(String, Char)], Seq[Map[String, Any]]) = {
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val numRecords = buf.getInt(4)
    val headerSize = buf.getShort(8) & 0xffff
    val recordSize = buf.getShort(10) & 0xffff
    // field descriptors: 32 bytes each, from 32 to headerSize-1 (0x0D terminator)
    final case class Fld(name: String, typ: Char, len: Int, dec: Int)
    val flds = scala.collection.mutable.ArrayBuffer.empty[Fld]
    var off = 32
    while (off + 32 <= headerSize && bytes(off) != 0x0d) {
      val nameEnd = {
        var e = off
        while (e < off + 11 && bytes(e) != 0) e += 1
        e
      }
      val name = new String(bytes, off, nameEnd - off, "US-ASCII")
      val typ = bytes(off + 11).toChar
      val len = bytes(off + 16) & 0xff
      val dec = bytes(off + 17) & 0xff
      flds += Fld(name, typ, len, dec)
      off += 32
    }
    // NB: the dBASE deletion flag (first record byte '*') is intentionally
    // ignored — Fiona/GeoPandas (the reference's reader) also treat flagged
    // records as live, and honoring it would break shp/dbf index alignment.
    val records = (0 until numRecords).map { r =>
      val base = headerSize + r * recordSize + 1 // +1 deletion flag
      var pos = base
      flds.map { f =>
        val raw = new String(bytes, pos, f.len, "US-ASCII").trim
        pos += f.len
        val value: Any = f.typ match {
          case 'N' | 'F' =>
            if (raw.isEmpty) null
            else if (f.dec == 0 && !raw.contains('.') && f.len < 19) raw.toLong
            else raw.toDouble
          case 'L' => if (raw.isEmpty) null else "YyTt".contains(raw.head)
          case _   => raw
        }
        f.name -> value
      }.toMap
    }
    (flds.map(f => (f.name, f.typ)).toSeq, records)
  }
}
