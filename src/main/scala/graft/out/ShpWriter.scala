package graft.out

import java.io.ByteArrayOutputStream
import java.nio.{ByteBuffer, ByteOrder}
import java.nio.file.{Files, Paths}
import graft.geo.Geom
import graft.ingest.Shp

/** Minimal ESRI shapefile WRITER (polygon type 5 + dBASE III attributes +
  * .shx index) — completes SURVEY K2: the reference emits its wide result as
  * a shapefile (geotools.py:321-330); with this, the engine round-trips its
  * own [[graft.ingest.Shp]] reader. Ring winding converts back from the
  * engine convention (outer CCW) to shapefile convention (outer CW, holes
  * CCW) by reversing every ring; rings are closed on write.
  */
object ShpWriter {

  sealed trait FieldType { def code: Char }
  case object FLong extends FieldType { val code = 'N' }
  case object FDouble extends FieldType { val code = 'N' }
  case object FString extends FieldType { val code = 'C' }

  /** `name` is the (max 10 char) dbf field name; `srcKey` the attribute-map
    * key values are looked up by — they differ when a key is truncated.
    */
  final case class Field(name: String, srcKey: String, typ: FieldType, len: Int, dec: Int)

  /** Infer dbf field specs from the first record's values. */
  def inferFields(attrs: Seq[Map[String, Any]], order: Seq[String]): Seq[Field] =
    order.map { key =>
      val values = attrs.flatMap(_.get(key))
      val name = key.take(10)
      values.headOption match {
        case Some(_: Long) | Some(_: Int)       => Field(name, key, FLong, 18, 0)
        case Some(_: Double) | Some(_: Float)   => Field(name, key, FDouble, 19, 11)
        case _ =>
          val maxLen = math.max(1, values.map(v => String.valueOf(v).length).maxOption.getOrElse(1))
          Field(name, key, FString, math.min(254, maxLen), 0)
      }
    }

  def write(basePath: String, geoms: Seq[Geom.Polygon],
      attrs: Seq[Map[String, Any]], fieldOrder: Seq[String],
      prjWkt: Option[String] = None): Unit = {
    require(geoms.size == attrs.size, "geoms/attrs size mismatch")
    val base = basePath.stripSuffix(".shp")
    writeShpShx(base, geoms)
    writeDbf(base, attrs, inferFields(attrs, fieldOrder))
    prjWkt.foreach(w => Files.write(Paths.get(s"$base.prj"), w.getBytes("US-ASCII")))
  }

  private def writeShpShx(base: String, geoms: Seq[Geom.Polygon]): Unit = {
    val records = geoms.map(recordContent)
    val fileLenBytes = 100 + records.map(_.length + 8).sum
    val shp = ByteBuffer.allocate(fileLenBytes)
    val shx = ByteBuffer.allocate(100 + geoms.size * 8)

    def header(buf: ByteBuffer, lenBytes: Int, bbox: (Double, Double, Double, Double)): Unit = {
      buf.order(ByteOrder.BIG_ENDIAN)
      buf.putInt(9994); (0 until 5).foreach(_ => buf.putInt(0))
      buf.putInt(lenBytes / 2)
      buf.order(ByteOrder.LITTLE_ENDIAN)
      buf.putInt(1000).putInt(5)
      buf.putDouble(bbox._1).putDouble(bbox._2).putDouble(bbox._3).putDouble(bbox._4)
      (0 until 4).foreach(_ => buf.putDouble(0.0))
    }

    val bbox =
      if (geoms.isEmpty) (0.0, 0.0, 0.0, 0.0)
      else {
        val bs = geoms.filter(_.nonEmpty).map(Geom.bbox)
        (bs.map(_._1).min, bs.map(_._2).min, bs.map(_._3).max, bs.map(_._4).max)
      }
    header(shp, fileLenBytes, bbox)
    header(shx, 100 + geoms.size * 8, bbox)

    var offsetWords = 50
    records.zipWithIndex.foreach { case (content, i) =>
      shp.order(ByteOrder.BIG_ENDIAN)
      shp.putInt(i + 1).putInt(content.length / 2)
      shp.put(content)
      shx.order(ByteOrder.BIG_ENDIAN)
      shx.putInt(offsetWords).putInt(content.length / 2)
      offsetWords += 4 + content.length / 2
    }
    Files.write(Paths.get(s"$base.shp"), shp.array())
    Files.write(Paths.get(s"$base.shx"), shx.array())
  }

  private def recordContent(poly: Geom.Polygon): Array[Byte] = {
    // close rings + reverse winding back to shp convention
    val rings = poly.map { r => Geom.reversed(r) }
    val numPoints = rings.map(_.length / 2 + 1).sum // +1 closing point each
    val len = 4 + 32 + 4 + 4 + 4 * rings.length + 16 * numPoints
    val buf = ByteBuffer.allocate(len).order(ByteOrder.LITTLE_ENDIAN)
    buf.putInt(5)
    val (xmin, ymin, xmax, ymax) =
      if (poly.isEmpty) (0.0, 0.0, 0.0, 0.0) else Geom.bbox(poly)
    buf.putDouble(xmin).putDouble(ymin).putDouble(xmax).putDouble(ymax)
    buf.putInt(rings.length).putInt(numPoints)
    var offset = 0
    rings.foreach { r => buf.putInt(offset); offset += r.length / 2 + 1 }
    rings.foreach { r =>
      var i = 0
      while (i < r.length) { buf.putDouble(r(i)).putDouble(r(i + 1)); i += 2 }
      buf.putDouble(r(0)).putDouble(r(1)) // close
    }
    buf.array()
  }

  private def writeDbf(base: String, records: Seq[Map[String, Any]], fields: Seq[Field]): Unit = {
    val recordSize = 1 + fields.map(_.len).sum
    val headerSize = 32 + fields.size * 32 + 1
    val buf = ByteBuffer.allocate(headerSize + records.size * recordSize + 1)
      .order(ByteOrder.LITTLE_ENDIAN)
    buf.put(0x03.toByte)
    val now = java.time.LocalDate.of(2026, 1, 1) // fixed date: deterministic bytes
    buf.put((now.getYear - 1900).toByte).put(now.getMonthValue.toByte).put(now.getDayOfMonth.toByte)
    buf.putInt(records.size)
    buf.putShort(headerSize.toShort).putShort(recordSize.toShort)
    buf.position(32)
    fields.foreach { f =>
      val nameBytes = f.name.getBytes("US-ASCII")
      val nb = java.util.Arrays.copyOf(nameBytes, 11)
      buf.put(nb)
      buf.put(f.typ.code.toByte)
      buf.putInt(0)
      buf.put(f.len.toByte).put(f.dec.toByte)
      buf.position(buf.position() + 14)
    }
    buf.put(0x0d.toByte)
    records.foreach { rec =>
      buf.put(' '.toByte)
      fields.foreach { f =>
        val raw = rec.get(f.srcKey).map {
          case d: Double => s"%${f.len}.${f.dec}f".format(d).take(f.len)
          case v         => String.valueOf(v)
        }.getOrElse("")
        val txt = f.typ match {
          case FString => raw.padTo(f.len, ' ').take(f.len)           // left-aligned
          case _       => raw.reverse.padTo(f.len, ' ').reverse.take(f.len) // right-aligned
        }
        buf.put(txt.getBytes("US-ASCII"))
      }
    }
    buf.put(0x1a.toByte)
    Files.write(Paths.get(s"$base.dbf"), buf.array())
  }
}
