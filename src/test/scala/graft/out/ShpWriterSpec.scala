package graft.out

import java.nio.file.{Files, Paths}
import org.scalatest.funsuite.AnyFunSuite
import graft.geo.Geom
import graft.ingest.Shp

class ShpWriterSpec extends AnyFunSuite {

  test("write -> read round-trip preserves geometry, winding, and attributes") {
    val base = Files.createTempDirectory("shpw").toString + "/test"
    val poly1: Geom.Polygon = Array(
      Geom.boxRing(0, 0, 10, 10),
      Geom.reversed(Geom.boxRing(3, 3, 5, 5))) // hole
    val poly2: Geom.Polygon = Array(Array(20, 0, 24, 0, 22, 6)) // triangle CCW
    val attrs = Seq(
      Map[String, Any]("ID" -> 1L, "NAME" -> "alpha", "AREA" -> 96.0),
      Map[String, Any]("ID" -> 2L, "NAME" -> "beta", "AREA" -> 12.0))
    ShpWriter.write(base, Seq(poly1, poly2), attrs, Seq("ID", "NAME", "AREA"))

    val layer = Shp.read(s"$base.shp")
    assert(layer.features.size == 2)
    assert(layer.fields.map(_._1) == Seq("ID", "NAME", "AREA"))
    val f1 = layer.features.head
    assert(math.abs(Geom.area(f1.geom) - 96.0) < 1e-9) // 100 - 4 hole
    assert(f1.attrs("ID") == 1L && f1.attrs("NAME") == "alpha")
    assert(math.abs(f1.attrs("AREA").asInstanceOf[Double] - 96.0) < 1e-9)
    val f2 = layer.features(1)
    assert(math.abs(Geom.area(f2.geom) - 12.0) < 1e-9)
    assert(f2.attrs("NAME") == "beta")
  }

  test("attribute keys longer than 10 chars truncate the dbf name but keep their values") {
    val base = Files.createTempDirectory("shpw3").toString + "/longkey"
    val poly: Geom.Polygon = Array(Geom.boxRing(0, 0, 1, 1))
    ShpWriter.write(base, Seq(poly),
      Seq(Map[String, Any]("VERY_LONG_FIELD_NAME" -> 42L)), Seq("VERY_LONG_FIELD_NAME"))
    val back = Shp.read(s"$base.shp")
    assert(back.fields.map(_._1) == Seq("VERY_LONG_"))
    assert(back.features.head.attrs("VERY_LONG_") == 42L)
  }

  test("round-trips the reference einzugsgebiet through write+read") {
    val src = "/root/reference/Examples/einzugsgebiet.shp"
    assume(Files.exists(Paths.get(src)))
    val layer = Shp.read(src)
    val base = Files.createTempDirectory("shpw2").toString + "/copy"
    ShpWriter.write(base, layer.features.map(_.geom),
      layer.features.map(_.attrs), layer.fields.map(_._1))
    val back = Shp.read(s"$base.shp")
    assert(back.features.size == layer.features.size)
    layer.features.zip(back.features).foreach { case (a, b) =>
      assert(math.abs(Geom.area(a.geom) - Geom.area(b.geom)) < 1e-6)
      assert(a.attrs("gridcode") == b.attrs("gridcode"))
    }
  }
}
