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

  test("faithful Q2 sort: rainfall columns re-sorted by last timestep, geometries not") {
    val spark = graft.core.TestSpark.spark
    import spark.implicits._
    // two timesteps whose last-column ordering (30,10,20 -> basins 2,3,1)
    // differs from basinID order — the reference's polyg_values[:, -2]
    // argsort misaligns data from geometry (geotools/geotools.py:324-325)
    val series = Seq(
      (1, java.sql.Timestamp.valueOf("2018-01-01 00:50:00"), 1.0),
      (2, java.sql.Timestamp.valueOf("2018-01-01 00:50:00"), 2.0),
      (3, java.sql.Timestamp.valueOf("2018-01-01 00:50:00"), 3.0),
      (1, java.sql.Timestamp.valueOf("2018-01-01 01:50:00"), 30.0),
      (2, java.sql.Timestamp.valueOf("2018-01-01 01:50:00"), 10.0),
      (3, java.sql.Timestamp.valueOf("2018-01-01 01:50:00"), 20.0)
    ).toDF("basinID", "ts", "rain")
    val basins = Seq(1, 2, 3).map { id =>
      graft.api.RadoHydro.BasinInfo(id, 1.0, Map[String, Any]("gridcode" -> id.toLong),
        Array(Geom.boxRing(id * 10, 0, id * 10 + 1, 1)))
    }

    val saneBase = Files.createTempDirectory("shpq2s").toString + "/sane"
    assert(WideSink.writeShapefile(series, basins, Seq("gridcode"), saneBase))
    val sane = Shp.read(s"$saneBase.shp")
    // sane mode: everything aligned — basin i carries its own values
    sane.features.foreach { f =>
      val id = f.attrs("gridcode").asInstanceOf[Long]
      assert(f.attrs("BasinIDNew") == id)
      assert(f.attrs("1801010150").asInstanceOf[Double] == (id match {
        case 1 => 30.0; case 2 => 10.0; case 3 => 20.0
      }))
    }

    val base = Files.createTempDirectory("shpq2f").toString + "/faithful"
    assert(WideSink.writeShapefile(series, basins, Seq("gridcode"), base, faithful = true))
    val layer = Shp.read(s"$base.shp")
    assert(layer.features.size == 3)
    // geometry + gridcode stay in input order 1,2,3...
    assert(layer.features.map(_.attrs("gridcode")) == Seq(1L, 2L, 3L))
    // ...but the data rows are sorted by the LAST column (10,20,30 ascending),
    // i.e. BasinIDNew order 2,3,1 — misaligned, exactly like the reference
    assert(layer.features.map(_.attrs("BasinIDNew")) == Seq(2L, 3L, 1L))
    assert(layer.features.map(_.attrs("1801010150")) == Seq(10.0, 20.0, 30.0))
    assert(layer.features.map(_.attrs("1801010050")) == Seq(2.0, 3.0, 1.0))
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
