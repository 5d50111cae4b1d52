package graft.functions

import org.apache.spark.sql.SparkSession
import graft.geo.{Clip, Crs, Geom, PointInPolygon}

/** SQL-facing geometry functions (SURVEY §2.9): registered UDFs over the
  * packed-ring geometry encoding (array<array<double>>), so the spatial
  * operators are reachable from `spark.sql` as well as the DataFrame API.
  *
  *   st_area(geom)                          shoelace area, holes negative
  *   st_bbox(geom)                          struct(xmin,ymin,xmax,ymax)
  *   st_clip_box(geom, xmin,ymin,xmax,ymax) clipped geometry
  *   st_clip_area(geom, ...)                area of the clip, no geometry
  *   st_contains_point(geom, x, y)          even-odd point-in-polygon
  *   st_reproject(geom, srcCrs, dstCrs)     closed-form CRS transform
  */
object GeoSql {

  private def toPoly(g: Seq[Seq[Double]]): Geom.Polygon =
    g.iterator.map(_.toArray).toArray
  private def fromPoly(p: Geom.Polygon): Seq[Seq[Double]] =
    p.iterator.map(_.toSeq).toSeq

  def register(spark: SparkSession): Unit = {
    spark.udf.register("st_area",
      (g: Seq[Seq[Double]]) => Geom.area(toPoly(g)))
    spark.udf.register("st_bbox",
      (g: Seq[Seq[Double]]) => Geom.bbox(toPoly(g)))
    spark.udf.register("st_clip_box",
      (g: Seq[Seq[Double]], xmin: Double, ymin: Double, xmax: Double, ymax: Double) =>
        fromPoly(Clip.clipPolygonToBox(toPoly(g), xmin, ymin, xmax, ymax)))
    spark.udf.register("st_clip_area",
      (g: Seq[Seq[Double]], xmin: Double, ymin: Double, xmax: Double, ymax: Double) =>
        Clip.clipArea(toPoly(g), xmin, ymin, xmax, ymax))
    spark.udf.register("st_contains_point",
      (g: Seq[Seq[Double]], x: Double, y: Double) =>
        PointInPolygon.contains(toPoly(g), x, y))
    spark.udf.register("st_reproject",
      (g: Seq[Seq[Double]], src: String, dst: String) =>
        fromPoly(Crs.reproject(toPoly(g), Crs.of(src), Crs.of(dst))))
  }
}
