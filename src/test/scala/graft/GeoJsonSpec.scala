package graft

import org.apache.spark.sql.functions._
import graft.functions.GeoFunctions

/** Golden GeoJSON strings (q29 has no SQL oracle — this pins the format). */
class GeoJsonSpec extends SparkSpecBase {

  import spark.implicits._

  test("point feature golden") {
    val df = Seq((7L, 10.5, -3.25, Map("craft" -> "brewery"))).toDF("id", "lon", "lat", "tags")
    val got = df.select(GeoFunctions.geojson_feature(
      col("id"), col("lon"), col("lat"), col("tags"))).collect()(0).getString(0)
    assert(got ===
      """{"type":"Feature","id":7,"properties":{"craft":"brewery"},"geometry":{"type":"Point","coordinates":[10.5,-3.25]}}""")
  }

  test("closed ring -> Polygon, open way -> LineString") {
    val closed = Seq(Seq((0.0, 0.0), (1.0, 0.0), (1.0, 1.0), (0.0, 0.0))).toDF("r")
      .selectExpr("transform(r, v -> struct(v._1 AS lon, v._2 AS lat)) AS ring")
    val open = Seq(Seq((0.0, 0.0), (1.0, 0.0), (1.0, 1.0))).toDF("r")
      .selectExpr("transform(r, v -> struct(v._1 AS lon, v._2 AS lat)) AS ring")
    val g1 = closed.select(GeoFunctions.geojson_way_geometry(col("ring"))).collect()(0).getString(0)
    val g2 = open.select(GeoFunctions.geojson_way_geometry(col("ring"))).collect()(0).getString(0)
    assert(g1 === """{"type":"Polygon","coordinates":[[[0.0,0.0],[1.0,0.0],[1.0,1.0],[0.0,0.0]]]}""")
    assert(g2 === """{"type":"LineString","coordinates":[[0.0,0.0],[1.0,0.0],[1.0,1.0]]}""")
  }

  test("geojson parses back: id and geometry round-trip") {
    val df = Seq((42L, -77.03, 38.89, Map("a" -> "b"))).toDF("id", "lon", "lat", "tags")
    val parsed = df.select(from_json(
      GeoFunctions.geojson_feature(col("id"), col("lon"), col("lat"), col("tags")),
      org.apache.spark.sql.types.StructType.fromDDL(
        "type STRING, id LONG, properties MAP<STRING,STRING>, geometry STRUCT<type: STRING, coordinates: ARRAY<DOUBLE>>"))
      .as("f")).select("f.*").collect()(0)
    assert(parsed.getLong(1) === 42L)
    assert(parsed.getStruct(3).getSeq[Double](1) === Seq(-77.03, 38.89))
  }
}
