package graft

import org.apache.spark.sql.functions._
import graft.geo.GeoFixtures
import graft.join.SpatialJoin

/** Both spatial-join plans vs an O(n·m) brute-force PIP oracle on irregular
  * star polygons with city-clustered (skewed) points — FIXTURES.md G5.
  */
class SpatialJoinSpec extends SparkSpecBase {

  private lazy val images = GeoFixtures.images(spark, 3000).cache()
  private lazy val polys = GeoFixtures.boundaries(spark, 40).cache()

  /** brute force: cross join + point_in_ring, no cells, no index */
  private lazy val expected: Set[(String, Long)] =
    images.select(col("image_id"), col("lon"), col("lat"))
      .crossJoin(polys.select(col("polygon_id"), col("ring")))
      .filter(graft.functions.GeoFunctions.point_in_ring(col("lon"), col("lat"), col("ring")))
      .select(col("image_id"), col("polygon_id"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet

  test("cell equi-join + refine matches brute force exactly") {
    val got = SpatialJoin.cellJoin(images, "lon", "lat", polys, "ring", z = 6)
      .select(col("image_id"), col("polygon_id"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(expected.nonEmpty, "fixture must produce joins")
    assert(got === expected)
  }

  test("broadcast R-tree join matches brute force exactly") {
    val got = SpatialJoin.broadcastRtreeJoin(images, "lon", "lat", polys, "polygon_id", "ring")
      .select(col("image_id"), col("polygon_id"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(got === expected)
  }

  test("cell join at different zooms agrees (covering-cell correctness)") {
    val z5 = SpatialJoin.cellJoin(images, "lon", "lat", polys, "ring", z = 5)
      .select(col("image_id"), col("polygon_id"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val z8 = SpatialJoin.cellJoin(images, "lon", "lat", polys, "ring", z = 8)
      .select(col("image_id"), col("polygon_id"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(z5 === expected)
    assert(z8 === expected)
  }

  test("salted cell join (hot-cell splitting) equals the plain plan") {
    // threshold 50 makes the city clusters hot -> salting actually engages
    val salted = graft.join.SpatialJoin.cellJoinSalted(
      images, "lon", "lat", polys, "ring", z = 6, hotCellThreshold = 50L, saltK = 4)
      .select(col("image_id"), col("polygon_id"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(salted === expected)
  }

  test("autoJoin: stats pick the broadcast plan; a forced threshold falls back to cell join") {
    // the 40-polygon side's Catalyst size estimate is far under the default
    // broadcast threshold -> rtree plan (visible as the codegen probe)
    val auto = SpatialJoin.autoJoin(images, "lon", "lat", polys, "polygon_id", "ring", z = 6)
    assert(auto.queryExecution.executedPlan.toString.contains("rtree_probe"),
      "small polygon side must take the broadcast R-tree plan")
    val gotAuto = auto.select(col("image_id"), col("polygon_id"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(gotAuto === expected)
    // threshold 0 = broadcasting disabled -> the shuffling cell join
    val forced = SpatialJoin.autoJoin(images, "lon", "lat", polys, "polygon_id", "ring",
      z = 6, thresholdBytes = 0L)
    assert(!forced.queryExecution.executedPlan.toString.contains("rtree_probe"),
      "disabled threshold must take the cell join")
    val gotForced = forced.select(col("image_id"), col("polygon_id"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(gotForced === expected)
    // both plans expose the polygon's non-id columns too (schema parity)
    assert(auto.columns.contains("ring") && forced.columns.contains("ring"))
  }

  test("polygon straddling a cell boundary still joins (regression)") {
    import spark.implicits._
    // square centered exactly on the z=6 cell corner at (0,0)
    val ring = Seq((-1.0, -1.0), (1.0, -1.0), (1.0, 1.0), (-1.0, 1.0), (-1.0, -1.0))
    val poly = Seq((1L, ring)).toDF("polygon_id", "r")
      .selectExpr("polygon_id", "transform(r, v -> struct(v._1 AS lon, v._2 AS lat)) AS ring")
    val pts = Seq(("a", -0.5, -0.5), ("b", 0.5, 0.5), ("c", 0.5, -0.5), ("d", -0.5, 0.5),
      ("e", 2.0, 0.0)).toDF("image_id", "lon", "lat")
    val got = SpatialJoin.cellJoin(pts, "lon", "lat", poly, "ring", z = 6)
      .select("image_id").collect().map(_.getString(0)).toSet
    assert(got === Set("a", "b", "c", "d"))
  }
}
