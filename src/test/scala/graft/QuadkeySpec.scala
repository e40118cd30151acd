package graft

import org.apache.spark.sql.functions._
import graft.functions.GeoFunctions._
import graft.index.CellIndex

/** The quadkey Column function vs the JVM cell index's string form (whose
  * tile math CellIndexSpec proves against the reference formula), plus the
  * prefix-hierarchy property that makes quadkeys usable as tile-store keys.
  */
class QuadkeySpec extends SparkSpecBase {

  test("quadkey_at matches CellIndex.quadKeyString on sampled points, all zooms") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val rows = (1 to 300).map { i =>
      (i.toLong, rnd.nextDouble() * 359.98 - 179.99, rnd.nextDouble() * 169.8 - 84.9,
        1 + rnd.nextInt(18))
    }
    // z is a plan-time constant, so build one plan per sampled zoom
    rows.groupBy(_._4).foreach { case (z, rs) =>
      val got = rs.toDF("id", "lon", "lat", "z")
        .select(col("id"), quadkey_at(col("lon"), col("lat"), z).as("qk"))
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      rs.foreach { case (id, lon, lat, _) =>
        val want = CellIndex.quadKeyString(CellIndex.cellId(lon, lat, z))
        assert(got(id) == want, s"id=$id lon=$lon lat=$lat z=$z")
      }
    }
  }

  test("ancestor quadkey is a strict prefix of the descendant's") {
    val r = spark.range(1).select(
      quadkey_at(lit(8.54), lit(47.37), 14).as("qk14"),
      quadkey_at(lit(8.54), lit(47.37), 6).as("qk6")).head()
    assert(r.getString(0).length == 14 && r.getString(1).length == 6)
    assert(r.getString(0).startsWith(r.getString(1)))
  }

  test("tile-coord form agrees with the point form") {
    val r = spark.range(1).select(
      quadkey(tile_x(lit(-73.98), 12), tile_y(lit(40.75), 12), 12).as("a"),
      quadkey_at(lit(-73.98), lit(40.75), 12).as("b")).head()
    assert(r.getString(0) == r.getString(1))
  }
}
