package graft.tiles

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.GeoFunctions._

/** Raster→vector tile assignment: map each record's geographic footprint
  * (anchor point ± half-extents) to the z/x/y slippy-map tiles it covers —
  * the scaled-up form of the reference's never-called Node.Tile(z)
  * (`/root/reference/osm/Node.go:26-33`).
  *
  * Entirely builtin-composed (`sequence` + `explode` over codegen'd tile
  * expressions): stays inside whole-stage codegen, no UDF.
  */
object Tiles {

  /** One output row per (input row, covering tile) at zoom z.
    * Tile ranges are clamped at the map edge (x and y) — footprints are
    * assumed not to wrap the antimeridian (clamped, matching the oracle).
    *
    * @param halfLon half-width of the footprint in degrees (Column)
    * @param halfLat half-height in degrees (Column)
    */
  def coverFootprint(df: DataFrame, lonCol: String, latCol: String,
                     halfLon: Column, halfLat: Column, z: Int): DataFrame = {
    val lon = col(lonCol); val lat = col(latCol)
    val txMin = tile_x(lon - halfLon, z)
    val txMax = tile_x(lon + halfLon, z)
    // north edge (lat + h) has the SMALLER tile y
    val tyMin = tile_y(lat + halfLat, z)
    val tyMax = tile_y(lat - halfLat, z)
    // guard inverted extents: sequence(a, b) with a > b DESCENDS in Spark
    // (step -1), which would silently fabricate tiles for a row whose
    // caller-supplied half-extent evaluates negative — emit zero tiles
    df.withColumn("tile_z", lit(z))
      .withColumn("tile_x", explode(when(txMin <= txMax,
        sequence(txMin, txMax)).otherwise(array().cast("array<bigint>"))))
      .withColumn("tile_y", explode(when(tyMin <= tyMax,
        sequence(tyMin, tyMax)).otherwise(array().cast("array<bigint>"))))
  }

  /** Point (zero-footprint) tile assignment at zoom z. */
  def assignPoint(df: DataFrame, lonCol: String, latCol: String, z: Int): DataFrame =
    df.withColumn("tile_z", lit(z))
      .withColumn("tile_x", tile_x(col(lonCol), z))
      .withColumn("tile_y", tile_y(col(latCol), z))
}
