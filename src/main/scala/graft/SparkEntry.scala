package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.geo.GeoTables
import graft.ops.OsmOps
import graft.join.SpatialJoin
import graft.knn.Knn
import graft.tiles.Tiles
import graft.dfl.Dfl
import graft.functions.GeoFunctions._

/** Driver contract — one `queries` entry per implemented operator from
  * SURVEY.md §2, each with a DuckDB oracle over the same parquet tables.
  *
  * Geospatial inputs are deterministic integer-arithmetic derivations from
  * the driver tables (see [[graft.geo.GeoTables]]) so Spark and DuckDB
  * compute bit-identical doubles and every operator — including the spatial
  * join, kNN, and tiling — has an exact oracle.
  */
object SparkEntry {

  // ---- derived geo views ----------------------------------------------------

  private def pts(s: SparkSession, dir: String): DataFrame = GeoTables.points(s, dir)
  private def rect(s: SparkSession, dir: String): DataFrame = GeoTables.rects(s, dir)

  /** points with an OSM-style tags map (flag/status always present; bulk /
    * tiny keys conditionally — exercises map-typed tag algebra F2/F3).
    */
  private def taggedPts(s: SparkSession, dir: String): DataFrame = {
    val p = pts(s, dir)
    p.withColumn("tags",
      map_concat(
        map(lit("flag"), col("tag_flag"), lit("status"), col("tag_status")),
        when(col("quantity") > 30, map(lit("bulk"), lit("y"))).otherwise(map()),
        when(col("quantity") < 5, map(lit("tiny"), lit("y"))).otherwise(map())))
  }

  private val withPts = s"WITH pts AS (\n${GeoTables.pointsSql}\n)"
  private val withBoth = s"WITH pts AS (\n${GeoTables.pointsSql}\n), rect AS (\n${GeoTables.rectsSql}\n)"

  /** DuckDB SQL for the Morton interleave of two z-bit tile coords. */
  private def mortonSql(x: String, y: String, z: Int): String =
    (0 until z).map(i =>
      s"(((($x) >> $i) & 1) << ${2 * i}) + (((($y) >> $i) & 1) << ${2 * i + 1})")
      .mkString("(", " + ", ")")

  private def tileXSql(lon: String, z: Int): String = {
    val n = 1L << z
    s"GREATEST(0, LEAST(${n - 1}, CAST(FLOOR((($lon) + 180.0) / 360.0 * $n) AS BIGINT)))"
  }

  private def tileYSql(lat: String, z: Int): String = {
    val n = 1L << z
    s"GREATEST(0, LEAST(${n - 1}, CAST(FLOOR((1.0 - LN(TAN(RADIANS($lat)) + 1.0/COS(RADIANS($lat))) / PI()) / 2.0 * $n) AS BIGINT)))"
  }

  // ---- flagship -------------------------------------------------------------

  /** Flagship: full spatial join (cell equi-join + PIP refine) on sf0.001. */
  def entry(spark: SparkSession): DataFrame = {
    val dir = "/root/testdata/sf0.001"
    SpatialJoin.cellJoin(pts(spark, dir), "lon", "lat", rect(spark, dir), "ring", GeoTables.JoinZ)
      .select(col("point_id"), col("polygon_id"), col("lon"), col("lat"), col("tag_brand"))
  }

  // ---- queries ---------------------------------------------------------------

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // F4: bbox extract (reference Filter.ContainsPoint, lon/lat-swap bug fixed)
    "q01_bbox_extract" -> ((s, dir) =>
      OsmOps.bboxExtract(pts(s, dir), "lon", "lat", -100.0, -40.0, 60.0, 70.0)
        .select(col("point_id"), col("lon"), col("lat"))
        .orderBy("point_id")),

    // X1: slippy-map tile assignment (reference Node.Tile)
    "q02_tile_xy" -> ((s, dir) =>
      pts(s, dir).select(
        col("point_id"),
        tile_x(col("lon"), 10).as("tx"),
        tile_y(col("lat"), 10).as("ty"))
        .orderBy("point_id")),

    // Cell index: Morton quadkey cell id at z=7
    "q03_cell_id" -> ((s, dir) =>
      pts(s, dir).select(
        col("point_id"),
        cell_id(col("lon"), col("lat"), 7).as("cell"))
        .orderBy("point_id")),

    // F3: key-existence row filter over the tags map
    "q04_tag_keep_filter" -> ((s, dir) =>
      OsmOps.filterKeepKeys(taggedPts(s, dir), "tags", Seq("bulk", "tiny"))
        .select(col("point_id"), col("quantity"))
        .orderBy("point_id")),

    // F2: tag-key projection (map projection, not a row filter)
    "q05_tag_project" -> ((s, dir) =>
      taggedPts(s, dir)
        .select(col("point_id"), explode(OsmOps.keepKeys(col("tags"), Seq("flag"))).as(Seq("key", "value")))
        .orderBy("point_id")),

    // F5: DFL expression filter compiled to Catalyst columns
    "q06_dfl_filter" -> ((s, dir) => {
      val p = taggedPts(s, dir)
      val pred = Dfl.compile("(@flag like R) and (@quantity > 20)", {
        case "quantity" => col("quantity")
        case k => element_at(col("tags"), k)
      })
      p.filter(pred).select(col("point_id"), col("tag_flag"), col("quantity"))
        .orderBy("point_id")
    }),

    // J5 realized, plan 1: cell equi-join + point_in_ring refine
    "q07_spatial_join_cells" -> ((s, dir) =>
      SpatialJoin.cellJoin(pts(s, dir), "lon", "lat", rect(s, dir), "ring", GeoTables.JoinZ)
        .select(col("point_id"), col("polygon_id"))
        .orderBy("point_id", "polygon_id")),

    // J5 realized, plan 2: broadcast JTS STRtree probe (zero point shuffle)
    "q08_spatial_join_rtree" -> ((s, dir) =>
      SpatialJoin.broadcastRtreeJoin(pts(s, dir), "lon", "lat", rect(s, dir), "polygon_id", "ring")
        .select(col("point_id"), col("polygon_id"))
        .orderBy("point_id", "polygon_id")),

    // J1: way→node reference resolution (posexplode + hash join + reassembly)
    "q09_way_assembly" -> ((s, dir) => {
      val p = pts(s, dir)
      val ways = p.groupBy(col("way_id"))
        .agg(transform(array_sort(collect_list(struct(col("pos"), col("point_id")))),
          v => v.getField("point_id")).as("refs"))
      val nodes = p.select(col("point_id").as("node_id"), col("lon"), col("lat"))
      OsmOps.resolveWayRefs(ways, "way_id", "refs", nodes, "node_id")
        .select(col("way_id"), col("pos"), col("lon"), col("lat"))
        .orderBy("way_id", "pos")
    }),

    // A1 + W1: way centroid collapse with deterministic fresh ids
    "q10_way_centroid" -> ((s, dir) => {
      val p = pts(s, dir)
      val maxPid = p.agg(max(col("point_id")).as("max_pid"))
      val agg = p.groupBy(col("way_id")).agg(
        sum(col("lon_milli")).as("sl"), sum(col("lat_milli")).as("st"),
        count(lit(1)).as("n_refs"))
      agg.crossJoin(broadcast(maxPid))
        .select(
          col("way_id"),
          (col("max_pid") + dense_rank().over(Window.orderBy(col("way_id")))).as("new_id"),
          ((col("sl").cast("double") / col("n_refs")) / lit(1000.0) - lit(180.0)).as("clon"),
          ((col("st").cast("double") / col("n_refs")) / lit(1000.0) - lit(85.0)).as("clat"),
          col("n_refs"))
        .orderBy("way_id")
    }),

    // A2: per-key/value tag counts (Summarize per-key counts)
    "q11_tag_counts" -> ((s, dir) =>
      OsmOps.tagCounts(
        pts(s, dir).withColumn("tags",
          map(lit("flag"), col("tag_flag"), lit("status"), col("tag_status"))), "tags")
        .orderBy("key", "value")),

    // A2/A5: dataset profile with honestly recomputed bounds
    "q12_summarize" -> ((s, dir) =>
      OsmOps.summarize(pts(s, dir), "way_id", "lon", "lat")),

    // J2: way-node retention semi-join (way-referenced nodes bypass filter)
    "q13_retention_semijoin" -> ((s, dir) => {
      val p = pts(s, dir)
      val orders = s.read.parquet(s"$dir/orders.parquet")
      val keptWayRefs = p.join(
        orders.filter(col("o_totalprice") > 300000.0)
          .select(col("o_orderkey").as("way_id")), Seq("way_id"), "left_semi")
        .select(col("point_id").as("ref"))
      OsmOps.retention(p, "point_id", col("quantity") > 45, keptWayRefs, "ref")
        .select(col("point_id"))
        .orderBy("point_id")
    }),

    // Raster→vector tile assignment: footprint covering tiles at z=9
    "q14_tile_cover" -> ((s, dir) => {
      val p = pts(s, dir)
      val hx = (lit(50L) + pmod(col("point_id") * lit(3571L), lit(500L))) / lit(1000.0)
      val hy = (lit(50L) + pmod(col("point_id") * lit(7573L), lit(500L))) / lit(1000.0)
      Tiles.coverFootprint(p, "lon", "lat", hx, hy, 9)
        .select(col("point_id"), col("tile_x"), col("tile_y"))
        .orderBy("point_id", "tile_x", "tile_y")
    }),

    // kNN via cell-ring expansion (k nearest points per polygon centroid)
    "q15_knn_cellring" -> ((s, dir) => {
      val queries = rect(s, dir).filter(pmod(col("polygon_id"), lit(10L)) === 0)
        .select(col("polygon_id"), col("center_lon"), col("center_lat"))
      Knn.cellRing(queries, "polygon_id", "center_lon", "center_lat",
        pts(s, dir), "point_id", "lon", "lat", k = 5, z = 7)
        .select(col("query_id").as("polygon_id"), col("rank"), col("point_id"))
        .orderBy("polygon_id", "rank")
    }),

    // kNN scan plan (broadcast queries, per-partition heaps) — same oracle
    "q16_knn_scan" -> ((s, dir) => {
      val queries = rect(s, dir).filter(pmod(col("polygon_id"), lit(10L)) === 0)
        .select(col("polygon_id"), col("center_lon"), col("center_lat"))
      Knn.scan(queries, "polygon_id", "center_lon", "center_lat",
        pts(s, dir), "point_id", "lon", "lat", k = 5)
        .select(col("query_id").as("polygon_id"), col("rank"), col("point_id"))
        .orderBy("polygon_id", "rank")
    })
  )

  // ---- oracle SQL -------------------------------------------------------------

  def oracleSql: Map[String, String] = {
    val knnOracle =
      s"""$withBoth, q AS (
         |  SELECT polygon_id, center_lon, center_lat FROM rect WHERE polygon_id % 10 = 0
         |), d AS (
         |  SELECT q.polygon_id, p.point_id,
         |         (p.lon - q.center_lon) * (p.lon - q.center_lon) +
         |         (p.lat - q.center_lat) * (p.lat - q.center_lat) AS dist
         |  FROM q CROSS JOIN pts p
         |), r AS (
         |  SELECT polygon_id, point_id,
         |         ROW_NUMBER() OVER (PARTITION BY polygon_id ORDER BY dist, point_id) AS rank
         |  FROM d
         |)
         |SELECT polygon_id, rank, point_id FROM r WHERE rank <= 5
         |ORDER BY polygon_id, rank""".stripMargin

    Map(
      "q01_bbox_extract" ->
        s"""$withPts
           |SELECT point_id, lon, lat FROM pts
           |WHERE lon BETWEEN -100.0 AND 60.0 AND lat BETWEEN -40.0 AND 70.0
           |ORDER BY point_id""".stripMargin,

      "q02_tile_xy" ->
        s"""$withPts
           |SELECT point_id, ${tileXSql("lon", 10)} AS tx, ${tileYSql("lat", 10)} AS ty
           |FROM pts ORDER BY point_id""".stripMargin,

      "q03_cell_id" ->
        s"""$withPts, t AS (
           |  SELECT point_id, ${tileXSql("lon", 7)} AS tx, ${tileYSql("lat", 7)} AS ty FROM pts
           |)
           |SELECT point_id, ${mortonSql("tx", "ty", 7)} * 32 + 7 AS cell
           |FROM t ORDER BY point_id""".stripMargin,

      "q04_tag_keep_filter" ->
        s"""$withPts
           |SELECT point_id, quantity FROM pts
           |WHERE quantity > 30 OR quantity < 5
           |ORDER BY point_id""".stripMargin,

      "q05_tag_project" ->
        s"""$withPts
           |SELECT point_id, 'flag' AS key, tag_flag AS value FROM pts
           |ORDER BY point_id""".stripMargin,

      "q06_dfl_filter" ->
        s"""$withPts
           |SELECT point_id, tag_flag, quantity FROM pts
           |WHERE tag_flag = 'R' AND quantity > 20
           |ORDER BY point_id""".stripMargin,

      "q07_spatial_join_cells" ->
        s"""$withBoth
           |SELECT p.point_id AS point_id, g.polygon_id AS polygon_id
           |FROM pts p JOIN rect g
           |  ON p.lon BETWEEN g.min_lon AND g.max_lon
           | AND p.lat BETWEEN g.min_lat AND g.max_lat
           |ORDER BY point_id, polygon_id""".stripMargin,

      "q08_spatial_join_rtree" ->
        s"""$withBoth
           |SELECT p.point_id AS point_id, g.polygon_id AS polygon_id
           |FROM pts p JOIN rect g
           |  ON p.lon BETWEEN g.min_lon AND g.max_lon
           | AND p.lat BETWEEN g.min_lat AND g.max_lat
           |ORDER BY point_id, polygon_id""".stripMargin,

      "q09_way_assembly" ->
        s"""$withPts
           |SELECT way_id,
           |       ROW_NUMBER() OVER (PARTITION BY way_id ORDER BY pos) - 1 AS pos,
           |       lon, lat
           |FROM pts ORDER BY way_id, pos""".stripMargin,

      "q10_way_centroid" ->
        s"""$withPts, agg AS (
           |  SELECT way_id, SUM(lon_milli) AS sl, SUM(lat_milli) AS st, COUNT(*) AS n_refs
           |  FROM pts GROUP BY way_id
           |)
           |SELECT way_id,
           |       (SELECT MAX(point_id) FROM pts) + DENSE_RANK() OVER (ORDER BY way_id) AS new_id,
           |       (CAST(sl AS DOUBLE) / n_refs) / 1000.0 - 180.0 AS clon,
           |       (CAST(st AS DOUBLE) / n_refs) / 1000.0 - 85.0 AS clat,
           |       n_refs
           |FROM agg ORDER BY way_id""".stripMargin,

      "q11_tag_counts" ->
        s"""$withPts
           |SELECT key, value, n FROM (
           |  SELECT 'flag' AS key, tag_flag AS value, COUNT(*) AS n FROM pts GROUP BY tag_flag
           |  UNION ALL
           |  SELECT 'status' AS key, tag_status AS value, COUNT(*) AS n FROM pts GROUP BY tag_status
           |) ORDER BY key, value""".stripMargin,

      "q12_summarize" ->
        s"""$withPts
           |SELECT COUNT(*) AS n_rows, COUNT(DISTINCT way_id) AS n_users,
           |       MIN(lon) AS min_lon, MIN(lat) AS min_lat,
           |       MAX(lon) AS max_lon, MAX(lat) AS max_lat
           |FROM pts""".stripMargin,

      "q13_retention_semijoin" ->
        s"""$withPts
           |SELECT point_id FROM pts
           |WHERE quantity > 45
           |   OR way_id IN (SELECT o_orderkey FROM orders WHERE o_totalprice > 300000.0)
           |ORDER BY point_id""".stripMargin,

      "q14_tile_cover" ->
        s"""$withPts, f AS (
           |  SELECT point_id,
           |         lon - (50 + (point_id * 3571) % 500) / 1000.0 AS lon_lo,
           |         lon + (50 + (point_id * 3571) % 500) / 1000.0 AS lon_hi,
           |         lat - (50 + (point_id * 7573) % 500) / 1000.0 AS lat_lo,
           |         lat + (50 + (point_id * 7573) % 500) / 1000.0 AS lat_hi
           |  FROM pts
           |), b AS (
           |  SELECT point_id,
           |         ${tileXSql("lon_lo", 9)} AS txmin, ${tileXSql("lon_hi", 9)} AS txmax,
           |         ${tileYSql("lat_hi", 9)} AS tymin, ${tileYSql("lat_lo", 9)} AS tymax
           |  FROM f
           |), xs AS (
           |  SELECT point_id, UNNEST(generate_series(txmin, txmax)) AS tile_x, tymin, tymax FROM b
           |)
           |SELECT point_id, tile_x, UNNEST(generate_series(tymin, tymax)) AS tile_y
           |FROM xs ORDER BY point_id, tile_x, tile_y""".stripMargin,

      "q15_knn_cellring" -> knnOracle,
      "q16_knn_scan" -> knnOracle
    )
  }
}
