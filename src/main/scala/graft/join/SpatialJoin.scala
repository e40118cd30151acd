package graft.join

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.Bridge.{column => toCol, expression => toExpr}
import org.apache.spark.sql.types._
import graft.expr.CoverCellsExpr
import graft.functions.GeoFunctions._

/** Point-in-polygon spatial join — the engine's marquee operator, realizing
  * the reference's latent R-tree (`/root/reference/osm/Planet.go:36,50`:
  * constructed, never queried) as two scale-appropriate Spark plans:
  *
  * 1. [[cellJoin]] — polygons exploded to covering cells at zoom z, points
  *    keyed by `cell_id`, shuffle equi-join on the cell, then exact
  *    refinement with the codegen'd `point_in_ring` expression. Scales to
  *    arbitrarily large BOTH sides; shuffle is keyed on the spatial cell so
  *    AQE's skew-join splitting handles dense-city cells.
  *
  * 2. [[broadcastRtreeJoin]] — the polygon side (typically 10^2..10^6
  *    boundary rings vs 10^12 points) is collected into a JTS STRtree of
  *    flat ring arrays, broadcast, and probed per-partition. ZERO shuffle
  *    of the point table — at 100 TB this is the default plan.
  *
  * Both return the same rows; `SpatialJoinSpec` cross-checks them against a
  * brute-force O(n·m) oracle.
  */
object SpatialJoin {

  def coverCells(minLon: Column, minLat: Column, maxLon: Column, maxLat: Column, z: Int): Column =
    toCol(CoverCellsExpr(Seq(
      toExpr(minLon.cast(DoubleType)), toExpr(minLat.cast(DoubleType)),
      toExpr(maxLon.cast(DoubleType)), toExpr(maxLat.cast(DoubleType)),
      toExpr(lit(z)))))

  /** Ring bbox via builtin lambda functions (stays in codegen). */
  def ringBounds(ring: Column): (Column, Column, Column, Column) = (
    array_min(transform(ring, p => p.getField("lon"))),
    array_min(transform(ring, p => p.getField("lat"))),
    array_max(transform(ring, p => p.getField("lon"))),
    array_max(transform(ring, p => p.getField("lat"))))

  /** Cell equi-join + exact PIP refine.
    *
    * @param points   point side; must expose `lonCol`/`latCol`
    * @param polygons polygon side; must expose `ringCol`
    *                 (array<struct<lon,lat>>, closed)
    * @param z        cell zoom — pick so polygons cover few cells
    * @return points × containing polygons, with all columns of both inputs
    */
  def cellJoin(points: DataFrame, lonCol: String, latCol: String,
               polygons: DataFrame, ringCol: String, z: Int = 7): DataFrame = {
    val (mnLon, mnLat, mxLon, mxLat) = ringBounds(col(ringCol))
    val polyCells = polygons
      .withColumn("__cell", explode(coverCells(mnLon, mnLat, mxLon, mxLat, z)))
    val ptCells = points.withColumn("__cell", cell_id(col(lonCol), col(latCol), z))
    // Each point lies in exactly one covering cell of each polygon (cells
    // partition the plane), so no post-join dedup is needed.
    ptCells.join(polyCells, "__cell")
      .filter(point_in_ring(col(lonCol), col(latCol), col(ringCol)))
      .drop("__cell")
  }

  /** Salted cell join for skewed data: hot cells (dense cities) are split
    * k ways — points get `salt = hash(pointRow) % k`, the polygon side is
    * replicated across all k salt values for its hot cells — so no single
    * reducer owns a whole city. Cold cells keep salt 0 with no replication.
    * Same output as [[cellJoin]]; SpatialJoinSpec asserts equality.
    *
    * @param hotCellThreshold point count above which a cell is salted
    * @param saltK            number of splits for hot cells
    */
  def cellJoinSalted(points: DataFrame, lonCol: String, latCol: String,
                     polygons: DataFrame, ringCol: String, z: Int = 7,
                     hotCellThreshold: Long = 1000000L, saltK: Int = 8): DataFrame = {
    val ptCells = points.withColumn("__cell", cell_id(col(lonCol), col(latCol), z))
    // 1. hot-cell histogram (cheap: one partial-agg pass over the cell col)
    val hot = ptCells.groupBy(col("__cell")).agg(count(lit(1)).as("__n"))
      .filter(col("__n") > hotCellThreshold)
      .select(col("__cell"))
    val hotSet = hot.collect().map(_.getLong(0)).toSet
    val hotLit = typedLit(hotSet.toSeq)

    // 2. points: salt only hot cells
    val ptSalted = ptCells.withColumn("__salt",
      when(array_contains(hotLit, col("__cell")),
        pmod(hash(col(lonCol), col(latCol)), lit(saltK)))
        .otherwise(lit(0)))

    // 3. polygons: replicate hot covering cells saltK ways, cold cells once
    val (mnLon, mnLat, mxLon, mxLat) = ringBounds(col(ringCol))
    val polyCells = polygons
      .withColumn("__cell", explode(coverCells(mnLon, mnLat, mxLon, mxLat, z)))
      .withColumn("__salt", explode(
        when(array_contains(hotLit, col("__cell")),
          sequence(lit(0), lit(saltK - 1)))
          .otherwise(array(lit(0)))))

    ptSalted.join(polyCells, Seq("__cell", "__salt"))
      .filter(point_in_ring(col(lonCol), col(latCol), col(ringCol)))
      .drop("__cell", "__salt")
  }

  /** Stats-driven plan picker — the spatial analogue of Spark's own
    * broadcast-vs-shuffle join selection, so callers never hand-pick a
    * physical strategy. The polygon side's Catalyst size estimate
    * (`optimizedPlan.stats.sizeInBytes`, the same number Spark's
    * `autoBroadcastJoinThreshold` consults) decides:
    *
    *  - fits the threshold → [[broadcastRtreeJoin]] (zero point-side
    *    shuffle, the 10^12-row default), with the polygon's other columns
    *    re-attached by a broadcast equi-join on `idCol` so the output
    *    schema matches the cell-join plan;
    *  - too big → [[cellJoin]] (both sides shuffle on the spatial cell;
    *    AQE splits skewed city cells).
    *
    * `thresholdBytes` < 0 uses the session's
    * `spark.sql.autoBroadcastJoinThreshold`.
    */
  def autoJoin(points: DataFrame, lonCol: String, latCol: String,
               polygons: DataFrame, idCol: String, ringCol: String,
               z: Int = 7, thresholdBytes: Long = -1L): DataFrame = {
    val spark = points.sparkSession
    val limit =
      if (thresholdBytes >= 0) thresholdBytes
      else spark.sessionState.conf.autoBroadcastJoinThreshold
    val polySize = polygons.queryExecution.optimizedPlan.stats.sizeInBytes
    if (limit > 0 && polySize <= BigInt(limit)) {
      val joined = broadcastRtreeJoin(points, lonCol, latCol, polygons, idCol, ringCol)
      val extraCols = polygons.columns.filter(_ != idCol)
      if (extraCols.isEmpty) joined
      else joined.join(broadcast(polygons), joined("polygon_id") === polygons(idCol))
        .drop(polygons(idCol))
    } else {
      val out = cellJoin(points, lonCol, latCol, polygons, ringCol, z)
      // align with the broadcast path's schema: same name AND same type
      // (the probe emits LongType; without the cast, a stats change could
      // flip the plan and silently change the output schema)
      val renamed =
        if (idCol == "polygon_id") out else out.withColumnRenamed(idCol, "polygon_id")
      renamed.withColumn("polygon_id", renamed("polygon_id").cast("long"))
    }
  }

  /** Broadcast-R-tree variant: pack the polygon side into a primitive-array
    * [[graft.index.FlatRtree]] on the driver, broadcast it, and probe with
    * the codegen'd [[graft.expr.RtreeProbeExpr]] (bbox lookup + exact PIP
    * fused, allocation-free per probe). Returns (pointColumns...,
    * polygon_id); the point table is never shuffled.
    *
    * The polygon side must fit on the driver (~10^6 rings OK); candidate
    * lookup is O(log m) per point.
    */
  def broadcastRtreeJoin(points: DataFrame, lonCol: String, latCol: String,
                         polygons: DataFrame, idCol: String, ringCol: String): DataFrame = {
    val spark = points.sparkSession
    val polyRows: Array[(Long, Array[Double])] = polygons
      .select(col(idCol).cast(LongType), col(ringCol))
      .collect()
      .map { r =>
        val id = r.getLong(0)
        val ring = r.getSeq[Row](1)
        val flat = new Array[Double](ring.length * 2)
        var i = 0
        ring.foreach { p => flat(i) = p.getDouble(0); flat(i + 1) = p.getDouble(1); i += 2 }
        (id, flat)
      }
    val bc = spark.sparkContext.broadcast(graft.index.FlatRtree.build(polyRows))
    val probe = toCol(graft.expr.RtreeProbeExpr(
      toExpr(col(lonCol).cast(DoubleType)), toExpr(col(latCol).cast(DoubleType)), bc))
    points.withColumn("polygon_id", explode(probe))
  }
}
