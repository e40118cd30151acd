package graft.expr

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Custom Catalyst expressions for the cell index and point-in-polygon
  * refinement. Each has both an interpreted `eval` and `doGenCode` emitting
  * a static call into [[graft.index.CellIndex]] / [[GeoMath]], so they stay
  * inside whole-stage codegen (SURVEY.md §7.3: custom `Expression`, not UDF).
  */

/** cell_id(lon, lat, z): Long — hierarchical Morton quadkey cell id.
  * Generalizes the reference's Node.Tile(z)
  * (`/root/reference/osm/Node.go:26-33`).
  */
case class CellIdExpr(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "cell_id"

  override protected def nullSafeEval(lon: Any, lat: Any, z: Any): Any =
    graft.index.CellIndex.cellId(
      lon.asInstanceOf[Double], lat.asInstanceOf[Double], z.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (lon, lat, z) =>
      s"graft.index.CellIndex.cellId($lon, $lat, $z)")

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): CellIdExpr = copy(f, s, t)
}

/** tile_x(lon, z): Long — slippy-map tile column (reference Node.go:27-28). */
case class TileXExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "tile_x"
  override protected def nullSafeEval(lon: Any, z: Any): Any =
    graft.index.CellIndex.tileX(lon.asInstanceOf[Double], z.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (lon, z) => s"graft.index.CellIndex.tileX($lon, $z)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): TileXExpr =
    copy(l, r)
}

/** tile_y(lat, z): Long — Web-Mercator tile row (reference Node.go:29-30). */
case class TileYExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "tile_y"
  override protected def nullSafeEval(lat: Any, z: Any): Any =
    graft.index.CellIndex.tileY(lat.asInstanceOf[Double], z.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (lat, z) => s"graft.index.CellIndex.tileY($lat, $z)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): TileYExpr =
    copy(l, r)
}

/** point_in_ring(lon, lat, ring): Boolean — boundary-inclusive PIP over a
  * closed `array<struct<lon,lat>>` ring, reading Tungsten ArrayData in place.
  * The refinement step of the cell-join spatial-join plan (SURVEY.md §7.1.5).
  */
case class PointInRingExpr(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {
  override def dataType: DataType = BooleanType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "point_in_ring"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    (first.dataType, second.dataType, third.dataType) match {
      case (DoubleType, DoubleType, ArrayType(_: StructType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"point_in_ring expects (double, double, array<struct<lon,lat>>), got " +
            s"(${first.dataType}, ${second.dataType}, ${third.dataType})")
    }
  }

  override protected def nullSafeEval(lon: Any, lat: Any, ring: Any): Any =
    GeoMath.pointInRing(
      lon.asInstanceOf[Double], lat.asInstanceOf[Double], ring.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (lon, lat, ring) =>
      s"graft.expr.GeoMath.pointInRing($lon, $lat, $ring)")

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): PointInRingExpr = copy(f, s, t)
}

/** hamming64(a, b): Int — phash/simhash bit distance. */
case class Hamming64Expr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "hamming64"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    GeoMath.hamming64(a.asInstanceOf[Long], b.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"java.lang.Long.bitCount($a ^ $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Hamming64Expr =
    copy(l, r)
}
