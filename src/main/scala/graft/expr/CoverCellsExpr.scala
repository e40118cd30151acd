package graft.expr

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** cover_cells(minLon, minLat, maxLon, maxLat, z): array<long>
  *
  * All cells at zoom z intersecting the bbox — the polygon-side expansion of
  * the cell-join spatial-join plan. Evaluated only on the (small) polygon
  * side, so CodegenFallback is fine; the hot point-side path
  * ([[CellIdExpr]]) is codegen'd.
  */
case class CoverCellsExpr(children: Seq[Expression])
    extends Expression with CodegenFallback {
  require(children.length == 5, "cover_cells(minLon, minLat, maxLon, maxLat, z)")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "cover_cells"

  override def eval(input: InternalRow): Any = {
    val vs = children.map(_.eval(input))
    if (vs.exists(_ == null)) return null
    val cells = graft.index.CellIndex.cover(
      vs(0).asInstanceOf[Double], vs(1).asInstanceOf[Double],
      vs(2).asInstanceOf[Double], vs(3).asInstanceOf[Double],
      vs(4).asInstanceOf[Int])
    new GenericArrayData(cells)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): CoverCellsExpr = copy(newChildren)
}
