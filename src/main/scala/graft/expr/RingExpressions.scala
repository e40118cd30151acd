package graft.expr

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** ring_cells(cell, k): array<long> — cells at Chebyshev tile distance k.
  * Evaluated on the (small) query side of kNN expansion; CodegenFallback.
  */
case class RingCellsExpr(left: Expression, right: Expression)
    extends Expression with CodegenFallback {
  override def children: Seq[Expression] = Seq(left, right)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "ring_cells"

  override def eval(input: InternalRow): Any = {
    val c = left.eval(input); val k = right.eval(input)
    if (c == null || k == null) return null
    new GenericArrayData(
      graft.index.CellIndex.ring(c.asInstanceOf[Long], k.asInstanceOf[Int]))
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): RingCellsExpr =
    copy(newChildren(0), newChildren(1))
}

/** ring_min_sq_dist(lon, lat, cell, k): double — lower bound on squared
  * degree-distance to any cell of ring(cell, k); +Inf when the ring is
  * empty. The kNN termination bound (SURVEY.md §7.5.6).
  */
case class RingMinSqDistExpr(children: Seq[Expression])
    extends Expression with CodegenFallback {
  require(children.length == 4, "ring_min_sq_dist(lon, lat, cell, k)")
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "ring_min_sq_dist"

  override def eval(input: InternalRow): Any = {
    val vs = children.map(_.eval(input))
    if (vs.exists(_ == null)) return null
    graft.index.CellIndex.minSqDistToRing(
      vs(0).asInstanceOf[Double], vs(1).asInstanceOf[Double],
      vs(2).asInstanceOf[Long], vs(3).asInstanceOf[Int])
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): RingMinSqDistExpr = copy(newChildren)
}
