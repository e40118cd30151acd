package graft.expr

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

import graft.index.FlatRtree

/** rtree_probe(lon, lat): array<long> — ids of the broadcast polygons
  * containing the point, bbox lookup + exact point-in-ring fused inside
  * [[FlatRtree]].
  *
  * Replaces the former ScalaUDF probe: `doGenCode` emits one static-shaped
  * call against a per-partition-resolved tree reference, so the probe stays
  * inside whole-stage codegen with no Scala-function invocation, no
  * catalyst↔scala value conversion, and no per-row allocation beyond the
  * exact-size result array (VERDICT r01: the UDF probe was the
  * allocation-bound ceiling on the broadcast join's thread scaling).
  */
case class RtreeProbeExpr(left: Expression, right: Expression,
                          bc: Broadcast[FlatRtree]) extends BinaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "rtree_probe"

  override protected def nullSafeEval(lon: Any, lat: Any): Any =
    bc.value.probeArray(lon.asInstanceOf[Double], lat.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bcRef = ctx.addReferenceObj("rtreeBc", bc, classOf[Broadcast[FlatRtree]].getName)
    // resolve the broadcast once per generated-class instance, not per row
    val tree = ctx.addMutableState("graft.index.FlatRtree", "rtree",
      v => s"$v = (graft.index.FlatRtree) $bcRef.value();", forceInline = true)
    defineCodeGen(ctx, ev, (lon, lat) => s"$tree.probeArray($lon, $lat)")
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): RtreeProbeExpr =
    copy(left = l, right = r)
}
