package graft.expr

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Static kernels shared by the interpreted and generated paths of the
  * set expressions — same pattern as [[graft.index.CellIndex]] /
  * [[GeoMath]].
  */
object SetOps {
  /** Element count of the intersection of two string arrays that are each
    * SORTED ascending (UTF8 binary order — `sort_array`'s order) and
    * duplicate-free (`collect_set`'s contract): one merge pass over
    * Tungsten ArrayData in place, no allocation. EXACT — compares the
    * string bytes, not hashes, so the count matches a string-equality
    * join's regardless of charset.
    */
  def sortedIntersectCount(a: ArrayData, b: ArrayData): Int = {
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0
    var j = 0
    var n = 0
    while (i < na && j < nb) {
      val cmp = a.getUTF8String(i).compareTo(b.getUTF8String(j))
      if (cmp == 0) { n += 1; i += 1; j += 1 }
      else if (cmp < 0) i += 1
      else j += 1
    }
    n
  }
}

/** sorted_intersect_count(a, b): Int — |a ∩ b| for two sorted distinct
  * string arrays. The verification kernel of the candidate-first exact
  * Jaccard pass ([[graft.dedup.Dedup.verifyCandidates]]): with per-doc
  * packed shingle arrays, a candidate pair's intersection is one in-row
  * merge instead of an exploded (id, shingle) join + re-aggregation —
  * the shuffle carries |docs| packed rows, never |candidates|·|shingles|
  * exploded ones.
  */
case class SortedIntersectCountExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "sorted_intersect_count"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), ArrayType(StringType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName needs two array<string> inputs, got ($l, $r)")
    }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    SetOps.sortedIntersectCount(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.expr.SetOps.sortedIntersectCount($a, $b)")

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): SortedIntersectCountExpr = copy(l, r)
}
