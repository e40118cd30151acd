package org.apache.spark.sql.graftbridge

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.StructType

/** Access bridge for `private[sql]` surface the engine legitimately needs:
  * wrapping custom Catalyst Expressions as public `Column`s, and building a
  * DataFrame from an `RDD[InternalRow]` without the external-Row conversion
  * layer. This is the standard pattern used by public Spark ecosystem
  * libraries (Sedona, Delta) on Spark 4's ColumnNode API.
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** `spark.internalCreateDataFrame` — InternalRow in, no
    * CatalystTypeConverters on the way back (the rows must already match
    * `schema`'s internal representation, e.g. UTF8String for strings).
    */
  def internalDf(spark: SparkSession, rdd: RDD[InternalRow], schema: StructType): DataFrame =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .internalCreateDataFrame(rdd, schema)

  /** The physical `RDD[InternalRow]` of a DataFrame (no Row conversion). */
  def internalRdd(df: DataFrame): RDD[InternalRow] = df.queryExecution.toRdd

  /** Columnar fast path: the `ColumnarBatch` RDD of a plan that is a pure
    * column-pruned scan — one columnar leaf, no filters, and only
    * attribute(-rename) projections above it, so executing the leaf alone
    * is semantics-preserving. Callers read values straight off the column
    * vectors, skipping the ColumnarToRow UnsafeRow materialization (one
    * full copy of every payload byte). Returns the batch RDD plus the
    * leaf's column names for ordinal lookup; None = take the row path.
    */
  def columnarScan(df: DataFrame)
      : Option[(RDD[org.apache.spark.sql.vectorized.ColumnarBatch], Seq[String])] = {
    import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute}
    import org.apache.spark.sql.execution.{ColumnarToRowExec, InputAdapter, ProjectExec, WholeStageCodegenExec}
    val plan = df.queryExecution.executedPlan
    // WHITELIST of semantics-free wrappers: executing the leaf alone must
    // be equivalent, so ANY node not provably a pass-through (filters,
    // samples, limits, …) disqualifies the fast path
    val projections = plan.collect { case pr: ProjectExec => pr }
    val safe = plan.collect {
      case pr: ProjectExec => pr.projectList.forall {
        case _: Attribute => true
        case a: Alias => a.child.isInstanceOf[Attribute]
        case _ => false
      }
      case _: ColumnarToRowExec | _: InputAdapter | _: WholeStageCodegenExec => true
      case l if l.children.isEmpty => true // the scan leaf itself
      case _ => false
    }.forall(identity)
    // resolve an output attribute to the LEAF attribute it reads, by
    // exprId through the alias chain — name matching alone lets a rename
    // whose target collides with another leaf column slip through, after
    // which callers would read the wrong ordinals off the batch
    def leafExprId(id: org.apache.spark.sql.catalyst.expressions.ExprId)
        : org.apache.spark.sql.catalyst.expressions.ExprId = {
      var cur = id
      var hop = true
      while (hop) {
        hop = false
        projections.foreach(_.projectList.foreach {
          case a: Alias if a.exprId == cur => a.child match {
            case at: Attribute if at.exprId != cur => cur = at.exprId; hop = true
            case _ =>
          }
          case _ =>
        })
      }
      cur
    }
    plan.collectLeaves() match {
      case Seq(leaf) if leaf.supportsColumnar && safe &&
          plan.output.forall { o =>
            val lid = leafExprId(o.exprId)
            // same column AND same name: a true rename falls back to the
            // row path rather than risking a name collision at the caller
            leaf.output.exists(a => a.exprId == lid && a.name == o.name)
          } =>
        Some((leaf.executeColumnar(), leaf.output.map(_.name)))
      case _ => None
    }
  }
}
