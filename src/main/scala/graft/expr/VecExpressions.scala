package graft.expr

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Static kernels shared by the interpreted and generated paths of the
  * vector expressions — the [[SetOps]] pattern. Each mimics the exact
  * null semantics of the `aggregate(zip_with(a, b, f), 0, _+_)` fold it
  * replaces: `zip_with` pads the shorter array with nulls and `f(x, null)`
  * is null, then the running `acc + null` poisons the sum — so unequal
  * lengths or any null element yield NULL, and two empty arrays yield 0.
  * Boxed return carries the null; the codegen wrapper unboxes.
  */
object VecOps {
  /** Σ aᵢ·bᵢ over two long arrays. */
  def longDot(a: ArrayData, b: ArrayData): java.lang.Long = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var i = 0; var s = 0L
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      s += a.getLong(i) * b.getLong(i); i += 1
    }
    java.lang.Long.valueOf(s)
  }

  /** Σ (aᵢ−bᵢ)² over two long arrays. */
  def longSqDist(a: ArrayData, b: ArrayData): java.lang.Long = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var i = 0; var s = 0L
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val d = a.getLong(i) - b.getLong(i); s += d * d; i += 1
    }
    java.lang.Long.valueOf(s)
  }

  /** Signed twice-shoelace sum over the ring's (lon, lat) structs, in the
    * fold's exact association and order — see [[RingShoelace2Expr]].
    * Boxed null when any element/field is null (the fold's poisoning). */
  def ringShoelace2(a: ArrayData, nFields: Int, lonIdx: Int,
                    latIdx: Int): java.lang.Double = {
    val n = a.numElements()
    var acc = 0.0
    var i = 0
    while (i < n - 1) {
      if (a.isNullAt(i) || a.isNullAt(i + 1)) return null
      val p = a.getStruct(i, nFields)
      val q = a.getStruct(i + 1, nFields)
      if (p.isNullAt(lonIdx) || p.isNullAt(latIdx) ||
        q.isNullAt(lonIdx) || q.isNullAt(latIdx)) return null
      acc = (acc + p.getDouble(lonIdx) * q.getDouble(latIdx)) -
        q.getDouble(lonIdx) * p.getDouble(latIdx)
      i += 1
    }
    java.lang.Double.valueOf(acc)
  }

  /** True iff any element is null (one flag walk, no lambda). */
  def hasNullElement(a: ArrayData): Boolean = {
    val n = a.numElements()
    var i = 0
    while (i < n) {
      if (a.isNullAt(i)) return true
      i += 1
    }
    false
  }

  /** Elementwise floor(x·scale + 0.5) → long; null elements preserved
    * (transform's lambda-of-null semantics, NOT the fold's poisoning). */
  def quantize(a: ArrayData, scale: Double): ArrayData = {
    val n = a.numElements()
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i))
        out(i) = math.floor(a.getDouble(i) * scale + 0.5).toLong
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** Σ aᵢ·bᵢ over two double arrays (the `dotFoldD` fold: the wrapper
    * casts any numeric array to array<double> first — elementwise, same
    * as the fold's per-element x.cast(double)). */
  def doubleDot(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var i = 0; var s = 0.0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      s += a.getDouble(i) * b.getDouble(i); i += 1
    }
    java.lang.Double.valueOf(s)
  }
}

/** ring_shoelace2(ring): SIGNED twice-shoelace-area of an
  * array<struct<..., lon: double, lat: double, ...>> ring — the codegen'd
  * twin of `aggregate(sequence(1, size-1), 0.0, (acc, i) => acc +
  * lon_i·lat_{i+1} − lon_{i+1}·lat_i)` with BIT-IDENTICAL double
  * summation: each step performs (acc + lon_i·lat_{i+1}) −
  * lon_{i+1}·lat_i in that association, ascending i, so the rounded
  * result equals the fold's exactly (spec-pinned — this feeds an ORDER BY
  * that picks the smallest containing outer ring, where a one-ulp
  * difference could flip an ordering). The fold form allocated the index
  * sequence per ring and ran interpreted. Null array / null element /
  * null field → null (the fold's poisoning); rings with < 2 points → 0.0
  * (the fold form THROWS under ANSI via element_at(ring, 0) on its
  * descending sequence(1, 0) — unreachable at the call site, which only
  * feeds closed ≥4-point rings; total here beats partial there).
  */
case class RingShoelace2Expr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "ring_shoelace2"

  private lazy val (lonIdx, latIdx) = child.dataType match {
    case ArrayType(s: StructType, _) =>
      (s.fieldIndex("lon"), s.fieldIndex("lat"))
    case _ => (-1, -1)
  }
  private lazy val nFields = child.dataType match {
    case ArrayType(s: StructType, _) => s.length
    case _ => 0
  }

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(s: StructType, _)
        if s.fieldNames.contains("lon") && s.fieldNames.contains("lat") &&
          s("lon").dataType == DoubleType && s("lat").dataType == DoubleType =>
        TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"$prettyName needs array<struct<.., lon: double, lat: double, ..>>, got $t")
    }

  override protected def nullSafeEval(a: Any): Any =
    VecOps.ringShoelace2(a.asInstanceOf[ArrayData], nFields, lonIdx, latIdx)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val r = ctx.freshName("shoelace")
      s"""
         |java.lang.Double $r = graft.expr.VecOps.ringShoelace2($a, $nFields, $lonIdx, $latIdx);
         |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r; }
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): RingShoelace2Expr =
    copy(child = c)
}

/** array_has_null(a): true iff the array contains a null element — the
  * codegen'd twin of `exists(a, _.isNull)` (higher-order, interpreted)
  * for the malformed-vector prefilters that run on every scanned row.
  */
case class ArrayHasNullExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = BooleanType
  override def nullable: Boolean = child.nullable
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "array_has_null"

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case _: ArrayType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"$prettyName needs an array input, got $t")
    }

  override protected def nullSafeEval(a: Any): Any =
    VecOps.hasNullElement(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.expr.VecOps.hasNullElement($a)")

  override protected def withNewChildInternal(c: Expression): ArrayHasNullExpr =
    copy(child = c)
}

/** quantize(a, scale): array<long> — elementwise floor(x·scale + 0.5),
  * the codegen'd twin of `transform(a, x => floor(x.cast(double)·scale
  * + 0.5).cast(long))` (equality spec-pinned). Unlike the dot kernels,
  * transform PRESERVES null elements (lambda-of-null is null), so the
  * output array carries nulls through; callers cast the input to
  * array<double> (the fold's per-element cast in one step).
  */
case class QuantizeExpr(child: Expression, scale: Double)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "quantize"

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"$prettyName needs array<double> input, got $t")
    }

  override protected def nullSafeEval(a: Any): Any =
    VecOps.quantize(a.asInstanceOf[ArrayData], scale)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.expr.VecOps.quantize($a, $scale)")

  override protected def withNewChildInternal(c: Expression): QuantizeExpr =
    copy(child = c)
}

/** Shared shape of the three binary array<long> kernels: null-intolerant
  * on the array inputs, nullable output (length mismatch / null element),
  * codegen via the static kernel so the whole-stage span stays fused.
  */
abstract class LongArrayBinaryExpr extends BinaryExpression {
  protected def kernel: String // method name on graft.expr.VecOps
  protected def boxed: String  // java.lang.Long | java.lang.Double

  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        TypeCheckResult.TypeCheckFailure(
          s"$prettyName needs two array<bigint> inputs, got ($l, $r)")
    }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val r = ctx.freshName("vecRes")
      s"""
         |$boxed $r = graft.expr.VecOps.$kernel($a, $b);
         |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r; }
       """.stripMargin
    })
}

/** long_dot(a, b): Σ aᵢ·bᵢ for two array<long> — the codegen'd twin of
  * `aggregate(zip_with(a, b, _*_), 0L, _+_)` (equality spec-pinned,
  * nulls included). Higher-order functions are CodegenFallback in Spark,
  * so the fold form runs INTERPRETED with a per-row intermediate array —
  * the defect that made the PQ encode join 22× slower than its kernel;
  * this expression keeps the dot inside whole-stage codegen with zero
  * allocation. Scoring metric of [[graft.ann.Ann.bruteTopK]] and every
  * ANN path's exact-rescore.
  */
case class LongDotExpr(left: Expression, right: Expression)
    extends LongArrayBinaryExpr {
  override def dataType: DataType = LongType
  override def prettyName: String = "long_dot"
  override protected def kernel: String = "longDot"
  override protected def boxed: String = "java.lang.Long"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    VecOps.longDot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): LongDotExpr = copy(l, r)
}

/** long_sq_dist(a, b): Σ (aᵢ−bᵢ)² for two array<long> — the codegen'd
  * twin of the sqDistFold zip_with/aggregate form. Assignment metric of
  * IVF list-building and PQ's declarative encode.
  */
case class LongSqDistExpr(left: Expression, right: Expression)
    extends LongArrayBinaryExpr {
  override def dataType: DataType = LongType
  override def prettyName: String = "long_sq_dist"
  override protected def kernel: String = "longSqDist"
  override protected def boxed: String = "java.lang.Long"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    VecOps.longSqDist(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): LongSqDistExpr = copy(l, r)
}

/** double_dot(a, b): Σ aᵢ·bᵢ for two array<double> — the codegen'd twin
  * of the dotFoldD cast-to-double fold (cosine numerator/norms of the
  * embedding near-dup paths; callers cast numeric arrays to
  * array<double>, which is the fold's per-element cast in one step).
  */
case class DoubleDotExpr(left: Expression, right: Expression)
    extends LongArrayBinaryExpr {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "double_dot"
  override protected def kernel: String = "doubleDot"
  override protected def boxed: String = "java.lang.Double"
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        TypeCheckResult.TypeCheckFailure(
          s"$prettyName needs two array<double> inputs, got ($l, $r)")
    }
  override protected def nullSafeEval(a: Any, b: Any): Any =
    VecOps.doubleDot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): DoubleDotExpr = copy(l, r)
}
