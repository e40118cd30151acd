package graft.expr

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Static kernel for the fused MinHash signature pass — the [[SetOps]]
  * pattern. Semantics are pinned byte-for-byte (spec) to the composed
  * column form it replaces:
  *
  *   __hh  = transform(shs, s -> Σ_{j=1..n} ascii(substring(s, j, 1)) · 81^(n-j))
  *   mh_k  = array_min(transform(__hh, h -> pmod(a_k·h + b_k, p)))
  *
  * including the fold's null semantics: null array → null result; empty
  * array → every min null (array_min of empty); null ELEMENT → skipped
  * (array_min skips nulls); all-null elements → all mins null.
  * `ascii` returns the first code point of the string (0 for ""), and
  * `substring(s, j, 1)` indexes CODE POINTS — both mirrored here over the
  * UTF8String bytes without allocating per-character substrings.
  */
object MinHashOps {
  /** Decode the code point starting at byte `bi` IF it begins a strictly
    * valid UTF-8 sequence that fits in the array; returns it packed as
    * (len << 24) | cp (code points < 2^21, lossless), or -1 on anything
    * malformed (bare continuation, bad lead, overlong form, surrogate,
    * out-of-range, truncated tail). Callers fall back to the exact
    * reference semantics on -1 — Spark renders malformed bytes as U+FFFD
    * through Java's replacement decoder, and faithfully reproducing that
    * byte-for-byte belongs in the slow path, not here. */
  private def validCodePointAt(bytes: Array[Byte], bi: Int): Int = {
    val b0 = bytes(bi) & 0xFF
    if (b0 < 0x80) return (1 << 24) | b0
    def cont(k: Int): Boolean =
      bi + k < bytes.length && (bytes(bi + k) & 0xC0) == 0x80
    if (b0 >= 0xC2 && b0 <= 0xDF) {
      if (!cont(1)) return -1
      (2 << 24) | (((b0 & 0x1F) << 6) | (bytes(bi + 1) & 0x3F))
    } else if (b0 >= 0xE0 && b0 <= 0xEF) {
      if (!cont(1) || !cont(2)) return -1
      val b1 = bytes(bi + 1) & 0xFF
      if (b0 == 0xE0 && b1 < 0xA0) return -1 // overlong
      if (b0 == 0xED && b1 >= 0xA0) return -1 // surrogate range
      (3 << 24) | (((b0 & 0x0F) << 12) | ((b1 & 0x3F) << 6) | (bytes(bi + 2) & 0x3F))
    } else if (b0 >= 0xF0 && b0 <= 0xF4) {
      if (!cont(1) || !cont(2) || !cont(3)) return -1
      val b1 = bytes(bi + 1) & 0xFF
      if (b0 == 0xF0 && b1 < 0x90) return -1 // overlong
      if (b0 == 0xF4 && b1 >= 0x90) return -1 // > U+10FFFF
      (4 << 24) | (((b0 & 0x07) << 18) | ((b1 & 0x3F) << 12) |
        ((bytes(bi + 2) & 0x3F) << 6) | (bytes(bi + 3) & 0x3F))
    } else -1 // bare continuation 0x80-0xBF or invalid lead 0xC0/0xC1/0xF5+
  }

  /** First-n-code-points positional hash of one shingle: walks the UTF8
    * bytes directly; position j past the string's end contributes
    * ascii("") = 0 (substring beyond length is empty). Malformed bytes
    * bail to [[shingleHashRef]], the exact ascii∘substring semantics. */
  def shingleHash(s: UTF8String, n: Int, pow81: Array[Long]): Long = {
    val bytes = s.getBytes
    var h = 0L
    var bi = 0 // byte index
    var j = 0  // code-point index
    while (j < n && bi < bytes.length) {
      val packed = validCodePointAt(bytes, bi)
      if (packed < 0) return shingleHashRef(s, n, pow81)
      h += (packed & 0xFFFFFF).toLong * pow81(n - 1 - j)
      bi += packed >>> 24
      j += 1
    }
    h
  }

  /** Reference path for malformed shingles: literally
    * Σ ascii(substring(s, j, 1)) · 81^(n-j). Spark's substring (and its
    * split) step through the bytes by numBytesForFirstByte jumps — a
    * malformed "char" keeps its lead's claimed width (clamped) — and
    * ascii renders that char's bytes through the Java replacement decoder
    * and takes codePointAt(0); [[refCodePoint]] is exactly that. */
  private def shingleHashRef(s: UTF8String, n: Int, pow81: Array[Long]): Long = {
    val bytes = s.getBytes
    var h = 0L
    var bi = 0
    var j = 0
    while (j < n && bi < bytes.length) {
      val len = math.min(UTF8String.numBytesForFirstByte(bytes(bi)), bytes.length - bi)
      h += refCodePoint(bytes, bi, len).toLong * pow81(n - 1 - j)
      bi += len
      j += 1
    }
    h
  }

  /** ascii() of the char occupying bytes [bi, bi+len): Java replacement
    * decode, first code point (malformed runs decode to U+FFFD). */
  private def refCodePoint(bytes: Array[Byte], bi: Int, len: Int): Int =
    UTF8String.fromBytes(bytes, bi, len).toString.codePointAt(0)

  /** Sequential rolling hash (acc·31 + codePoint) mod p over every code
    * point of the text — one byte walk, no per-character substrings.
    * Malformed bytes bail to [[rollingFingerprintRef]], the exact
    * semantics of the `aggregate(split(text, ""), ...)` fold it
    * replaced (spec-pinned on invalid leads, bare continuations, and
    * truncated tails). */
  def rollingFingerprint(s: UTF8String, p: Long): Long = {
    val bytes = s.getBytes
    var acc = 0L
    var bi = 0
    while (bi < bytes.length) {
      val packed = validCodePointAt(bytes, bi)
      if (packed < 0) return rollingFingerprintRef(s, p)
      acc = (acc * 31L + (packed & 0xFFFFFF)) % p
      bi += packed >>> 24
    }
    acc
  }

  /** Reference path for malformed text: split("") steps by the same
    * numBytesForFirstByte jumps as substring, then ascii() each char —
    * see [[shingleHashRef]]'s note. */
  private def rollingFingerprintRef(s: UTF8String, p: Long): Long = {
    val bytes = s.getBytes
    var acc = 0L
    var bi = 0
    while (bi < bytes.length) {
      val len = math.min(UTF8String.numBytesForFirstByte(bytes(bi)), bytes.length - bi)
      acc = (acc * 31L + refCodePoint(bytes, bi, len)) % p
      bi += len
    }
    acc
  }

  /** All numHashes signature mins in ONE pass over the shingle array.
    * Returns a GenericArrayData of java.lang.Long (null where no non-null
    * element existed — array_min-of-empty semantics). */
  def minhashSigs(shs: ArrayData, n: Int, a: Array[Long], b: Array[Long],
                  p: Long, pow81: Array[Long]): ArrayData = {
    val k = a.length
    val mins = new Array[Long](k)
    java.util.Arrays.fill(mins, Long.MaxValue)
    var any = false
    val ns = shs.numElements()
    var i = 0
    while (i < ns) {
      if (!shs.isNullAt(i)) {
        any = true
        val h = shingleHash(shs.getUTF8String(i), n, pow81)
        var j = 0
        while (j < k) {
          // pmod(x, p): Spark's positive modulus
          val r0 = (a(j) * h + b(j)) % p
          val r = if (r0 < 0) r0 + p else r0
          if (r < mins(j)) mins(j) = r
          j += 1
        }
      }
      i += 1
    }
    val out = new Array[Any](k)
    if (any) {
      var j = 0
      while (j < k) { out(j) = mins(j); j += 1 }
    } // else: all nulls (empty or all-null input)
    new GenericArrayData(out)
  }
}

/** rolling_fingerprint(text): fold (acc·31 + codePoint) mod p over the
  * text's code points — the codegen'd twin of
  * `aggregate(split(text, ""), 0L, (acc, c) => (acc·31 + ascii(c)) % p)`
  * (equality spec-pinned, unicode included). The composed form allocated
  * one single-character string PER CHARACTER (`split`) and folded it
  * interpreted; this walks the UTF8 bytes once.
  */
case class RollingFingerprintExpr(child: Expression, p: Long)
    extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "rolling_fingerprint"

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"$prettyName needs a string input, got $t")
    }

  override protected def nullSafeEval(text: Any): Any =
    MinHashOps.rollingFingerprint(text.asInstanceOf[UTF8String], p)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, t =>
      s"graft.expr.MinHashOps.rollingFingerprint($t, ${p}L)")

  override protected def withNewChildInternal(c: Expression): RollingFingerprintExpr =
    copy(child = c)
}

/** minhash_sigs(shingles): array<long> of the numHashes MinHash signature
  * components for one document's packed distinct-shingle array — the
  * codegen'd one-pass twin of the per-hash `array_min(transform(...))`
  * column stack in [[graft.dedup.Dedup.minhashSignaturesPacked]]
  * (equality spec-pinned, nulls and unicode included). The column form
  * ran INTERPRETED (higher-order functions are CodegenFallback):
  * per doc it allocated the hash array plus numHashes projected arrays
  * and boxed every element; this walks the shingle bytes once and keeps
  * numHashes running mins, no intermediates.
  */
case class MinHashSigsExpr(child: Expression, shingleN: Int,
                           hashA: Seq[Long], hashB: Seq[Long], p: Long)
    extends UnaryExpression {
  require(hashA.length == hashB.length, "hashA/hashB length mismatch")

  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "minhash_sigs"

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"$prettyName needs array<string> input, got $t")
    }

  private lazy val aArr = hashA.toArray
  private lazy val bArr = hashB.toArray
  private lazy val pow81: Array[Long] =
    (0 until shingleN).map(e => math.pow(81, e).toLong).toArray

  override protected def nullSafeEval(shs: Any): Any =
    MinHashOps.minhashSigs(shs.asInstanceOf[ArrayData], shingleN, aArr, bArr, p, pow81)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aRef = ctx.addReferenceObj("minhashA", aArr, "long[]")
    val bRef = ctx.addReferenceObj("minhashB", bArr, "long[]")
    val powRef = ctx.addReferenceObj("minhashPow81", pow81, "long[]")
    defineCodeGen(ctx, ev, s =>
      s"graft.expr.MinHashOps.minhashSigs($s, $shingleN, $aRef, $bRef, ${p}L, $powRef)")
  }

  override protected def withNewChildInternal(c: Expression): MinHashSigsExpr =
    copy(child = c)
}
