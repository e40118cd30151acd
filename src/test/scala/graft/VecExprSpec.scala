package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import graft.ann.Ann

/** The codegen'd vector expressions (LongDot / LongSqDist / DoubleDot)
  * vs the interpreted `aggregate(zip_with(...))` folds they replaced:
  * value-identical on every row INCLUDING the fold's null semantics
  * (length mismatch → null, null element → null, both-empty → 0), plus
  * a plan assert that the scoring projection stays inside whole-stage
  * codegen — the entire point of the swap.
  */
class VecExprSpec extends SparkSpecBase {

  import spark.implicits._

  // the original fold forms, verbatim (what dotFold/sqDistFold/dotFoldD
  // compiled to before the expression swap)
  private def dotRef(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0L), (acc, v) => acc + v)
  private def sqDistRef(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)), lit(0L), (acc, v) => acc + v)
  private def dotDRef(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  /** Adversarial row set: matched lengths, mismatched lengths (both
    * directions), empty arrays, null elements on either side, negative
    * values, and large magnitudes (products near but inside Long range
    * when summed — overflow WRAPS identically in both forms, so equality
    * still holds; we pin behavior, not saturation). */
  private lazy val rows = {
    def mix(i: Long, d: Long): Long = graft.geo.GeoFixtures.mix(i * 131L + d) % 100000L
    val dense = (0 until 200).map { i =>
      val n = 1 + i % 9
      (i.toLong,
        Some((0 until n).map(d => Option(mix(i, d)))),
        Some((0 until n).map(d => Option(mix(i + 7, d)))))
    }
    val edges = Seq(
      (1000L, Some(Seq(Some(1L), Some(2L))), Some(Seq(Some(3L)))), // len mismatch
      (1001L, Some(Seq(Some(1L))), Some(Seq(Some(3L), Some(4L)))), // len mismatch
      (1002L, Some(Seq.empty[Option[Long]]), Some(Seq.empty[Option[Long]])), // both empty
      (1003L, Some(Seq(Some(1L), None)), Some(Seq(Some(3L), Some(4L)))), // null elem left
      (1004L, Some(Seq(Some(1L), Some(2L))), Some(Seq(None, Some(4L)))), // null elem right
      (1005L, None, Some(Seq(Some(3L)))), // null array left
      (1006L, Some(Seq(Some(3L))), None), // null array right
      (1007L, Some(Seq(Some(-5L), Some(7L))), Some(Seq(Some(11L), Some(-13L)))))
    (dense ++ edges).toDF("id", "a", "b")
      .select(col("id"), col("a").cast("array<bigint>"), col("b").cast("array<bigint>"))
  }

  test("LongDot / LongSqDist / DoubleDot value-identical to the fold forms, nulls included") {
    val out = rows.select(col("id"),
      Ann.dotFold(col("a"), col("b")).as("dot"),
      dotRef(col("a"), col("b")).as("dot_ref"),
      Ann.sqDistFold(col("a"), col("b")).as("sq"),
      sqDistRef(col("a"), col("b")).as("sq_ref"),
      Ann.dotFoldD(col("a"), col("b")).as("dd"),
      dotDRef(col("a"), col("b")).as("dd_ref")).collect()
    assert(out.length === 208)
    out.foreach { r =>
      assert(r.isNullAt(1) === r.isNullAt(2), s"dot nullability diverged at id ${r.getLong(0)}")
      if (!r.isNullAt(1))
        assert(r.getLong(1) === r.getLong(2), s"dot diverged at id ${r.getLong(0)}")
      assert(r.isNullAt(3) === r.isNullAt(4), s"sqdist nullability diverged at id ${r.getLong(0)}")
      if (!r.isNullAt(3))
        assert(r.getLong(3) === r.getLong(4), s"sqdist diverged at id ${r.getLong(0)}")
      assert(r.isNullAt(5) === r.isNullAt(6), s"ddot nullability diverged at id ${r.getLong(0)}")
      if (!r.isNullAt(5))
        assert(r.getDouble(5) === r.getDouble(6), s"ddot diverged at id ${r.getLong(0)}")
    }
    // the edge rows actually exercise the null paths
    val byId = out.map(r => r.getLong(0) -> r.isNullAt(1)).toMap
    Seq(1000L, 1001L, 1003L, 1004L, 1005L, 1006L).foreach(id =>
      assert(byId(id), s"edge row $id should be null"))
    assert(!byId(1002L), "both-empty row must be 0, not null")
  }

  test("QuantizeExpr equals the transform/floor form, null elements preserved") {
    val data = Seq(
      (0L, Some(Seq(Option(0.0625f), Option(-0.0625f), Option(1.5f), Option(-1.5f)))),
      (1L, Some(Seq(Option(0.1f), None, Option(0.9999f)))), // null ELEMENT survives
      (2L, Some(Seq.empty[Option[Float]])),
      (3L, None),
      (4L, Some(Seq(Option(Float.MaxValue), Option(Float.MinValue), Option(0.0f)))))
    val df = data.toDF("id", "e")
    Seq(1000.0, 100.0).foreach { scale =>
      val ref = transform(col("e"),
        x => floor(x.cast("double") * lit(scale) + lit(0.5)).cast("long"))
      val out = df.select(col("id"),
        Ann.quantizeScaled(col("e"), scale).as("q"), ref.as("q_ref")).collect()
      out.foreach { r =>
        assert(r.isNullAt(1) === r.isNullAt(2), s"nullability diverged at id ${r.getLong(0)}")
        if (!r.isNullAt(1))
          assert(r.getSeq[Any](1) === r.getSeq[Any](2),
            s"quantize diverged at id ${r.getLong(0)} scale $scale")
      }
      // row 1 keeps its null element (transform semantics, not the fold's)
      val row1 = out.find(_.getLong(0) == 1L).get
      assert(row1.getSeq[Any](1)(1) == null)
    }
  }

  test("norm2 equals the explicit sqrt-of-squares fold") {
    val ref = sqrt(aggregate(transform(col("a"), x => x.cast("double") * x.cast("double")),
      lit(0.0), (acc, v) => acc + v))
    val out = rows.filter(col("id") < 1000).select(
      Ann.norm2(col("a")).as("n"), ref.as("n_ref")).collect()
    out.foreach(r => assert(r.getDouble(0) === r.getDouble(1)))
  }

  test("MinHashSigsExpr equals the composed transform/array_min column stack") {
    import org.apache.spark.sql.graftbridge.Bridge.{column => toCol, expression => toExpr}
    import graft.dedup.Dedup
    val n = 6 // shingle chars hashed
    val k = 4 // hashes
    // adversarial shingle arrays: ASCII, strings shorter than n, empty
    // string, unicode (2/3/4-byte code points — ascii/substring index
    // CODE POINTS), empty array, null element, all-null elements
    val data = Seq(
      (0L, Some(Seq(Option("hello world"), Option("the quick brown")))),
      (1L, Some(Seq(Option("ab"), Option(""), Option("abcdef")))),
      (2L, Some(Seq(Option("héllo wörld"), Option("日本語のテキスト"), Option("emoji 🚀 tail")))),
      (3L, Some(Seq.empty[Option[String]])),
      (4L, Some(Seq(Option("real"), None))),
      (5L, Some(Seq[Option[String]](None, None))),
      (6L, Some(Seq(Option("ñ"), Option("€€€€€€€€"), Option("𐍈𐍈𐍈")))))
    val df = data.toDF("id", "__shs")
    // build both outputs as (id, mh_0..mh_{k-1}) rows and compare cell-wise
    val refRows = {
      val withHashes = df.withColumn("__hh",
        transform(col("__shs"), s => Dedup.shingleHash(s, n)))
      val cols = (0 until k).map { j =>
        array_min(transform(col("__hh"), h =>
          pmod(lit(Dedup.HashA(j)) * h + lit(Dedup.HashB(j)), lit(Dedup.P)))).as(s"mh_$j")
      }
      withHashes.select(col("id") +: cols: _*).collect()
        .map(r => r.getLong(0) -> (1 to k).map(i => if (r.isNullAt(i)) null else r.getLong(i))).toMap
    }
    val gotRows = {
      val withSigs = df.withColumn("__mh", toCol(graft.expr.MinHashSigsExpr(
        toExpr(col("__shs")), n, Dedup.HashA.take(k), Dedup.HashB.take(k), Dedup.P)))
      val cols = (0 until k).map(j => element_at(col("__mh"), j + 1).as(s"mh_$j"))
      withSigs.select(col("id") +: cols: _*).collect()
        .map(r => r.getLong(0) -> (1 to k).map(i => if (r.isNullAt(i)) null else r.getLong(i))).toMap
    }
    assert(gotRows.keySet === refRows.keySet)
    gotRows.keySet.foreach { id =>
      assert(gotRows(id) === refRows(id), s"minhash diverged at id $id")
    }
    // the edge rows exercise what they claim
    assert(refRows(3L).forall(_ == null), "empty array must yield null mins")
    assert(refRows(5L).forall(_ == null), "all-null elements must yield null mins")
    assert(refRows(4L).forall(_ != null), "null element must be skipped, not poison")
  }

  test("RollingFingerprintExpr equals the aggregate(split) fold, unicode included") {
    import graft.text.TextOps
    val data = Seq(
      (0L, Some("the quick brown fox jumps over the lazy dog")),
      (1L, Some("")),
      (2L, Some("a")),
      (3L, Some("héllo wörld — 日本語 🚀 𐍈")),
      (4L, Some("x" * 5000)), // long doc: the modular fold must not drift
      (5L, None))
    val df = data.toDF("id", "text")
    val ref = aggregate(split(col("text"), ""), lit(0L),
      (acc, c) => (acc * lit(31L) + ascii(c)) % lit(TextOps.FingerprintP))
    val out = df.select(col("id"),
      TextOps.fingerprintRolling(col("text")).as("fp"), ref.as("fp_ref")).collect()
    out.foreach { r =>
      assert(r.isNullAt(1) === r.isNullAt(2), s"nullability diverged at id ${r.getLong(0)}")
      if (!r.isNullAt(1))
        assert(r.getLong(1) === r.getLong(2), s"fingerprint diverged at id ${r.getLong(0)}")
    }
    assert(out.count(r => !r.isNullAt(1) && r.getLong(1) != 0L) >= 3)
  }

  test("MinHashSigsExpr matches the composed stack on MALFORMED UTF-8 shingles") {
    import org.apache.spark.sql.graftbridge.Bridge.{column => toCol, expression => toExpr}
    import graft.dedup.Dedup
    val n = 4
    val k = 3
    // one array whose shingles mix valid text with invalid leads, bare
    // continuations, and truncated tails (enter via binary->string casts)
    val shingleBytes: Seq[Array[Byte]] = Seq(
      "valid".getBytes("UTF-8"),
      Array(0x80.toByte, 'a'.toByte, 'b'.toByte),
      Array(0xC3.toByte, 0x28.toByte, 'z'.toByte),
      Array('x'.toByte, 0xF0.toByte, 0x9F.toByte),
      Array(0xFF.toByte))
    val df = shingleBytes.zipWithIndex
      .map { case (b, i) => (i.toLong, b) }.toDF("i", "b")
      .groupBy().agg(collect_list(col("b").cast("string")).as("__shs"))
    val refRow = {
      val withHashes = df.withColumn("__hh",
        transform(col("__shs"), s => Dedup.shingleHash(s, n)))
      val cols = (0 until k).map { j =>
        array_min(transform(col("__hh"), h =>
          pmod(lit(Dedup.HashA(j)) * h + lit(Dedup.HashB(j)), lit(Dedup.P)))).as(s"mh_$j")
      }
      withHashes.select(cols: _*).collect()(0)
    }
    val gotRow = {
      val withSigs = df.withColumn("__mh", toCol(graft.expr.MinHashSigsExpr(
        toExpr(col("__shs")), n, Dedup.HashA.take(k), Dedup.HashB.take(k), Dedup.P)))
      withSigs.select((0 until k).map(j => element_at(col("__mh"), j + 1)): _*).collect()(0)
    }
    (0 until k).foreach { j =>
      assert(gotRow.getLong(j) === refRow.getLong(j), s"malformed shingle divergence at mh_$j")
    }
  }

  test("RollingFingerprintExpr matches the composed form on MALFORMED UTF-8") {
    import graft.text.TextOps
    // invalid byte sequences can enter via binary->string casts (no
    // validation); the byte walker must advance and decode exactly like
    // Spark's substring/ascii do or the fingerprint silently diverges
    // from the pre-swap engine for such rows
    val cases: Seq[(Long, Array[Byte])] = Seq(
      (0L, Array(0x80.toByte, 'a'.toByte)), // bare continuation byte
      (1L, Array('a'.toByte, 0xC3.toByte)), // truncated 2-byte tail
      (2L, Array(0xC3.toByte, 0x28.toByte)), // invalid continuation
      (3L, Array(0xFF.toByte, 'A'.toByte)), // invalid lead > 0xF4
      (4L, Array(0xE2.toByte, 0x82.toByte)), // truncated 3-byte tail
      (5L, Array(0xF0.toByte, 0x9F.toByte, 'x'.toByte)), // truncated 4-byte + ascii
      (6L, Array('o'.toByte, 'k'.toByte))) // control: valid
    val df = cases.toDF("id", "b").select(col("id"), col("b").cast("string").as("text"))
    val ref = aggregate(split(col("text"), ""), lit(0L),
      (acc, c) => (acc * lit(31L) + ascii(c)) % lit(TextOps.FingerprintP))
    val out = df.select(col("id"),
      TextOps.fingerprintRolling(col("text")).as("fp"), ref.as("fp_ref")).collect()
    out.foreach { r =>
      assert(r.getLong(1) === r.getLong(2), s"malformed-UTF8 divergence at id ${r.getLong(0)}")
    }
  }

  test("RingShoelace2Expr bit-identical to the aggregate fold, rounding order included") {
    import org.apache.spark.sql.graftbridge.Bridge.{column => toCol, expression => toExpr}
    // irregular coordinates whose products round — a different summation
    // association would differ in the last ulp, which matters because the
    // value feeds the smallest-containing-outer ORDER BY
    def mix(v: Long): Long = graft.geo.GeoFixtures.mix(v)
    val rings = (0 until 50).map { r =>
      val n = 4 + r % 7
      val pts = (0 to n).map { i =>
        val a = (mix(r * 97L + i) % 1000000L) / 2718.281828
        val b = (mix(r * 89L + i * 7L) % 1000000L) / 3141.592653
        (a, b)
      }
      (r.toLong, pts :+ pts.head) // closed
    }
    val df = rings.toDF("id", "raw")
      .select(col("id"), expr("transform(raw, p -> struct(p._1 AS lon, p._2 AS lat))").as("ring"))
    val fold = abs(aggregate(
      sequence(lit(1), size(col("ring")) - 1), lit(0.0),
      (acc, i) => acc +
        element_at(col("ring"), i).getField("lon") * element_at(col("ring"), i + 1).getField("lat") -
        element_at(col("ring"), i + 1).getField("lon") * element_at(col("ring"), i).getField("lat")))
    val out = df.select(col("id"),
      abs(toCol(graft.expr.RingShoelace2Expr(toExpr(col("ring"))))).as("a"),
      fold.as("a_ref")).collect()
    out.foreach { r =>
      // exact bit equality, not a tolerance: same ops, same order
      assert(java.lang.Double.doubleToLongBits(r.getDouble(1)) ===
        java.lang.Double.doubleToLongBits(r.getDouble(2)),
        s"shoelace rounding diverged at ring ${r.getLong(0)}")
    }
  }

  test("scoring projection with LongDot stays inside whole-stage codegen") {
    // parquet-backed, not a local relation — ConvertToLocalRelation would
    // otherwise eagerly evaluate the projection and leave no plan to audit
    val dir = java.nio.file.Files.createTempDirectory("vecexpr").toString
    rows.filter(col("id") < 1000).write.mode("overwrite").parquet(dir)
    val df = spark.read.parquet(dir)
      .select(Ann.dotFold(col("a"), col("b")).as("dot"))
    val plan = df.queryExecution.executedPlan.toString
    // "*(n)" prefixes mark operators inside a whole-stage-codegen stage
    assert(plan.contains("*(1) Project"), s"projection not in a codegen span:\n$plan")
    assert(plan.contains("long_dot"), s"expression missing from plan:\n$plan")
    // the interpreted fold's operators must be gone from this projection
    assert(!plan.contains("zip_with"), s"fold form leaked into plan:\n$plan")
  }
}
