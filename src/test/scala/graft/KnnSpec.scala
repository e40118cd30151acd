package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.geo.GeoFixtures
import graft.knn.Knn

/** kNN cell-ring expansion and scan plan vs brute-force oracle — G7. */
class KnnSpec extends SparkSpecBase {

  private lazy val points = GeoFixtures.images(spark, 2000)
    .select(monotonicallyStablePid(), col("lon"), col("lat")).cache()

  private def monotonicallyStablePid() =
    expr("cast(substring(image_id, 4, 9) as long)").as("pid")

  private lazy val queries = {
    import spark.implicits._
    Seq((1L, -77.0, 38.9), (2L, 2.3, 48.8), (3L, 0.0, 0.0), (4L, 179.5, 0.0),
      (5L, -179.5, 0.0), (6L, 10.0, 84.0), (7L, 60.0, -60.0))
      .toDF("qid", "qlon", "qlat")
  }

  private def brute(k: Int): Set[(Long, Int, Long)] = {
    val d = points.crossJoin(queries)
      .select(col("qid"), col("pid"),
        ((col("lon") - col("qlon")) * (col("lon") - col("qlon")) +
          (col("lat") - col("qlat")) * (col("lat") - col("qlat"))).as("dist"))
    val w = Window.partitionBy(col("qid")).orderBy(col("dist"), col("pid"))
    d.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
      .select(col("qid"), col("rank"), col("pid"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
  }

  // scanThreshold = 0 forces the pure ring-expansion path (the default
  // would scan-finish these few queries immediately); the default-path
  // tests below cover the finisher
  private def runCellRing(k: Int, z: Int, scanThreshold: Int = 0): Set[(Long, Int, Long)] =
    Knn.cellRing(queries, "qid", "qlon", "qlat", points, "pid", "lon", "lat", k, z,
        scanFinishThreshold = scanThreshold)
      .select(col("query_id"), col("rank"), col("point_id"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet

  test("cellRing matches brute force (k=5, z=7) incl. antimeridian queries") {
    assert(runCellRing(5, 7) === brute(5))
  }

  test("cellRing matches brute force at coarse zoom (k=3, z=4)") {
    assert(runCellRing(3, 4) === brute(3))
  }

  test("cellRing matches brute force for large k (k=40, z=7)") {
    assert(runCellRing(40, 7) === brute(40))
  }

  test("cellRing scan finisher: default threshold takes over and stays exact") {
    assert(runCellRing(5, 7, scanThreshold = 512) === brute(5))
  }

  test("cellRing scan finisher engages mid-loop (threshold below query count)") {
    // 7 queries, threshold 3: at least one ring round runs, then the
    // finisher replaces the straggler tail — result must still be exact
    assert(runCellRing(5, 7, scanThreshold = 3) === brute(5))
  }

  test("warm finisher takes the WHOLE straggler set after round 0 (two-tier threshold)") {
    // cold threshold 1 admits nobody at round 0 (7 queries > 1), but once
    // round 0 has seeded kth bounds the budget-derived warm threshold
    // absorbs every straggler in ONE seeded scan: the trace must show ring
    // round 0 and then a single finisher round ending at 0 remaining — no
    // doubling rounds — and the result must still be exact
    val trace = scala.collection.mutable.ArrayBuffer.empty[(Int, Long)]
    val got = Knn.cellRing(queries, "qid", "qlon", "qlat", points, "pid", "lon", "lat",
        k = 5, z = 7, scanFinishThreshold = 1,
        onRound = (r, n) => trace += ((r, n)))
      .select(col("query_id"), col("rank"), col("point_id"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(got === brute(5))
    assert(trace.last === ((trace.length - 1, 0L)))
    assert(trace.length <= 3,
      s"expected round 0 + one warm finisher round, got trace $trace")
  }

  test("maxRings cap hands off capped stragglers to the exact finisher (no silent truncation)") {
    // maxRings = 1 caps every query after one ring round; the tiny state
    // budget pins the warm threshold at 1, so the capped straggler set
    // (> 1 query) can only finish through the forced sumCells == 0 handoff
    // — the result must STILL be exact, not a truncated-radius top-k
    val trace = scala.collection.mutable.ArrayBuffer.empty[(Int, Long)]
    val got = Knn.cellRing(queries, "qid", "qlon", "qlat", points, "pid", "lon", "lat",
        k = 5, z = 6, maxRings = 1, scanFinishThreshold = 1,
        finisherStateBudget = 1L, onRound = (r, n) => trace += ((r, n)))
      .select(col("query_id"), col("rank"), col("point_id"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(got === brute(5))
    assert(trace.last._2 === 0L, s"loop must converge, got trace $trace")
  }

  test("scan plan matches brute force (k=7)") {
    val got = Knn.scan(queries, "qid", "qlon", "qlat", points, "pid", "lon", "lat", 7)
      .select(col("query_id"), col("rank"), col("point_id"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(got === brute(7))
  }

  test("seeded scan with EXACT kth bounds (tightest legal seeds) stays exact") {
    // the adversarial warm start: initThr = each query's true kth distance
    // — every true top-k point sits ON or inside the bound, so any off-by-
    // one in the <=/< prune or heap tie-breaks would drop a result. A
    // partially-seeded map also exercises the mixed always-check path.
    val k = 7
    val exactKth: Map[Long, Double] = points.crossJoin(queries)
      .select(col("qid"),
        ((col("lon") - col("qlon")) * (col("lon") - col("qlon")) +
          (col("lat") - col("qlat")) * (col("lat") - col("qlat"))).as("dist"))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("qid")).orderBy(col("dist"))))
      .filter(col("rank") === k)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    def run(seeds: Map[Long, Double]) =
      Knn.scan(queries, "qid", "qlon", "qlat", points, "pid", "lon", "lat", k,
          initThr = seeds)
        .select(col("query_id"), col("rank"), col("point_id"))
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(run(exactKth) === brute(k))
    assert(run(exactKth.filter(_._1 % 2 == 0)) === brute(k)) // mixed seeded/unseeded
    // one seeded query only: every other query gets a TRIANGLE-derived
    // bound (d(q,q') + √thr_q')² from that single seed — including the
    // polar/antimeridian queries farthest from it, whose derived bounds
    // are huge but must stay valid upper bounds (exactness, not pruning,
    // is what's asserted)
    assert(run(exactKth.filter(_._1 == 1L)) === brute(k))
  }

  test("pickZoom: smallest zoom whose hottest cell is under the cap") {
    import spark.implicits._
    import graft.index.CellIndex
    // one dense blob (600 points inside one z=10 cell) + a sparse sprinkle;
    // exact counting (sampleFraction = 1.0) so the assertion is exact
    val blob = (0 until 600).map { i =>
      (i.toLong, 10.0 + (i % 25) * 0.001, 45.0 + (i / 25) * 0.001)
    }
    val sparse = (0 until 50).map { i =>
      (1000L + i, -170.0 + i * 6.9, -80.0 + i * 3.1)
    }
    val pts = (blob ++ sparse).toDF("pid", "lon", "lat")
    val z = Knn.pickZoom(pts, "lon", "lat", hotCellCap = 64L,
      zMin = 4, zMax = 18, sampleFraction = 1.0)
    // the picked zoom must satisfy the cap...
    def hotAt(zz: Int): Long = pts
      .groupBy(graft.functions.GeoFunctions.cell_id(col("lon"), col("lat"), zz))
      .count().agg(max("count")).as[Long].head()
    assert(hotAt(z) <= 64L, s"picked z=$z violates the cap: ${hotAt(z)}")
    // ...and be MINIMAL: one level coarser must break it (unless at zMin)
    if (z > 4) assert(hotAt(z - 1) > 64L, s"z=${z - 1} also fits — z=$z not minimal")
    // a cap nothing violates picks the coarsest level allowed
    assert(Knn.pickZoom(pts, "lon", "lat", hotCellCap = 100000L,
      zMin = 4, zMax = 16, sampleFraction = 1.0) === 4)
  }

  test("CellIndex.parentCol matches CellIndex.parent (shared bit layout)") {
    import spark.implicits._
    import graft.index.CellIndex
    val rng = new scala.util.Random(42)
    for (z <- Seq(1, 5, 12, 20, CellIndex.MaxZ)) {
      val cells = Seq.fill(50) {
        val lon = rng.nextDouble() * 360 - 180
        val lat = rng.nextDouble() * 170 - 85
        CellIndex.cellId(lon, lat, z)
      }
      val got = cells.toDF("cell")
        .select(CellIndex.parentCol(col("cell"), z).as("p"))
        .collect().map(_.getLong(0)).toSeq
      assert(got === cells.map(CellIndex.parent), s"z=$z")
    }
  }

  test("pickZoom survives empty and sampled-to-empty input") {
    import spark.implicits._
    val empty = Seq.empty[(Long, Double, Double)].toDF("pid", "lon", "lat")
    // empty frame: max(__cn) is null — must not throw decoding into Long
    assert(Knn.pickZoom(empty, "lon", "lat", zMin = 4, zMax = 16,
      sampleFraction = 1.0) === 4)
    // tiny table + minuscule sample fraction: sample() plausibly returns
    // zero rows; any answer in [zMin, zMax] is fine, throwing is not
    val tiny = Seq((1L, 10.0, 45.0), (2L, 10.1, 45.1)).toDF("pid", "lon", "lat")
    val z = Knn.pickZoom(tiny, "lon", "lat", zMin = 4, zMax = 16,
      sampleFraction = 1e-9)
    assert(z >= 4 && z <= 16)
  }

  test("k larger than population returns all points ranked") {
    import spark.implicits._
    val tiny = Seq((100L, 1.0, 1.0), (101L, 2.0, 2.0), (102L, 3.0, 3.0))
      .toDF("pid", "lon", "lat")
    val q = Seq((1L, 0.0, 0.0)).toDF("qid", "qlon", "qlat")
    val got = Knn.cellRing(q, "qid", "qlon", "qlat", tiny, "pid", "lon", "lat", k = 10, z = 5)
      .select("rank", "point_id").collect().map(r => (r.getInt(0), r.getLong(1))).toSet
    assert(got === Set((1, 100L), (2, 101L), (3, 102L)))
  }
}
