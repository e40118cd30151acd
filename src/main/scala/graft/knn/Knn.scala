package graft.knn

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.Bridge.{column => toCol, expression => toExpr}
import graft.expr.{RingCellsExpr, RingMinSqDistExpr}
import graft.functions.GeoFunctions._

/** k-nearest-points per query via cell-ring expansion (north-rule operator;
  * the reference's latent R-tree realized as a scalable top-k).
  *
  * Algorithm (provably complete — SURVEY.md §7.5.6): explore rings of cells
  * around each query's cell, accumulating a per-query top-k; a query
  * finishes when it holds k candidates AND its kth distance is ≤ the lower
  * bound of the next unexplored ring (no closer point can exist there).
  * Distance metric: squared euclidean in degree space, ties broken by
  * point id — fully deterministic under any parallelism.
  *
  * Each iteration is one shuffle keyed on the spatial cell; finished queries
  * drop out, so late rings touch only the sparse stragglers. `best` is
  * localCheckpoint'd to keep lineage flat across iterations.
  */
object Knn {

  def ringCells(cell: Column, k: Column): Column =
    toCol(RingCellsExpr(toExpr(cell), toExpr(k.cast("int"))))

  /** Default no-op [[cellRing]] round hook. Kept as a named value so
    * `cellRing` can detect "no instrumentation requested" by reference and
    * skip the exact per-round remaining count (a full count job) in favor of
    * a limit-1 emptiness probe.
    */
  val noopRound: (Int, Long) => Unit = (_, _) => ()

  /** Density-derived cell zoom for [[cellRing]]: the SMALLEST z whose
    * hottest cell holds ≤ `hotCellCap` points (estimated from one sampled
    * occupancy pass). The ring join's per-round fanout is
    * O(queries-in-cell × points-in-cell), so a zoom that leaves a whole
    * city inside one cell turns the first round quadratic — measured on the
    * bench fixture (10M points, 60% city-clustered, z=10): the round-1 join
    * wrote billions of rows and ran for over half an hour, vs seconds at
    * the density-appropriate zoom. At 100 TB this is one cheap sampled
    * aggregation (~1% of one column pair) followed by log₂-many roll-up
    * aggs over the ALREADY-AGGREGATED cell frame (≤ sample-size rows, one
    * scalar max each — no per-row data ever reaches the driver).
    *
    * The cap trades dense-cell join fanout against sparse-query ring
    * rounds; ~4k keeps round-1 candidate lists in the 10³-10⁴ range for
    * k ≤ 100 while leaving globally-sparse queries within a few doubling
    * rounds of their neighbors.
    */
  def pickZoom(points: DataFrame, lonCol: String, latCol: String,
               hotCellCap: Long = 4096L, zMin: Int = 4, zMax: Int = 16,
               sampleFraction: Double = 0.01, seed: Long = 7L): Int = {
    require(zMin <= zMax, s"pickZoom: zMin $zMin > zMax $zMax")
    val spark = points.sparkSession
    import spark.implicits._
    val sampled =
      if (sampleFraction >= 1.0) points.select(col(lonCol), col(latCol))
      else points.select(col(lonCol), col(latCol)).sample(sampleFraction, seed)
    val scale = if (sampleFraction >= 1.0) 1.0 else 1.0 / sampleFraction
    // ONE aggregation job for every level at once: explode each sampled
    // point's zMax cell to its ancestor at every z in [zMin, zMax], count
    // per (z, cell), roll up to the hottest cell per z, collect ≤ 26 rows.
    // (The previous level-by-level roll-up loop ran 2 driver-synchronized
    // jobs per level — ~20 s of parallelism-independent latency on the
    // 10M-point scaling leg, dwarfing the actual aggregation work.)
    val cellAtZMax = cell_id(col(lonCol), col(latCol), zMax)
    val levels = (zMin to zMax).map(z => struct(lit(z).as("z"),
      graft.index.CellIndex.ancestorCol(col("__cmax"), zMax, z).as("cell")))
    val hotByZ: Map[Int, Long] = sampled
      .select(cellAtZMax.as("__cmax"))
      .select(explode(array(levels: _*)).as("zc"))
      .groupBy(col("zc.z").as("z"), col("zc.cell").as("cell"))
      .agg(count(lit(1)).as("cn"))
      .groupBy(col("z")).agg(max(col("cn")).as("hot"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    // hottest-cell count is monotone non-decreasing as z gets coarser, so
    // the original walk-down-while-cap-holds loop is equivalent to: the
    // smallest (coarsest) z whose hottest cell fits the cap; zMax if none
    // does; absent levels (empty/sampled-to-empty input) count 0.
    val fits = (zMin to zMax).filter(z => hotByZ.getOrElse(z, 0L) * scale <= hotCellCap)
    if (fits.isEmpty) zMax else fits.min
  }

  /** Per-partition bounded top-k cut over (query_id, point_id, dist) rows:
    * keeps each query's k smallest (dist, point_id) within the partition,
    * deduplicating identical pairs. Runs as mapPartitions in the producing
    * stage — no sort, no shuffle — so downstream global ranking sees at
    * most (queries-in-partition × k) rows per partition. Deterministic at
    * any parallelism: the global top-k is invariant to partition
    * boundaries because every globally-surviving row survives its own
    * partition's cut.
    */
  private def localTopK(rows: DataFrame, k: Int): DataFrame = {
    val spark = rows.sparkSession
    import spark.implicits._
    rows.select(col("query_id").cast("long"), col("point_id").cast("long"),
        col("dist").cast("double"))
      .as[(Long, Long, Double)]
      .mapPartitions { it =>
        val ord = implicitly[Ordering[(Double, Long)]]
        val heaps = new java.util.HashMap[Long, java.util.TreeSet[(Double, Long)]]()
        it.foreach { case (q, p, d) =>
          var s = heaps.get(q)
          if (s == null) { s = new java.util.TreeSet[(Double, Long)](ord); heaps.put(q, s) }
          if (s.size < k) s.add((d, p)) // TreeSet drops exact duplicates
          else if (ord.lt((d, p), s.last)) {
            s.add((d, p))
            if (s.size > k) s.pollLast()
          }
        }
        import scala.jdk.CollectionConverters._
        heaps.entrySet().iterator().asScala.flatMap { e =>
          e.getValue.iterator().asScala.map(v => (e.getKey, v._2, v._1))
        }
      }
      .toDF("query_id", "point_id", "dist")
  }

  def ringMinSqDist(lon: Column, lat: Column, cell: Column, k: Column): Column =
    toCol(RingMinSqDistExpr(Seq(
      toExpr(lon), toExpr(lat), toExpr(cell), toExpr(k.cast("int")))))

  /** @param queries (queryIdCol, qLonCol, qLatCol)
    * @param points  (pointIdCol, lonCol, latCol)
    * @param initCap cap on the density-derived first-round radius
    * @param onRound instrumentation hook, called after every expansion
    *                round with (rounds completed, queries still unfinished)
    *                — separates plan cost (extra rounds = extra shuffles)
    *                from host noise in bench traces; default no-op
    * @param pointCellCol name of a PRECOMPUTED cell column on `points`
    *                (must equal `cell_id(lon, lat, z)` for this z). When the
    *                point table was written `bucketBy(n, cell)` at ingest —
    *                the 100 TB layout — its scan already satisfies every
    *                round's join clustering, so the one-time repartition
    *                (the single-box prep cost in BENCH_SCALING.md's kNN
    *                decomposition) is skipped entirely: zero point-side
    *                shuffle, ever. The frame is still cached (partitioning-
    *                preserving) so later rounds skip the parquet re-scan.
    * @return (query_id, rank, point_id, dist) with rank in 1..k
    */
  def cellRing(queries: DataFrame, queryIdCol: String, qLonCol: String, qLatCol: String,
               points: DataFrame, pointIdCol: String, lonCol: String, latCol: String,
               k: Int, z: Int = 7, maxRings: Int = 1 << 10, initCap: Int = 8,
               scanFinishThreshold: Int = 4096,
               onRound: (Int, Long) => Unit = noopRound,
               pointCellCol: Option[String] = None): DataFrame = {
    val spark = queries.sparkSession
    import spark.implicits._

    val ptsBase = points.select(
      col(pointIdCol).as("point_id"), col(lonCol).as("p_lon"), col(latCol).as("p_lat"),
      pointCellCol.map(col).getOrElse(cell_id(col(lonCol), col(latCol), z)).as("__cell"))
    val pts = pointCellCol match {
      // Bucketed ingest layout: the scan itself reports the join's required
      // hash clustering, so no shuffle ever happens — and InMemoryRelation
      // preserves the scan's HashPartitioning (alias-aware through the
      // project), so caching keeps the zero-exchange property while saving
      // the per-round parquet re-scan. Measured on the 100M-point leg: the
      // uncached re-scan cost ~10.4 s per round flat at 32 cores (bus-bound,
      // parallelism-independent) vs ~8 s cached rounds on the plain path.
      case Some(_) => ptsBase.persist()
      // ONE shuffle of the point table, up front: every round's candidate
      // join keys on __cell, and a cached HashPartitioning(__cell) side
      // satisfies the join's distribution, so each round shuffles only the
      // (small, shrinking) exploded-straggler side. Without this, every
      // round re-shuffled all N points — measured on the 10M-point scaling
      // leg as a per-round floor that got WORSE with more cores (shared
      // memory bus: 32 writers thrash what 8 stream through). The same
      // partitioning makes cellCounts below an exchange-free aggregation.
      case None => ptsBase.repartition(col("__cell")).persist()
    }

    val hardMax = math.min(maxRings, 1 << math.min(z, 20))

    // PER-QUERY adaptive initial radius from the query cell's own occupancy
    // (one count pass over the already-persisted points): a query in a
    // sparse cell starts with enough rings to expect ~4k candidates, so the
    // straggler tail — exactly the sparse-region queries — finishes in the
    // FIRST round instead of costing whole extra shuffle+checkpoint rounds
    // that rerank everyone's accumulated top-k for a handful of queries.
    val cellCounts = pts.groupBy(col("__cell")).agg(count(lit(1)).as("__cn"))
    val r0: Column = least(lit(math.min(initCap, hardMax)), greatest(lit(1),
      ceil(sqrt(lit(4.0 * k) /
        greatest(coalesce(col("__cn"), lit(0L)).cast("double"), lit(1.0)))).cast("int")))
    var remaining = queries.select(
      col(queryIdCol).as("query_id"), col(qLonCol).as("q_lon"), col(qLatCol).as("q_lat"),
      cell_id(col(qLonCol), col(qLatCol), z).as("__qcell"))
      .join(cellCounts.withColumnRenamed("__cell", "__qcell"), Seq("__qcell"), "left")
      .select(col("query_id"), col("q_lon"), col("q_lat"), col("__qcell"),
        lit(-1).as("__explored"), r0.as("__next"))
      .persist()

    val emptyBest = spark.emptyDataFrame
    var best: DataFrame = null
    var round = 0
    // The exact remaining count is a full count job per round; the loop only
    // needs (a) emptiness and (b) whether the count is under the finisher
    // threshold. The uninstrumented path answers both with a LIMIT-bounded
    // count — at most threshold+1 rows produced, so the probe's cost is
    // bounded by the threshold, not the corpus, and any value ≤ threshold is
    // the EXACT count (the limit didn't cut). An emptiness-only probe here
    // once returned a sentinel 1, which made `nRem <= scanFinishThreshold`
    // true for ANY non-empty query set and collapsed the whole operator into
    // scan()'s driver-side collect of every query — a driver OOM at 10M
    // queries, and exactly the unbounded collect the finisher comment
    // promises never happens.
    val instrumented = onRound ne noopRound
    val probeCap = math.max(1, math.min(scanFinishThreshold, Int.MaxValue - 1) + 1)
    def remCount(df: DataFrame): Long =
      if (instrumented) df.count() else df.limit(probeCap).count()
    var nRem = remCount(remaining)
    onRound(round, nRem)

    while (nRem > 0) {
      // STRAGGLER FINISHER: once few queries remain, one exact broadcast-
      // scan pass replaces the remaining doubling rounds. The tail queries
      // are the globally-sparse ones whose ring radius doubles into
      // thousands of (mostly empty) cells per query — O(r²) cell
      // enumeration per round plus a full round of driver-synchronized
      // stages for a handful of queries. scan() probes each cached point
      // against the ≤ threshold stragglers with per-cell pruning: one job,
      // exact by brute force, and the collected query set is bounded by
      // the threshold regardless of corpus size.
      //
      // Default 4096: after the first round nearly every straggler already
      // HOLDS k real candidates (merely unproven), so the finisher runs
      // warm-started — each straggler's current kth distance seeds scan()'s
      // per-query threshold and the pass prunes from its first point,
      // costing roughly the table-stream floor. A ring round, by contrast,
      // costs a near-fixed ~10 s of join + window + checkpoint machinery
      // on the 100M-point leg no matter how few stragglers it serves
      // (measured cold finisher for comparison: ~50 s @8 for 331 queries —
      // the cold start prunes nothing until heaps fill organically, which
      // is why the pre-seed default was 512). Bounds at 4096 stay trivial:
      // driver collect 4096×24 B ≈ 100 KB, per-task heaps 4096×k×16 B
      // ≈ 0.7 MB (k=10), occupied query-grid cells ≤ ~512 by scan()'s own
      // zoom pick.
      if (scanFinishThreshold > 0 && nRem <= scanFinishThreshold) {
        // seed thresholds from the ring phase: for each straggler with a
        // full k candidates, its current kth distance is a valid upper
        // bound on the true kth (collect bounded by the threshold)
        val seeds: Map[Long, Double] =
          if (best == null) Map.empty
          else best
            .join(remaining.select(col("query_id")), Seq("query_id"), "left_semi")
            .groupBy(col("query_id"))
            .agg(count(lit(1)).as("__n"), max(col("dist")).as("__kth"))
            .filter(col("__n") >= k)
            .select(col("query_id"), col("__kth"))
            .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
        val fin = scan(
          remaining.select(col("query_id"), col("q_lon"), col("q_lat")),
          "query_id", "q_lon", "q_lat",
          pts.select(col("point_id"), col("p_lon"), col("p_lat")),
          "point_id", "p_lon", "p_lat", k, initThr = seeds)
        best =
          (if (best == null) fin
           else best
             .join(remaining.select(col("query_id")), Seq("query_id"), "left_anti")
             .unionByName(fin.select(col("query_id"), col("rank"), col("point_id"), col("dist"))))
            // eager: the scan executes HERE, inside the loop, so onRound's
            // trace covers it (lazily it landed in the consumer's first
            // action, invisible to instrumentation); the consumer then
            // reads ≤ |queries|·k checkpointed rows
            .localCheckpoint(true)
        round += 1
        nRem = 0
        onRound(round, 0L)
      } else {
      // explore rings __explored+1 .. __next (per query); in later rounds
      // the radius DOUBLES each time, so stragglers converge in O(log r)
      // shuffles instead of one per ring. The termination bound is
      // unchanged: a query stops when its kth distance beats the lower
      // bound of its first unexplored ring.
      val ringsHere: Column = flatten(transform(
        sequence(col("__explored") + 1, col("__next")),
        kCol => ringCells(col("__qcell"), kCol)))
      // shuffle-hash hint with the exploded-straggler side as the BUILD:
      // sort-merge would re-SORT all N cached points every round (a
      // bus-bound, parallelism-independent cost measured at ~3.4 s/round
      // on the 10M-point leg); hash-probing streams the cached partitions
      // unsorted, and only the small query side shuffles
      val cand = remaining
        .withColumn("__cell", explode(ringsHere))
        .hint("shuffle_hash")
        .join(pts, "__cell")
        .select(col("query_id"), col("point_id"),
          sq_dist_deg(col("p_lon"), col("p_lat"), col("q_lon"), col("q_lat")).as("dist"))

      val merged =
        if (best == null) cand
        else best.select("query_id", "point_id", "dist").unionByName(cand)

      // MAP-SIDE partial top-k before anything shuffles: per input
      // partition, a bounded heap per query keeps its k best (dist,
      // point_id) — any row in the global top-k is by definition in its
      // partition's local top-k, so the cut is lossless, and it runs
      // inside the join's stage with no sort and no exchange. Without it
      // the full candidate volume (tens of millions of rows when dense
      // stragglers double their radius) shuffles into the window — the
      // dominant, bus-bound cost of the 10M-point scaling leg. Duplicate
      // (query, point) rows from ring wrap-aliasing dedupe locally here
      // (identical dist) and globally in the window below.
      val reduced = localTopK(merged, k)

      // wrap-aliasing across rings can re-surface a candidate: dedupe, rank,
      // cut. (A single collect_list/array_sort/slice aggregation was
      // measured ~30% slower here — ObjectHashAggregate loses to the
      // window's unsafe sort on this candidate volume.) ONE explicit
      // repartition on query_id serves the whole round: both windows
      // (HashPartitioning(query_id) satisfies their clustering), the stats
      // aggregation below (partial-only, no exchange), and the remaining
      // update join (both sides end up query_id-partitioned) — the
      // previous dropDuplicates shuffled on (query_id, point_id) and then
      // the window re-shuffled on query_id, two exchanges of the full
      // candidate volume per round.
      val wDedup = Window.partitionBy(col("query_id"), col("point_id")).orderBy(col("dist"))
      val w = Window.partitionBy(col("query_id")).orderBy(col("dist"), col("point_id"))
      val newBest = reduced
        .repartition(col("query_id"))
        .withColumn("__rn", row_number().over(wDedup))
        .filter(col("__rn") === 1)
        .drop("__rn")
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= k)
        .localCheckpoint(true)

      val stats = newBest.groupBy(col("query_id"))
        .agg(count(lit(1)).as("__n"), max(col("dist")).as("__kth"))

      best = newBest
      val prevRemaining = remaining
      remaining = prevRemaining
        .withColumn("__explored", col("__next"))
        .join(stats, Seq("query_id"), "left")
        .filter(col("__explored") < hardMax &&
          (coalesce(col("__n"), lit(0L)) < k ||
            col("__kth") > ringMinSqDist(col("q_lon"), col("q_lat"), col("__qcell"), col("__explored") + 1)))
        .select(col("query_id"), col("q_lon"), col("q_lat"), col("__qcell"), col("__explored"),
          least(lit(hardMax), greatest(col("__explored") + 1, col("__explored") * 2)).as("__next"))
        .persist()
      prevRemaining.unpersist()
      round += 1
      nRem = remCount(remaining)
      onRound(round, nRem)
      }
    }

    remaining.unpersist()
    pts.unpersist()
    if (best == null) emptyBest
    else best.select(col("query_id"), col("rank"), col("point_id"), col("dist"))
  }

  /** Scan-based exact kNN: broadcast the query set, one pass over points
    * with per-partition top-k heaps, merge by query. No shuffle of the
    * point table — the 100 TB plan when queries fit in executor memory.
    *
    * Queries are bucketed into a cell grid; each point offers itself only
    * to grid cells whose bbox lower-bound distance can still beat some
    * member query's current kth threshold (a per-cell max threshold,
    * refreshed periodically — stale bounds are only ever too HIGH, so the
    * skip is always safe). Once heaps warm up, far cells drop out and the
    * inner loop shrinks from O(queries) to O(nearby queries).
    */
  def scan(queries: DataFrame, queryIdCol: String, qLonCol: String, qLatCol: String,
           points: DataFrame, pointIdCol: String, lonCol: String, latCol: String,
           k: Int, gridZ: Int = -1, refreshEvery: Int = 256,
           initThr: Map[Long, Double] = Map.empty): DataFrame = {
    val spark = queries.sparkSession
    import spark.implicits._

    val qs: Array[(Long, Double, Double)] = queries
      .select(col(queryIdCol).cast("long"), col(qLonCol), col(qLatCol))
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    // optional WARM START (`initThr`: query id → any valid UPPER bound on
    // that query's true kth distance, e.g. the kth distance of k real
    // candidates already in hand). Seeding keeps the scan exact: every
    // true top-k member lies within the bound (true kth ≤ bound), the
    // prune below admits equality, and at least the k candidates that
    // produced the bound stream past it again — so the heap always fills
    // and displaced entries are never in the true top-k. Without seeds a
    // query prunes nothing until its heap fills organically; measured on
    // the 100M-point leg the cold start made the finisher pass ~50 s @8
    // for 331 queries vs a seeded pass at roughly the table-stream floor.
    val thr0: Array[Double] =
      qs.map(q => initThr.getOrElse(q._1, Double.MaxValue))
    // TRIANGLE-SEED the unseeded: for any seeded query q' (bound b', in
    // squared degrees), the ≥k points inside √b' of q' are all within
    // d(q,q') + √b' of q, so (d(q,q') + √b')² is a valid upper bound on
    // q's true squared kth — the warm-start exactness argument below holds
    // verbatim (≥k points lie within the seeded bound, so the heap always
    // fills). Without this, ONE unseeded member forces its whole grid cell
    // onto the always-check list, and every point bbox-checks it: measured
    // on the 100M-point leg, 2601 stragglers left 690 of 874 cells
    // unseeded-or-wide → 69.3e9 cell checks ≈ 830 core-s — the entire
    // finisher cost. O(unseeded × seeded) driver work, both ≤ the caller's
    // collect threshold.
    if (initThr.nonEmpty) {
      val seeded = qs.indices.filter(i => thr0(i) < Double.MaxValue)
      if (seeded.nonEmpty) {
        var i = 0
        while (i < thr0.length) {
          if (thr0(i) == Double.MaxValue) {
            var b = Double.MaxValue
            var j = 0
            while (j < seeded.length) {
              val s = seeded(j)
              val dx = qs(i)._2 - qs(s)._2
              val dy = qs(i)._3 - qs(s)._3
              val r = math.sqrt(dx * dx + dy * dy) + math.sqrt(thr0(s))
              if (r * r < b) b = r * r
              j += 1
            }
            thr0(i) = b
          }
          i += 1
        }
      }
    }

    // grid zoom: coarsest level where occupied cells average <= ~8 queries
    val g =
      if (gridZ >= 0) gridZ
      else (0 to 12).find { z =>
        val occupied = qs.iterator.map(q => graft.index.CellIndex.cellId(q._2, q._3, z))
          .toSet.size
        occupied.toLong * 8 >= qs.length
      }.getOrElse(12)
    val grouped: Array[(Long, Array[Int])] = qs.indices
      .groupBy(i => graft.index.CellIndex.cellId(qs(i)._2, qs(i)._3, g))
      .map { case (c, is) => (c, is.toArray) }.toArray

    // GRID INDEX over the query cells (driver-built, broadcast): without
    // it every point bbox-checks every occupied query cell — an
    // O(points × cells) outer loop that dominated the seeded finisher
    // (measured 17.8 s @32 for 2601 queries / 100M points, ~325 cells).
    // Each seeded query cell's reach is bounded: a point farther than
    // r_c = √(max seeded thr of c's members) from c's bbox cannot beat any
    // member's bound, so c only needs to be checked by points whose OWN
    // grid-g cell intersects c's bbox expanded by r_c. Enumerate those
    // point-cells once (driver, tile-rectangle at zoom g) → map
    // point-cell → query-cell indices; cells with an unseeded member or a
    // reach wider than `reachCap` point-cells fall back to an
    // always-check list. Built from the INITIAL bounds — thresholds only
    // tighten afterwards, so the index is never wrong, only loose.
    val reachCap = 4096
    val alwaysB = Array.newBuilder[Int]
    val byPointCell = new java.util.HashMap[Long, scala.collection.mutable.ArrayBuffer[Int]]()
    locally {
      val n = 1L << g
      var c = 0
      while (c < grouped.length) {
        val members = grouped(c)._2
        var worst = 0.0
        var j = 0
        while (j < members.length && worst < Double.MaxValue) {
          val t = thr0(members(j))
          if (t > worst) worst = t
          j += 1
        }
        if (worst == Double.MaxValue) { alwaysB += c }
        else {
          val (mnLon, mnLat, mxLon, mxLat) = graft.index.CellIndex.bounds(grouped(c)._1)
          val r = math.sqrt(worst)
          val x0 = graft.index.CellIndex.tileX(math.max(-180.0, mnLon - r), g)
          val x1 = graft.index.CellIndex.tileX(math.min(180.0, mxLon + r), g)
          // tileY grows southward: the EXPANDED north edge gives the min y
          val y0 = graft.index.CellIndex.tileY(math.min(90.0, mxLat + r), g)
          val y1 = graft.index.CellIndex.tileY(math.max(-90.0, mnLat - r), g)
          // The kNN metric is PLAIN euclidean in degree space (GeoMath
          // .sqDistDeg — no antimeridian wrap), so clamping the expanded
          // range to [-180,180]/[-90,90] is exact: no points exist beyond
          // the edges and distances never wrap around. (An earlier
          // wraps→always fallback here put every edge-touching cell on the
          // always list: 67 cells × 100M points ≈ 6.7e9 useless bbox
          // checks on the scaling leg.)
          val span = (x1 - x0 + 1).max(1) * (y1 - y0 + 1).max(1)
          if (span > reachCap) alwaysB += c
          else {
            var y = y0
            while (y <= y1) {
              var x = x0
              while (x <= x1) {
                val pc = graft.index.CellIndex.pack(x.min(n - 1).max(0), y.min(n - 1).max(0), g)
                var lst = byPointCell.get(pc)
                if (lst == null) {
                  lst = scala.collection.mutable.ArrayBuffer.empty[Int]
                  byPointCell.put(pc, lst)
                }
                lst += c
                x += 1
              }
              y += 1
            }
          }
        }
        c += 1
      }
    }
    val always: Array[Int] = alwaysB.result()
    val pointCellIdx = new java.util.HashMap[Long, Array[Int]](byPointCell.size() * 2)
    byPointCell.forEach((k, v) => pointCellIdx.put(k, v.toArray))

    val bc = spark.sparkContext.broadcast((qs, grouped, thr0, pointCellIdx, always, g))

    val partials = points
      .select(col(pointIdCol).cast("long").as("point_id"),
        col(lonCol).as("p_lon"), col(latCol).as("p_lat"))
      .as[(Long, Double, Double)]
      .mapPartitions { it =>
        val (queries, cells, seeds, cellIdx, alwaysCells, gz) = bc.value
        // per-query bounded max-heap ordered by (dist desc, id desc)
        val heaps = Array.fill(queries.length)(
          new java.util.PriorityQueue[(Double, Long)](k,
            (a: (Double, Long), b: (Double, Long)) => {
              val c = java.lang.Double.compare(b._1, a._1)
              if (c != 0) c else java.lang.Long.compare(b._2, a._2)
            }))
        // current kth-distance per query (seeded bound or +inf while the
        // heap is filling; only ever tightens)
        val thr = seeds.clone()
        // per-cell upper bound on members' thresholds, active from the
        // FIRST point when seeded; refreshed lazily thereafter
        val cellMax = Array.tabulate(cells.length) { c =>
          var m = 0.0
          val idx = cells(c)._2
          var j = 0
          while (j < idx.length) { if (thr(idx(j)) > m) m = thr(idx(j)); j += 1 }
          m
        }
        var sinceRefresh = 0
        // cell bboxes decoded ONCE (CellIndex.bounds does inverse-Mercator
        // trig — far too hot for the per-point loop)
        val cMinX = new Array[Double](cells.length)
        val cMinY = new Array[Double](cells.length)
        val cMaxX = new Array[Double](cells.length)
        val cMaxY = new Array[Double](cells.length)
        locally {
          var c = 0
          while (c < cells.length) {
            val (mnLon, mnLat, mxLon, mxLat) = graft.index.CellIndex.bounds(cells(c)._1)
            cMinX(c) = mnLon; cMinY(c) = mnLat; cMaxX(c) = mxLon; cMaxY(c) = mxLat
            c += 1
          }
        }

        it.foreach { case (pid, plon, plat) =>
          sinceRefresh += 1
          if (sinceRefresh >= refreshEvery) {
            var c = 0
            while (c < cells.length) {
              var m = 0.0
              val idx = cells(c)._2
              var j = 0
              while (j < idx.length) { if (thr(idx(j)) > m) m = thr(idx(j)); j += 1 }
              cellMax(c) = m
              c += 1
            }
            sinceRefresh = 0
          }
          def checkCell(c: Int): Unit = {
            // squared distance to the cell bbox, inline (0 inside)
            val dx = if (plon < cMinX(c)) cMinX(c) - plon
                     else if (plon > cMaxX(c)) plon - cMaxX(c) else 0.0
            val dy = if (plat < cMinY(c)) cMinY(c) - plat
                     else if (plat > cMaxY(c)) plat - cMaxY(c) else 0.0
            // a stale-high cellMax only wastes work; never skips wrongly.
            // <=: an equal-distance smaller-id point can still enter.
            if (dx * dx + dy * dy <= cellMax(c)) {
              val idx = cells(c)._2
              var j = 0
              while (j < idx.length) {
                val i = idx(j)
                val q = queries(i)
                val qdx = plon - q._2; val qdy = plat - q._3
                val d = qdx * qdx + qdy * qdy
                if (d <= thr(i)) {
                  val h = heaps(i)
                  if (h.size < k) {
                    h.add((d, pid))
                    if (h.size == k) thr(i) = h.peek()._1
                  } else {
                    val top = h.peek()
                    if (d < top._1 || (d == top._1 && pid < top._2)) {
                      h.poll(); h.add((d, pid)); thr(i) = h.peek()._1
                    }
                  }
                }
                j += 1
              }
            }
          }
          // only the query cells this point can possibly matter to: its
          // own grid-g cell's precomputed reach list + the always-check
          // tail (unseeded or wide-reach cells) — O(1)-ish per point
          // instead of the full occupied-cell loop
          val near = cellIdx.get(graft.index.CellIndex.cellId(plon, plat, gz))
          if (near != null) {
            var ci = 0
            while (ci < near.length) { checkCell(near(ci)); ci += 1 }
          }
          var ai = 0
          while (ai < alwaysCells.length) { checkCell(alwaysCells(ai)); ai += 1 }
        }
        heaps.iterator.zipWithIndex.flatMap { case (h, i) =>
          val qid = queries(i)._1
          val it2 = h.iterator()
          val buf = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Double)]
          while (it2.hasNext) { val (d, pid) = it2.next(); buf += ((qid, pid, d)) }
          buf
        }
      }.toDF("query_id", "point_id", "dist")

    val w = Window.partitionBy(col("query_id")).orderBy(col("dist"), col("point_id"))
    partials
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("point_id"), col("dist"))
  }
}
