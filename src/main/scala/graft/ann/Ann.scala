package graft.ann

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (`array<float>`).
  *
  *  - [[quantize]] + [[bruteTopK]] — exact top-k by integer-quantized dot
  *    product: the correctness baseline — broadcast query side, one pass
  *    over the corpus. Integer arithmetic → engine-exact, oracle-checkable.
  *  - [[cosineTopK]] — float cosine variant (builtin zip_with/aggregate
  *    fold, no UDF).
  *  - [[lshBuckets]] + [[lshTopK]] — sign-random-projection LSH: corpus is
  *    bucketed by a b-bit sketch; queries probe only near buckets (Hamming
  *    radius 0..r). The 100 TB scale path: bucket join instead of full scan.
  */
object Ann {

  /** int-quantized copy of an embedding: floor(x · 1000 + 0.5). Expressed
    * as floor — not `round` — because dyadic floats CAN land on an exact .5
    * (x = 0.0625 → 62.5) where HALF_UP semantics could differ between
    * engines; floor(x + 0.5) is a single well-defined double op in Spark,
    * DuckDB, and `java.lang.Math.round`, so the tie case is engine-exact.
    */
  def quantize(emb: Column): Column =
    transform(emb, x => floor(x.cast("double") * lit(1000.0) + lit(0.5)).cast("long"))

  /** Sequential-fold dot product of two equal-length arrays (builtin). */
  def dotFold(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0L), (acc, v) => acc + v)

  def dotFoldD(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  def norm2(a: Column): Column =
    sqrt(aggregate(transform(a, x => x.cast("double") * x.cast("double")),
      lit(0.0), (acc, v) => acc + v))

  /** Exact top-k by quantized dot product. Queries are broadcast; the
    * corpus is scanned once; per-query ranking via window.
    * Output: query_id, rank, vec_id, dot.
    */
  def bruteTopK(queries: DataFrame, qIdCol: String, qEmbCol: String,
                corpus: DataFrame, idCol: String, embCol: String, k: Int): DataFrame = {
    val q = queries.select(col(qIdCol).as("query_id"), quantize(col(qEmbCol)).as("q_emb"))
    val c = corpus.select(col(idCol).as("vec_id"), quantize(col(embCol)).as("c_emb"))
    val scored = c.crossJoin(broadcast(q))
      .select(col("query_id"), col("vec_id"), dotFold(col("q_emb"), col("c_emb")).as("dot"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("dot").desc, col("vec_id"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("vec_id"), col("dot"))
  }

  /** Float cosine top-k (same plan, double arithmetic). */
  def cosineTopK(queries: DataFrame, qIdCol: String, qEmbCol: String,
                 corpus: DataFrame, idCol: String, embCol: String, k: Int): DataFrame = {
    val q = queries.select(col(qIdCol).as("query_id"), col(qEmbCol).as("q_emb"),
      norm2(col(qEmbCol)).as("q_norm"))
    val c = corpus.select(col(idCol).as("vec_id"), col(embCol).as("c_emb"),
      norm2(col(embCol)).as("c_norm"))
    val scored = c.crossJoin(broadcast(q))
      .select(col("query_id"), col("vec_id"),
        (dotFoldD(col("q_emb"), col("c_emb")) / (col("q_norm") * col("c_norm"))).as("cosine"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("cosine").desc, col("vec_id"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("vec_id"), col("cosine"))
  }

  /** Embedding near-duplicate pairs: cosine(a, b) >= tau, decided with
    * EXACT integer arithmetic on quantized vectors (factor 100 keeps
    * dot² · tauDen² inside Long): cos >= tau  ⇔  dot > 0 and
    * dot² · tauDen² >= tauNum² · |a|² · |b|².  The fifth dedup mode
    * (embedding-cosine) of the training-data suite.
    */
  def embeddingNearDupPairs(df: DataFrame, idCol: String, embCol: String,
                            tauNum: Int, tauDen: Int, numBlocks: Int = 0): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    // EXACT all-pairs as a distributed triangle join: vectors are hashed
    // into B blocks; each unordered block pair (i<=j) is one task holding
    // both blocks, and every vector pair lives in exactly one task (its
    // blocks' pair), so no driver materialization, no dedup pass, and task
    // memory is bounded at 2·n/B vectors. O(n²) compute is inherent to the
    // exact mode and dominates the n·B replication shuffle; for corpora
    // where n² is off the table use [[embeddingNearDupPairsLsh]].
    // triangleQuantized repartitions BEFORE the ×B replication fan-out: a
    // small corpus parquet arrives as 1-2 input splits, and without it the
    // entire replication (quantize, pack, serialize, shuffle-write n·B
    // rows) runs on 1-2 tasks no matter how many cores exist — measured as
    // a ~18 s parallelism-independent floor on the 96k-vector scaling leg
    // (fitting T(c) = F + W/c to the 8/32-core points). The pre-fan-out
    // frame is tiny (n rows), so this exchange costs ~nothing.
    val quant = triangleQuantized(df, idCol, embCol)
    // default B: B(B+1)/2 pair tasks ≈ 8× the cluster's cores — with one
    // task per partition (below), wave quantization is the only balance
    // loss and it shrinks as 1/waves (measured: 2× cores' worth of tasks
    // gave 0.61 N→4N efficiency, the last partial wave dominating); raise
    // numBlocks explicitly when 2·n/B vectors outgrow a task's memory (the
    // O(n²) compute, not the n·B replication shuffle, is the real cost)
    val b = if (numBlocks > 0) numBlocks
            else math.max(2, math.ceil(math.sqrt(
              16.0 * spark.sparkContext.defaultParallelism)).toInt)
    val tn2 = tauNum.toLong * tauNum
    val td2 = tauDen.toLong * tauDen

    triangleTasks(quant, b).mapPartitionsWithIndex { (task, itKv) =>
        // invert the dense rank back to the block pair (lo, hi)
        var lo = 0
        var base = 0
        while (base + (b - lo) <= task) { base += b - lo; lo += 1 }
        val hi = lo + (task - base)
        val left = scala.collection.mutable.ArrayBuffer.empty[(Long, Array[Short])]
        val right = scala.collection.mutable.ArrayBuffer.empty[(Long, Array[Short])]
        itKv.foreach { case (_, (vblk, vid, qe)) =>
          if (vblk == lo) left += ((vid, qe))
          if (vblk == hi && lo != hi) right += ((vid, qe))
        }
        // Snapshot each side into PARALLEL PRIMITIVE ARRAYS and run the
        // O(n²) loop allocation-free: the previous shape routed every pair
        // through an emit((Long, Array[Short], Long) × 2) helper whose
        // ordered-pair destructuring built a boxed Tuple6 PER PAIR — at the
        // 96k-vector scaling leg that is 4.6e9 tuple+box allocations, and
        // the allocation/GC bandwidth (shared across all cores of the one
        // socket) was what broke N→4N scaling (0.60 efficiency; ~120 ns per
        // 64-dim pair vs ~25 ns for the bare dot loop).
        def sideOf(buf: scala.collection.mutable.ArrayBuffer[(Long, Array[Short])])
            : (Array[Long], Array[Array[Short]], Array[Long]) = {
          val n = buf.length
          val ids = new Array[Long](n)
          val vecs = new Array[Array[Short]](n)
          val norms = new Array[Long](n)
          var i = 0
          while (i < n) {
            val (vid, v) = buf(i)
            ids(i) = vid; vecs(i) = v
            var s = 0L; var d = 0
            while (d < v.length) { s += v(d) * v(d); d += 1 }
            norms(i) = s
            i += 1
          }
          (ids, vecs, norms)
        }
        val (lIds, lVecs, lNorms) = sideOf(left)
        val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long)]
        // per-component products fit Int (|q| ≤ Short.MaxValue ⇒ q² < 2³⁰);
        // the accumulator widens to Long per add. dot²·td2 stays inside
        // Long by the factor-100 quantization contract (scaladoc above).
        def scan(idI: Long, eI: Array[Short], nI: Long,
                 ids: Array[Long], vecs: Array[Array[Short]], norms: Array[Long],
                 from: Int): Unit = {
          var j = from
          while (j < ids.length) {
            val idJ = ids(j)
            if (idI != idJ) { // duplicate input ids: never emit a self-pair
              val eJ = vecs(j)
              var dot = 0L; var d = 0
              while (d < eI.length) { dot += eI(d) * eJ(d); d += 1 }
              if (dot > 0 && dot * dot * td2 >= tn2 * nI * norms(j)) {
                if (idI < idJ) out += ((idI, idJ, dot))
                else out += ((idJ, idI, dot))
              }
            }
            j += 1
          }
        }
        if (lo == hi) {
          var i = 0
          while (i < lIds.length) {
            scan(lIds(i), lVecs(i), lNorms(i), lIds, lVecs, lNorms, i + 1)
            i += 1
          }
        } else {
          val (rIds, rVecs, rNorms) = sideOf(right)
          var i = 0
          while (i < lIds.length) {
            scan(lIds(i), lVecs(i), lNorms(i), rIds, rVecs, rNorms, 0)
            i += 1
          }
        }
        out.iterator
      }
      .toDF("id_1", "id_2", "dot")
  }

  /** Replication + shuffle half of [[embeddingNearDupPairs]], factored so
    * the scaling bench can time it in isolation from the O(n²) kernel:
    * each vector is short-packed ONCE (the pack + its range-validation used
    * to run per REPLICA on a 24×-exploded Dataset frame — 24× redundant
    * work and a 2.3M-row Dataset decode, all before any pair math), then
    * fanned to its b task keys in an RDD flatMap where every replica shares
    * the same packed array reference (the shuffle write still copies b
    * times — that is the wire — but the CPU-side pack happens once).
    *
    * Task ids are DENSE ranks of the unordered block pairs (lo <= hi):
    *   dense(lo, hi) = lo*b - lo*(lo-1)/2 + (hi - lo)   in [0, b(b+1)/2)
    * so each task owns exactly one reduce partition (identity partitioner).
    * Hashing task keys into spark.sql.shuffle.partitions instead (the
    * original groupByKey plan) collides ~2× cores' keys into ~cores bins —
    * balls-in-bins puts 4-6 keys in the worst bin and the stage waits on it.
    *
    * Packing to shorts before the shuffle ships 4× fewer bytes than the
    * long arrays; the factor-100 quantization of unit-scale embeddings is
    * two orders of magnitude inside Short range, and the check validates
    * rather than truncates so an out-of-contract embedding fails loudly.
    */
  /** Factor-100 integer quantization + round-robin spread of the corpus,
    * shared by [[embeddingNearDupPairs]] and the bench isolation leg.
    */
  private[graft] def triangleQuantized(df: DataFrame, idCol: String,
                                       embCol: String): DataFrame =
    df.select(col(idCol).cast("long").as("vid"),
      transform(col(embCol), x => floor(x.cast("double") * lit(100.0) + lit(0.5)).cast("long")).as("qe"))
      .repartition(math.max(2, df.sparkSession.sparkContext.defaultParallelism))

  private[graft] def triangleTasks(quant: DataFrame, b: Int)
      : org.apache.spark.rdd.RDD[(Int, (Int, Long, Array[Short]))] = {
    val spark = quant.sparkSession
    import spark.implicits._
    val nTasks = b * (b + 1) / 2
    val identityPart = new org.apache.spark.Partitioner {
      def numPartitions: Int = nTasks
      def getPartition(key: Any): Int = key.asInstanceOf[Int]
    }
    quant.as[(Long, Array[Long])].rdd
      .flatMap { case (vid, qe) =>
        val s = new Array[Short](qe.length)
        var i = 0
        while (i < s.length) {
          val v = qe(i)
          require(v >= Short.MinValue && v <= Short.MaxValue,
            s"embeddingNearDupPairs: quantized component $v out of Short range " +
              "(expected unit-scale embeddings; factor-100 quantization)")
          s(i) = v.toShort
          i += 1
        }
        val blk = java.lang.Math.floorMod(vid, b.toLong).toInt
        val row = (blk, vid, s)
        (0 until b).iterator.map { j =>
          val lo = math.min(blk, j)
          val hi = math.max(blk, j)
          (lo * b - lo * (lo - 1) / 2 + (hi - lo), row)
        }
      }
      .partitionBy(identityPart)
  }

  /** Approximate near-dup pairs via sign-LSH blocking — the path for
    * corpora where exact O(n²) compute is off the table. Each vector is
    * replicated into its own sketch bucket plus all radius-1 neighbor
    * buckets; a candidate pair is scanned in exactly one task
    * (min(bucketA, bucketB)), so no dedup pass. Pairs whose sketches differ
    * by >1 bit are missed — recall vs the exact mode is measured on planted
    * near-dups in DedupAnnSpec (raise `bits` for precision, lower it or add
    * sketch repetitions for recall).
    */
  def embeddingNearDupPairsLsh(df: DataFrame, idCol: String, embCol: String,
                               tauNum: Int, tauDen: Int,
                               bits: Int = 8, dims: Int = 64): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val quant = df.select(col(idCol).cast("long").as("vid"),
      transform(col(embCol), x => floor(x.cast("double") * lit(100.0) + lit(0.5)).cast("long")).as("qe"))
      .withColumn("home", signSketch(col("qe"), bits, dims))
    val probeKeys = array((col("home") +: (0 until bits).map(p =>
      col("home").bitwiseXOR(lit(1L << p)))): _*)
    val replicated = quant.select(col("vid"), col("qe"), col("home"),
      explode(probeKeys).as("task"))
    val tn2 = tauNum.toLong * tauNum
    val td2 = tauDen.toLong * tauDen

    replicated.select(col("task"), col("home"), col("vid"), col("qe"))
      .as[(Long, Long, Long, Array[Long])]
      .groupByKey(_._1)
      .flatMapGroups { (task: Long, it: Iterator[(Long, Long, Long, Array[Long])]) =>
        // home vectors live here; probe vectors visit from a radius-1 bucket
        val home = scala.collection.mutable.ArrayBuffer.empty[(Long, Array[Long])]
        val probe = scala.collection.mutable.ArrayBuffer.empty[(Long, Array[Long])]
        it.foreach { case (_, vHome, vid, qe) =>
          if (vHome == task) home += ((vid, qe))
          else if (vHome > task) probe += ((vid, qe)) // min-bucket task owns the pair
        }
        def normOf(v: Array[Long]): Long = {
          var s = 0L; var i = 0
          while (i < v.length) { s += v(i) * v(i); i += 1 }
          s
        }
        val hn = home.map(p => normOf(p._2)).toArray
        val pn = probe.map(p => normOf(p._2)).toArray
        val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long)]
        def emit(id1: Long, e1: Array[Long], n1: Long,
                 id2: Long, e2: Array[Long], n2: Long): Unit = {
          if (id1 == id2) return // duplicate input ids: never emit a self-pair
          val (a, ea, na, bId, eb, nb) =
            if (id1 < id2) (id1, e1, n1, id2, e2, n2) else (id2, e2, n2, id1, e1, n1)
          var dot = 0L; var d = 0
          while (d < ea.length) { dot += ea(d) * eb(d); d += 1 }
          if (dot > 0 && dot * dot * td2 >= tn2 * na * nb) out += ((a, bId, dot))
        }
        var i = 0
        while (i < home.length) {
          var j = i + 1
          while (j < home.length) {
            emit(home(i)._1, home(i)._2, hn(i), home(j)._1, home(j)._2, hn(j))
            j += 1
          }
          j = 0
          while (j < probe.length) {
            emit(home(i)._1, home(i)._2, hn(i), probe(j)._1, probe(j)._2, pn(j))
            j += 1
          }
          i += 1
        }
        out.iterator
      }
      .toDF("id_1", "id_2", "dot")
  }

  /** Deterministic pseudo-random hyperplanes: plane p, dim d coefficient =
    * ((p·12582917 + d·104729) mod 97) − 48 — integer, engine-independent.
    */
  def planeCoeff(p: Int, d: Int): Long = ((p * 12582917L + d * 104729L) % 97L) - 48L

  /** b-bit sign sketch of a quantized embedding. One fold per plane over a
    * literal coefficient array (compact codegen; a flat bits×dims expression
    * tree would dominate janino compile time).
    */
  def signSketch(qEmb: Column, bits: Int, dims: Int): Column =
    (0 until bits).map { p =>
      val coeffs = typedLit((0 until dims).map(d => planeCoeff(p, d)))
      val proj = aggregate(zip_with(qEmb, coeffs, (x, c) => x * c),
        lit(0L), (acc, v) => acc + v)
      when(proj > 0, lit(1L << p)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** Corpus bucketed by sign sketch — persist/bucket this by `bucket` at
    * scale (write.bucketBy) so queries touch only matching buckets.
    */
  def lshBuckets(corpus: DataFrame, idCol: String, embCol: String,
                 bits: Int, dims: Int): DataFrame =
    corpus.select(col(idCol).as("vec_id"), quantize(col(embCol)).as("c_emb"))
      .withColumn("bucket", signSketch(col("c_emb"), bits, dims))

  /** Integer squared L2 distance between two quantized vectors. */
  def sqDistFold(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)), lit(0L), (acc, v) => acc + v)

  /** IVF-style ANN — the second scale path next to sign-LSH: a coarse
    * quantizer of deterministic centroids (every `centroidEvery`-th corpus
    * vector) partitions the corpus into inverted lists once (broadcast
    * centroids, one argmin pass; at 10^12 scale persist the lists with
    * `write.bucketBy(list_id)`), and each query exact-scores only the
    * `nprobe` nearest lists. Assignment metric is integer squared L2 on
    * the quantized vectors; final scoring is the same quantized dot as
    * [[bruteTopK]] — everything integer-exact and oracle-expressible.
    * Output: query_id, rank, vec_id, dot.
    */
  def ivfTopK(queries: DataFrame, qIdCol: String, qEmbCol: String,
              corpus: DataFrame, idCol: String, embCol: String,
              k: Int, centroidEvery: Long, nprobe: Int): DataFrame = {
    val c = corpus.select(col(idCol).as("vec_id"), quantize(col(embCol)).as("c_emb"))
    val cent = c.filter(pmod(col("vec_id"), lit(centroidEvery)) === 0)
      .select(col("vec_id").as("cid"), col("c_emb").as("cent_emb"))
    // corpus-side argmin as a hash aggregation over a (dist, cid) struct
    // (lexicographic min = min dist, ties to min cid) — partial aggregation
    // and no sort shuffle, unlike a row_number window
    val lists = c.crossJoin(broadcast(cent))
      .select(col("vec_id"),
        struct(sqDistFold(col("c_emb"), col("cent_emb")).as("dist"), col("cid").as("cid")).as("dc"))
      .groupBy(col("vec_id")).agg(min(col("dc")).as("m"))
      .select(col("vec_id"), col("m.cid").as("cid"))
    val q = queries.select(col(qIdCol).as("query_id"), quantize(col(qEmbCol)).as("q_emb"))
    val wQ = Window.partitionBy(col("query_id")).orderBy(col("dist"), col("cid"))
    val probes = q.crossJoin(broadcast(cent))
      .select(col("query_id"), col("q_emb"), col("cid"),
        sqDistFold(col("q_emb"), col("cent_emb")).as("dist"))
      .withColumn("rn", row_number().over(wQ)).filter(col("rn") <= nprobe)
      .select(col("query_id"), col("q_emb"), col("cid"))
    val cand = probes.join(lists, "cid").join(c, "vec_id")
      .select(col("query_id"), col("vec_id"), dotFold(col("q_emb"), col("c_emb")).as("dot"))
    val wRank = Window.partitionBy(col("query_id")).orderBy(col("dot").desc, col("vec_id"))
    cand.withColumn("rank", row_number().over(wRank)).filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("vec_id"), col("dot"))
  }

  /** Approximate top-k: probe buckets within Hamming radius `probeRadius`
    * of each query's sketch (radius 0/1 = classic multi-probe LSH), then
    * exact-score only those candidates. Recall measured against
    * [[bruteTopK]] in tests.
    */
  def lshTopK(queries: DataFrame, qIdCol: String, qEmbCol: String,
              corpus: DataFrame, idCol: String, embCol: String,
              k: Int, bits: Int, dims: Int, probeRadius: Int = 1): DataFrame = {
    val buckets = lshBuckets(corpus, idCol, embCol, bits, dims)
    val q0 = queries.select(col(qIdCol).as("query_id"), quantize(col(qEmbCol)).as("q_emb"))
      .withColumn("q_bucket", signSketch(col("q_emb"), bits, dims))
    // enumerate probe buckets: the query's own + single-bit flips (radius 1)
    val probes: Column =
      if (probeRadius <= 0) array(col("q_bucket"))
      else array((col("q_bucket") +: (0 until bits).map(p =>
        col("q_bucket").bitwiseXOR(lit(1L << p)))): _*)
    val qProbed = q0.withColumn("bucket", explode(probes))
    val cand = qProbed.join(buckets, "bucket")
      .select(col("query_id"), col("vec_id"), dotFold(col("q_emb"), col("c_emb")).as("dot"))
      .dropDuplicates("query_id", "vec_id")
    val w = Window.partitionBy(col("query_id")).orderBy(col("dot").desc, col("vec_id"))
    cand.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("vec_id"), col("dot"))
  }
}
