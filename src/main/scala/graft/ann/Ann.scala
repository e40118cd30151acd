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
        var loBlob: Array[Byte] = null
        var hiBlob: Array[Byte] = null
        itKv.foreach { case (_, (vblk, blob)) =>
          if (vblk == lo) loBlob = blob
          if (vblk == hi) hiBlob = blob
        }
        // Unpack each side into PARALLEL PRIMITIVE ARRAYS (ids / flat
        // vector shorts / norms) and run the O(n²) loop allocation-free:
        // an earlier shape routed every pair through an emit((Long,
        // Array[Short], Long) × 2) helper whose ordered-pair destructuring
        // built a boxed Tuple6 PER PAIR — at the 96k-vector scaling leg
        // that is 4.6e9 tuple+box allocations. The kernel floor after
        // that fix is the scalar dot loop itself (~55-70 ns per 64-dim
        // pair on this host's JIT — no auto-vectorization of the
        // short-mul/long-add reduction; measured standalone, BASELINE.md).
        def unpack(blob: Array[Byte]): (Int, Array[Long], Array[Short], Array[Long]) = {
          if (blob == null) return (0, new Array[Long](0), new Array[Short](0), new Array[Long](0))
          val bb = java.nio.ByteBuffer.wrap(blob).order(java.nio.ByteOrder.LITTLE_ENDIAN)
          val n = bb.getInt(); val d = bb.getInt()
          val ids = new Array[Long](n)
          var i = 0
          while (i < n) { ids(i) = bb.getLong(); i += 1 }
          val flat = new Array[Short](n * d)
          bb.asShortBuffer().get(flat)
          val norms = new Array[Long](n)
          i = 0
          while (i < n) {
            var s = 0L; var k = i * d; val end = k + d
            while (k < end) { s += flat(k) * flat(k); k += 1 }
            norms(i) = s; i += 1
          }
          (d, ids, flat, norms)
        }
        val (d0, lIds, lFlat, lNorms) = unpack(loBlob)
        val diag = lo == hi
        val (_, rIds, rFlat, rNorms) = if (diag) (d0, lIds, lFlat, lNorms) else unpack(hiBlob)
        val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long)]
        // per-component products fit Int (|q| ≤ Short.MaxValue ⇒ q² < 2³⁰);
        // the accumulator widens to Long per add. dot²·td2 stays inside
        // Long by the factor-100 quantization contract (scaladoc above).
        var i = 0
        while (i < lIds.length) {
          val idI = lIds(i); val nI = lNorms(i); val offI = i * d0
          var j = if (diag) i + 1 else 0
          while (j < rIds.length) {
            val idJ = rIds(j)
            if (idI != idJ) { // duplicate input ids: never emit a self-pair
              val offJ = j * d0
              var dot = 0L; var k = 0
              while (k < d0) { dot += lFlat(offI + k) * rFlat(offJ + k); k += 1 }
              if (dot > 0 && dot * dot * td2 >= tn2 * nI * rNorms(j)) {
                if (idI < idJ) out += ((idI, idJ, dot))
                else out += ((idJ, idI, dot))
              }
            }
            j += 1
          }
          i += 1
        }
        out.iterator
      }
      .toDF("id_1", "id_2", "dot")
  }

  /** Factor-100 integer quantization + round-robin spread of the corpus,
    * shared by [[embeddingNearDupPairs]] and the bench isolation leg.
    */
  private[graft] def triangleQuantized(df: DataFrame, idCol: String,
                                       embCol: String): DataFrame =
    df.select(col(idCol).cast("long").as("vid"),
      transform(col(embCol), x => floor(x.cast("double") * lit(100.0) + lit(0.5)).cast("long")).as("qe"))
      .repartition(math.max(2, df.sparkSession.sparkContext.defaultParallelism))

  /** Replication + shuffle half of [[embeddingNearDupPairs]], factored so
    * the scaling bench can time it in isolation from the O(n²) kernel.
    *
    * The wire unit is a PER-BLOCK PACKED BLOB, not a per-vector row: each
    * of the b blocks is packed once into one byte blob
    * ([int n][int d][n × long vid][n·d × short], little-endian) and fanned
    * to the b tasks that hold it — b² blob rows total instead of n·b
    * vector rows. Same payload bytes on the wire, but the per-row
    * serializer overhead (nested tuple + array headers × n·b — measured as
    * an anti-scaling 2.6 s @8 → 4.1 s @32 isolation leg on 2.3M rows)
    * collapses to b² ≈ hundreds of rows, and the pack + its
    * range-validation run once per VECTOR, not once per replica.
    *
    * Task ids are DENSE ranks of the unordered block pairs (lo <= hi):
    *   dense(lo, hi) = lo*b - lo*(lo-1)/2 + (hi - lo)   in [0, b(b+1)/2)
    * so each task owns exactly one reduce partition (identity partitioner).
    * Hashing task keys into spark.sql.shuffle.partitions instead (the
    * original groupByKey plan) collides ~2× cores' keys into ~cores bins —
    * balls-in-bins puts 4-6 keys in the worst bin and the stage waits on it.
    *
    * Packing to shorts ships 4× fewer bytes than the long arrays; the
    * factor-100 quantization of unit-scale embeddings is two orders of
    * magnitude inside Short range, and the check validates rather than
    * truncates so an out-of-contract embedding fails loudly.
    *
    * A block blob is (n/b)·(2d+8)+16 bytes — the same data the kernel task
    * must hold anyway (task memory is bounded at 2·n/b vectors by design);
    * raise b when blocks outgrow a task. The b-way groupByKey stage is the
    * only full pass over vector rows and its parallelism is b (≥ the
    * default's 8×-cores task budget after the square root).
    */
  private[graft] def triangleTasks(quant: DataFrame, b: Int)
      : org.apache.spark.rdd.RDD[(Int, (Int, Array[Byte]))] = {
    val spark = quant.sparkSession
    import spark.implicits._
    val nTasks = b * (b + 1) / 2
    val identityPart = new org.apache.spark.Partitioner {
      def numPartitions: Int = nTasks
      def getPartition(key: Any): Int = key.asInstanceOf[Int]
    }
    quant.as[(Long, Array[Long])].rdd
      .map { case (vid, qe) => (java.lang.Math.floorMod(vid, b.toLong).toInt, (vid, qe)) }
      .groupByKey(b)
      .flatMap { case (blk, vecs) =>
        val rows = vecs.toArray
        val n = rows.length
        val d = if (n == 0) 0 else rows(0)._2.length
        val bb = java.nio.ByteBuffer.allocate(8 + n * (8 + 2 * d))
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        bb.putInt(n); bb.putInt(d)
        var i = 0
        while (i < n) { bb.putLong(rows(i)._1); i += 1 }
        i = 0
        while (i < n) {
          val qe = rows(i)._2
          require(qe.length == d,
            s"embeddingNearDupPairs: ragged embedding lengths (${qe.length} vs $d)")
          var k = 0
          while (k < d) {
            val v = qe(k)
            require(v >= Short.MinValue && v <= Short.MaxValue,
              s"embeddingNearDupPairs: quantized component $v out of Short range " +
                "(expected unit-scale embeddings; factor-100 quantization)")
            bb.putShort(v.toShort)
            k += 1
          }
          i += 1
        }
        val blob = bb.array()
        val row = (blk, blob)
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
