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
                            tauNum: Int, tauDen: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    // broadcast the quantized matrix (64-dim ints: ~1 KB per 100 vectors);
    // each partition compares its rows against all higher ids in a
    // primitive loop — no per-pair array allocation. At 10^12 scale this
    // runs inside LSH blocks ([[lshBuckets]]); corpus-wide it needs the
    // matrix to fit in executor memory (~10^7 vectors).
    val quant = df.select(col(idCol).cast("long").as("vid"),
      transform(col(embCol), x => floor(x.cast("double") * lit(100.0) + lit(0.5)).cast("long")).as("qe"))
    val all: Array[(Long, Array[Long])] = quant.as[(Long, Array[Long])]
      .collect().sortBy(_._1)
    val bc = spark.sparkContext.broadcast(all)
    val tn2 = tauNum.toLong * tauNum
    val td2 = tauDen.toLong * tauDen

    quant.as[(Long, Array[Long])].mapPartitions { it =>
      val corpus = bc.value
      val norms = corpus.map { case (_, v) =>
        var s = 0L; var i = 0
        while (i < v.length) { s += v(i) * v(i); i += 1 }
        s
      }
      it.flatMap { case (id1, e1) =>
        var n1 = 0L
        var i = 0
        while (i < e1.length) { n1 += e1(i) * e1(i); i += 1 }
        // binary search to the first id > id1 (corpus sorted by id)
        var lo = 0; var hi = corpus.length
        while (lo < hi) {
          val mid = (lo + hi) >>> 1
          if (corpus(mid)._1 <= id1) lo = mid + 1 else hi = mid
        }
        val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long)]
        var j = lo
        while (j < corpus.length) {
          val (id2, e2) = corpus(j)
          var dot = 0L
          var d = 0
          while (d < e1.length) { dot += e1(d) * e2(d); d += 1 }
          if (dot > 0 && dot * dot * td2 >= tn2 * n1 * norms(j))
            out += ((id1, id2, dot))
          j += 1
        }
        out
      }
    }.toDF("id_1", "id_2", "dot")
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
