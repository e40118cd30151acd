package graft

import org.apache.spark.sql.functions._
import graft.ann.Ann

/** Product quantization: encode argmin exactness, ADC recall vs brute
  * force, the refine-degenerates-to-exact contract, Lloyd's-objective
  * monotonicity, the ≤ksub-distinct-subvectors exactness case, and
  * partitioning determinism. */
class PqSpec extends SparkSpecBase {

  import spark.implicits._

  private def mix(v: Long): Long = math.abs(graft.geo.GeoFixtures.mix(v))

  /** 200 vectors in 16 dims, 8 clusters (the DedupAnnSpec shape: cluster
    * structure so approximate search has something to find). */
  private lazy val embeddings = {
    val rows = (0 until 200).map { i =>
      val c = i % 8
      val v = (0 until 16).map { d =>
        val centroid = if (d % 8 == c) 1.0f else 0.0f
        centroid + (mix(i * 31L + d) % 1000).toFloat / 5000.0f
      }
      (i.toLong, v)
    }
    rows.toDF("vec_id", "embedding").cache()
  }

  private val dims = 16
  private val m = 4 // 4 subspaces x 4 dims

  test("pqEncode assigns every codeword vector its own cid (self-encode)") {
    val cw = Ann.pqCodewords(embeddings, "vec_id", "embedding", dims, m, codeEvery = 10L)
    val codes = Ann.pqEncode(embeddings, "vec_id", "embedding", cw, dims, m)
      .filter(pmod(col("vec_id"), lit(10L)) === 0)
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    // a sampled vector's subvector is at distance 0 from its own codeword;
    // the fixture's additive noise makes codewords distinct, so argmin
    // (ties to min cid) must return the vector itself
    (0L until 200L by 10L).foreach { vid =>
      (0 until m).foreach { s =>
        assert(codes((vid, s)) === vid, s"vec $vid sub $s self-encoded to ${codes((vid, s))}")
      }
    }
  }

  // What unrefined ADC can and cannot promise, pinned separately: the
  // quantizer erases within-cluster noise-level fine structure (so raw
  // ADC ranks inside a cluster are NOT brute ranks — that's the point of
  // compression), but it must preserve the coarse structure, and an ADC
  // shortlist + exact refine must recover the true ranking. codeEvery=7
  // (coprime to the 8-cluster cycle) so the sampled codebook sees every
  // cluster — codeEvery=10 samples only even clusters and odd-cluster
  // queries lose their signal dims entirely.
  test("unrefined ADC top-10 stays in the query's cluster") {
    val q = embeddings.filter(col("vec_id") % 25 === 0)
    val pq = Ann.pqTopK(q, "vec_id", "embedding", embeddings, "vec_id", "embedding",
      k = 10, dims = dims, m = m, codeEvery = 7L)
      .collect().groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(2)).toSet)
    pq.foreach { case (q0, vs) =>
      assert(vs.forall(v => v % 8 == q0 % 8), s"ADC top-10 of $q0 left its cluster: $vs")
    }
  }

  test("ADC shortlist + exact refine: recall@10 vs brute force >= 0.9") {
    val q = embeddings.filter(col("vec_id") % 25 === 0)
    val brute = Ann.bruteTopK(q, "vec_id", "embedding", embeddings, "vec_id", "embedding", 10)
      .select("query_id", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val pq = Ann.pqTopK(q, "vec_id", "embedding", embeddings, "vec_id", "embedding",
      k = 10, dims = dims, m = m, codeEvery = 7L, refine = 40)
      .select("query_id", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (brute & pq).size.toDouble / brute.size
    assert(recall >= 0.9, s"refined recall $recall")
  }

  test("refine >= corpus size degenerates to exact bruteTopK, dots included") {
    val q = embeddings.filter(col("vec_id") % 25 === 0)
    val brute = Ann.bruteTopK(q, "vec_id", "embedding", embeddings, "vec_id", "embedding", 10)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3))).toSet
    val pq = Ann.pqTopK(q, "vec_id", "embedding", embeddings, "vec_id", "embedding",
      k = 10, dims = dims, m = m, codeEvery = 10L, refine = 200)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3))).toSet
    assert(pq === brute)
  }

  test("ADC is exact when every distinct subvector is a codeword") {
    // 12 vectors built from a pool of 3 distinct subvectors per subspace,
    // all of which appear among the codeword sample (codeEvery=1): the
    // quantizer reproduces every subvector exactly, so ADC == true dot
    val pool = (0 until 3).map(p => (0 until 4).map(d => (p * 7 + d).toFloat / 8.0f))
    val rows = (0 until 12).map { i =>
      val v = (0 until m).flatMap(s => pool((i + s) % 3))
      (i.toLong, v)
    }
    val tiny = rows.toDF("vec_id", "embedding")
    val q = tiny.filter(col("vec_id") < 3)
    val brute = Ann.bruteTopK(q, "vec_id", "embedding", tiny, "vec_id", "embedding", 5)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3))).toSet
    val pq = Ann.pqTopK(q, "vec_id", "embedding", tiny, "vec_id", "embedding",
      k = 5, dims = dims, m = m, codeEvery = 1L)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3))).toSet
    assert(pq === brute)
  }

  test("Lloyd refinement: objective non-increasing; refined book keeps recall") {
    val init = Ann.pqCodewords(embeddings, "vec_id", "embedding", dims, m, codeEvery = 25L)
    val (book, obj) = Ann.pqRefineCodebook(embeddings, "vec_id", "embedding",
      init, dims, m, iters = 4)
    assert(obj.length === 4)
    obj.sliding(2).foreach { case Seq(a, b) =>
      assert(b <= a, s"objective increased: $obj")
    }
    val q = embeddings.filter(col("vec_id") % 25 === 0)
    val brute = Ann.bruteTopK(q, "vec_id", "embedding", embeddings, "vec_id", "embedding", 10)
      .select("query_id", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val pq = Ann.pqTopK(q, "vec_id", "embedding", embeddings, "vec_id", "embedding",
      k = 10, dims = dims, m = m, codeEvery = 25L, refine = 40, codebook = Some(book))
      .select("query_id", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (brute & pq).size.toDouble / brute.size
    assert(recall >= 0.9, s"refined-book + refine recall $recall")
  }

  test("fused pqEncodePacked row-identical to declarative pqEncode + pqPack") {
    // the kernel path pqTopK actually runs vs the oracle-expressible
    // reference plan: same argmin metric, same min-cid tie rule, same
    // subspace order — pinned per (vec_id, sub) over the whole fixture
    val cw = Ann.pqCodewords(embeddings, "vec_id", "embedding", dims, m, codeEvery = 7L)
    val declarative = Ann.pqPack(Ann.pqEncode(embeddings, "vec_id", "embedding", cw, dims, m))
      .collect().map { case (v, cs) => v -> cs.toSeq }.toMap
    val fused = Ann.pqEncodePacked(embeddings, "vec_id", "embedding", cw, dims, m)
      .collect().map { case (v, cs) => v -> cs.toSeq }.toMap
    assert(fused.size === 200)
    assert(fused === declarative)
  }

  test("driver-built ADC LUT value-identical to the declarative pqLut") {
    val cw = Ann.pqCodewords(embeddings, "vec_id", "embedding", dims, m, codeEvery = 7L)
    val q = embeddings.filter(col("vec_id") % 25 === 0)
      .select(col("vec_id").as("query_id"), col("embedding"))
    val book = Ann.pqCollectBook(cw, dims, m)
    val (qIds, table) = Ann.pqDriverLut(q, "query_id", "embedding", book, dims, m)
    val declarative = Ann.pqLut(q, "query_id", "embedding", cw, dims, m)
      .collect().map { r =>
        (r.getLong(0), r.getAs[Number](1).intValue, r.getLong(2)) -> r.getLong(3)
      }.toMap
    val ksub = book.ksub
    assert(qIds.length === 8)
    assert(table.length === qIds.length * m * ksub)
    for (qi <- qIds.indices; s <- 0 until m; c <- book.cids(s).indices)
      assert(table(qi * m * ksub + s * ksub + c) ===
        declarative((qIds(qi), s, book.cids(s)(c))),
        s"pdot mismatch at query ${qIds(qi)} sub $s cid ${book.cids(s)(c)}")
  }

  test("ADC ties rank by ascending vec_id (exact-duplicate block)") {
    // 12 exact duplicates of one vector (identical codes ⇒ identical adot)
    // among 30: the bounded per-partition heap + global window must return
    // the duplicate block lowest-vec_id-first, at any partitioning — the
    // tie rule a heap with the wrong weaker() comparison would break
    // non-duplicates are near-zero so every duplicate's adot (≈ q·q, large
    // positive) strictly beats every non-duplicate's (dots, not distances)
    val base = (0 until dims).map(d => (d % 5).toFloat / 4.0f)
    val rows = (0 until 30).map { i =>
      val v =
        if (i >= 9 && i < 21) base
        else (0 until dims).map(d => ((i * 13 + d) % 7).toFloat / 140.0f)
      (i.toLong, v)
    }
    val dup = rows.toDF("vec_id", "embedding")
    val q = dup.filter(col("vec_id") === 15) // inside the duplicate block
    def run(df: org.apache.spark.sql.DataFrame) =
      Ann.pqTopK(q, "vec_id", "embedding", df, "vec_id", "embedding",
        k = 12, dims = dims, m = m, codeEvery = 3L)
        .orderBy("rank").collect().map(r => (r.getInt(1), r.getLong(2)))
    val expected = (9 until 21).zipWithIndex.map { case (v, i) => (i + 1, v.toLong) }
    Seq(dup.repartition(11), dup.coalesce(1)).foreach { df =>
      val got = run(df).toSeq
      // all 12 duplicates score identically and beat every non-duplicate
      // (self-similarity is maximal here), so ranks 1..12 must be vec_ids
      // 9..20 in ascending order
      assert(got === expected, s"tie order broken: $got")
    }
  }

  test("malformed vectors are skipped, not fatal; k=0 returns empty") {
    // null embedding, null element, and wrong-arity rows ride along with
    // the valid corpus: the fused encoders must skip them (the primitive
    // decode would otherwise throw and kill the job) and the valid rows'
    // results must be unaffected
    // ids 903 and 910 are multiples of codeEvery=7: junk landing ON the
    // codebook sampling grid must not poison the codebook either (it
    // previously NPE'd pqCollectBook / failed the codeword-arity require)
    val junk = Seq[(Long, Option[Seq[Option[Float]]])](
      (900L, None),
      (901L, Some(Seq(Option(1.0f), None) ++ (2 until dims).map(d => Option(d.toFloat)))),
      (902L, Some(Seq(Option(1.0f), Option(2.0f)))), // wrong arity
      (903L, None), // null embedding on the sampling grid
      (910L, Some(Seq(Option(3.0f))))) // wrong arity on the sampling grid
      .toDF("vec_id", "embedding")
    val dirty = embeddings.select(col("vec_id"),
      col("embedding").cast("array<float>")).unionByName(junk)
    val q = embeddings.filter(col("vec_id") % 25 === 0)
    def run(corpus: org.apache.spark.sql.DataFrame) =
      Ann.pqTopK(q, "vec_id", "embedding", corpus, "vec_id", "embedding",
        k = 10, dims = dims, m = m, codeEvery = 7L)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3))).toSet
    assert(run(dirty) === run(embeddings), "junk rows changed valid results")
    val empty = Ann.pqTopK(q, "vec_id", "embedding", embeddings, "vec_id", "embedding",
      k = 0, dims = dims, m = m, codeEvery = 7L)
    assert(empty.count() === 0L)
  }

  test("pqTopK output is identical at different partitionings") {
    val q = embeddings.filter(col("vec_id") % 25 === 0)
    def run(df: org.apache.spark.sql.DataFrame) =
      Ann.pqTopK(q, "vec_id", "embedding", df, "vec_id", "embedding",
        k = 10, dims = dims, m = m, codeEvery = 10L)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3))).toSet
    assert(run(embeddings.repartition(7)) === run(embeddings.coalesce(1)))
  }
}
