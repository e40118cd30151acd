package graft

import org.apache.spark.sql.functions._
import graft.ann.Ann

/** Substantiates the scale notes on the ANN paths ("persist the corpus
  * with write.bucketBy(bucket) so queries touch only matching buckets"):
  * a bucketed-table probe join runs WITHOUT a corpus-side exchange — the
  * 10^12-row corpus is never shuffled per query batch.
  */
class BucketedAnnSpec extends SparkSpecBase {

  import spark.implicits._

  /** 2000 vectors in 8 loose clusters, 64 dims (deterministic). */
  private lazy val emb = {
    def mix(v: Long): Long = math.abs(graft.geo.GeoFixtures.mix(v))
    val rows = (0 until 2000).map { i =>
      val c = i % 8
      val v = (0 until 64).map { d =>
        val centroid = if (d % 8 == c) 1.0f else 0.0f
        centroid + (mix(i * 31L + d) % 1000).toFloat / 5000.0f
      }
      (i.toLong, v)
    }
    rows.toDF("vec_id", "embedding").cache()
  }

  private lazy val corpus = Ann.lshBuckets(emb, "vec_id", "embedding", bits = 8, dims = 64)

  test("bucketBy-persisted LSH corpus: probe join has no corpus-side exchange") {
    spark.sql("DROP TABLE IF EXISTS ann_corpus_bucketed")
    corpus.write.bucketBy(16, "bucket").sortBy("bucket")
      .format("parquet").saveAsTable("ann_corpus_bucketed")
    val t = spark.table("ann_corpus_bucketed")

    val q0 = emb.filter(pmod(col("vec_id"), lit(100L)) === 0)
      .select(col("vec_id").as("query_id"), Ann.quantize(col("embedding")).as("q_emb"))
      .withColumn("q_bucket", Ann.signSketch(col("q_emb"), 8, 64))
    val probes = q0.withColumn("bucket",
      explode(array((col("q_bucket") +: (0 until 8).map(p =>
        col("q_bucket").bitwiseXOR(lit(1L << p)))): _*)))

    // force a shuffle join so the bucket layout has to prove itself
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = probes.join(t, "bucket")
        .select(col("query_id"), col("vec_id"),
          Ann.dotFold(col("q_emb"), col("c_emb")).as("dot"))
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
        .split("== Initial Plan ==")(0)
      // the corpus scan reads the bucketed layout...
      assert(plan.contains("Bucketed: true"), plan.take(2000))
      // ...and no exchange sits between the join and the bucketed scan:
      // exactly ONE exchange in the whole plan (the probe side)
      val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
      assert(exchanges == 1, s"expected only the probe-side exchange:\n$plan")

      // results equal the unbucketed join
      val plainCorpus = corpus
      val expected = probes.join(plainCorpus, "bucket")
        .select(col("query_id"), col("vec_id"),
          Ann.dotFold(col("q_emb"), col("c_emb")).as("dot"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val got = joined.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(got === expected)
      assert(got.nonEmpty)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS ann_corpus_bucketed")
    }
  }
}
