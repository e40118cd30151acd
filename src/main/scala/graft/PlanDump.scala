package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.dedup.Dedup

/** Plan-evidence dumper for the optimization round: writes
  * `.explain("formatted")` of each touched declared query, plus the
  * INTERNAL pipeline frames of the eager operators (dedupeDecision /
  * clusterLabelsConverged run their heavy stages during query
  * construction, so the declared query's plan shows only the tail).
  * Output dir from SPARK_GRAFT_PLAN_DIR, suffix from
  * SPARK_GRAFT_PLAN_SUFFIX (before/after).
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val outDir = sys.env.getOrElse("SPARK_GRAFT_PLAN_DIR", "plans/r06")
    val suffix = sys.env.getOrElse("SPARK_GRAFT_PLAN_SUFFIX", "after")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()

    def dump(name: String, df: org.apache.spark.sql.DataFrame): Unit = {
      val s = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"$outDir/${name}_$suffix.txt"), s)
      println(s"dumped $name")
    }

    // declared queries. Optional filter: SPARK_GRAFT_PLAN_ONLY=q09_...
    // dumps just those. NOTE: the shared-derivation queries (q09/q13/q37/
    // q38/q40) lazily localCheckpoint their point frame, so constructing
    // them here materializes that derivation as real jobs and their dumped
    // plans show the checkpoint as `Scan ExistingRDD` — the derivation's
    // own plan is the one visible in q04's dump.
    val only = sys.env.get("SPARK_GRAFT_PLAN_ONLY").map(_.split(",").toSet)
    Seq("q24_ngram_jaccard", "q25_minhash_lsh", "q45_hamming_neardup",
      "q46_decontaminate", "q51_corpus_assemble",
      // round-6 second pass: shared-derivation checkpoints + scan spread
      "q04_tag_keep_filter", "q09_way_assembly", "q13_retention_semijoin",
      "q37_geojson_ways", "q38_summarize_by_key", "q40_relation_rings")
      .filter(q => only.forall(_.contains(q)))
      .foreach { q =>
        dump(q, SparkEntry.queries(q)(spark, sfDir))
      }

    // internal stages of the eager dedup operators
    val d = spark.read.parquet(s"$sfDir/documents.parquet")
      .filter(col("source").isin("src6", "src7"))
    val packed = Dedup.packedShingles(d, "doc_id", "text", 5)
    val sigs = Dedup.minhashSignaturesPacked(packed, "doc_id", 5, 8)
    val cand = Dedup.lshCandidates(sigs, "doc_id", 8, 2, 256)
    dump("q39_internal_lsh_candidates", cand)
    dump("q39_internal_verify",
      Dedup.verifyCandidatesPacked(packed, "doc_id", cand, 0.25))
    val sh = Dedup.shingles(d, "doc_id", "text", 5, carry = Seq("lang"))
    dump("q35_internal_jaccard_pairs",
      Dedup.jaccardPairs(sh, "doc_id", Seq("lang")).filter(col("jaccard") >= 0.25))

    spark.stop()
  }
}
