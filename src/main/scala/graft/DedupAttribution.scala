package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.dedup.Dedup

/** Per-stage attribution of the q39 dedupeDecision composition (VERDICT r03
  * #5): times the cumulative prefixes of the pipeline — signatures,
  * LSH banding, exact verify, connected components — and compares the
  * shipped recompute plan against a persist-the-packed-shingle-frame
  * variant (the frame is consumed 2×: signatures and verify).
  * One JSON line per (variant, stage); run on an idle box, fresh JVM.
  *
  *   env SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
  *     sbt -batch "runMain graft.DedupAttribution [reps]"
  */
object DedupAttribution {

  private def time(body: => Long): (Double, Long) = {
    val t0 = System.nanoTime()
    val n = body
    ((System.nanoTime() - t0) / 1e9, n)
  }

  def main(args: Array[String]): Unit = {
    java.util.Locale.setDefault(java.util.Locale.ROOT) // machine-parsed JSON output
    val reps = args.headOption.map(_.toInt).getOrElse(3)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-dedup-attribution")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // exactly q39's input and parameters (SparkEntry.scala q39_dedup_decision)
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .filter(col("source").isin("src6", "src7"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    docs.count()
    val (shingleN, numHashes, rowsPerBand, threshold, bucketCap) = (5, 8, 2, 0.25, 256)

    // Each entry times the pipeline PREFIX ending at that stage as its own
    // end-to-end run, with frame CONSTRUCTION inside the timed body —
    // clusterLabelsConverged checkpoints its edge input eagerly at
    // construction, so building the frames outside the timer (the first
    // version of this harness) executes the whole pipeline before any
    // clock starts. Consecutive deltas are marginal stage costs; the last
    // prefix is the full q39 composition.
    val stageNames = Seq("prefix_signatures", "prefix_lsh_candidates",
      "prefix_verify", "full_decision")
    def prefix(persistShingles: Boolean, through: String): (Double, Long) = {
      // packed-first pipeline, exactly Dedup.dedupeDecision's stages; the
      // persist variant caches the PACKED frame (consumed 2×: signatures
      // and verify) instead of recomputing its one-shuffle build
      val sh0 = Dedup.packedShingles(docs, "doc_id", "text", shingleN)
      val sh = if (persistShingles) sh0.persist(StorageLevel.MEMORY_AND_DISK) else sh0
      try time {
        val sigs = Dedup.minhashSignaturesPacked(sh, "doc_id", shingleN, numHashes)
        if (through == "prefix_signatures") sigs.count()
        else {
          val cand = Dedup.lshCandidates(sigs, "doc_id", numHashes, rowsPerBand, bucketCap)
          if (through == "prefix_lsh_candidates") cand.count()
          else {
            val verified = Dedup.verifyCandidatesPacked(sh, "doc_id", cand, threshold)
            if (through == "prefix_verify") verified.count()
            else Dedup.clusterLabelsConverged(verified, "id_1", "id_2", docs, "doc_id")
              .select(col("id"), col("cluster"), (col("id") === col("cluster")).as("keep"))
              .count()
          }
        }
      } finally if (persistShingles) sh.unpersist()
    }
    def stages(persistShingles: Boolean): Seq[(String, Double, Long)] =
      stageNames.map { n =>
        val (t, rows) = prefix(persistShingles, n)
        (n, t, rows)
      }

    // warm-up both shapes once (JIT/codegen), then min-of-reps per stage
    stages(persistShingles = false); stages(persistShingles = true)
    Seq(false, true).foreach { p =>
      val runs = Seq.fill(reps)(stages(p))
      val byStage = runs.head.indices.map { i =>
        val s = runs.map(_(i))
        (s.head._1, s.map(_._2).min, s.head._3)
      }
      val full = byStage.last._2 // prefixes overlap; the last IS q39
      val fields = byStage.map { case (n, t, rows) =>
        f""""$n": {"sec": $t%.3f, "rows": $rows}"""
      }.mkString(", ")
      println(f"""{"variant": "${if (p) "persist_shingles" else "recompute_shingles"}", "q39_sec": $full%.3f, $fields}""")
    }
    spark.stop()
  }
}
