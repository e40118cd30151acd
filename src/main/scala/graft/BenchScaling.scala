package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Two-parallelism scaling evidence (BASELINE.md north rule): the same
  * spatial-join + tiling job on the same input at local[8] and local[32],
  * reporting throughput at both and efficiency = (T_8 / T_32) / 4 — the
  * sandbox substitute for an N vs 4N executor cluster.
  *
  * One (job, cpus) leg per JVM invocation — separate legs in one JVM
  * contaminate each other (heap history, code cache, block-manager
  * residue). `scripts/bench_scaling.py` orchestrates the legs and writes
  * BENCH_SCALING.md.
  *
  * Usage:
  *   runMain graft.BenchScaling prep <nImages> <nPolys> <nPayload>
  *   runMain graft.BenchScaling run <job> <cpus> [reps]
  *     job ∈ join_cells | join_rtree | decode
  */
object BenchScaling {

  private val dataDir = sys.env.getOrElse("GRAFT_BENCH_DIR", "/tmp/graft_bench")

  private def session(cpus: Int): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(s"graft-bench-$cpus")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  private def time(body: => Unit): Double = {
    val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
  }

  def joinCellsJob(s: SparkSession): Long = {
    val imgs = s.read.parquet(s"$dataDir/images_lite")
    val polys = s.read.parquet(s"$dataDir/boundaries")
    val joined = graft.join.SpatialJoin.cellJoin(imgs, "lon", "lat", polys, "ring", z = 6)
    graft.tiles.Tiles.assignPoint(joined, "lon", "lat", 12)
      .select("image_id", "polygon_id", "tile_x", "tile_y")
      .count()
  }

  def joinRtreeJob(s: SparkSession): Long = {
    val imgs = s.read.parquet(s"$dataDir/images_lite")
    val polys = s.read.parquet(s"$dataDir/boundaries")
    val joined = graft.join.SpatialJoin.broadcastRtreeJoin(
      imgs, "lon", "lat", polys, "polygon_id", "ring")
    graft.tiles.Tiles.assignPoint(joined, "lon", "lat", 12)
      .select("image_id", "polygon_id", "tile_x", "tile_y")
      .count()
  }

  def decodeJob(s: SparkSession): Long = {
    val imgs = s.read.parquet(s"$dataDir/images_full")
    // decode runs in an opaque mapPartitions stage, so count() executes it
    graft.media.Media.imageFeatures(imgs).count()
  }

  def main(args: Array[String]): Unit = args.headOption match {
    case Some("prep") =>
      val nImages = args(1).toLong; val nPolys = args(2).toInt; val nPayload = args(3).toLong
      val marker = new java.io.File(s"$dataDir/_READY_${nImages}_${nPolys}_$nPayload")
      if (!marker.exists()) {
        val prep = session(32)
        graft.geo.GeoFixtures.imagesLite(prep, nImages)
          .repartition(256) // fine-grained splits: straggler-free balance
          .write.mode("overwrite").parquet(s"$dataDir/images_lite")
        graft.geo.GeoFixtures.boundaries(prep, nPolys)
          .write.mode("overwrite").parquet(s"$dataDir/boundaries")
        graft.geo.GeoFixtures.images(prep, nPayload)
          .repartition(256)
          .write.mode("overwrite").parquet(s"$dataDir/images_full")
        prep.stop()
        marker.getParentFile.mkdirs(); marker.createNewFile()
      }
      println("""{"prep": "ready"}""")

    case Some("run") =>
      val jobName = args(1); val cpus = args(2).toInt
      val reps = args.lift(3).map(_.toInt).getOrElse(3)
      val job: SparkSession => Long = jobName match {
        case "join_cells" => joinCellsJob
        case "join_rtree" => joinRtreeJob
        case "decode" => decodeJob
        case other => throw new IllegalArgumentException(s"unknown job $other")
      }
      val s = session(cpus)
      var rows = 0L
      job(s) // warm-up: JIT + codegen + page cache
      val best = Seq.fill(reps)(time { rows = job(s) }).min
      s.stop()
      println(f"""{"job": "$jobName", "cpus": $cpus, "rows": $rows, "sec": $best%.2f}""")

    case _ =>
      System.err.println("usage: prep <nImages> <nPolys> <nPayload> | run <job> <cpus> [reps]")
      sys.exit(2)
  }
}
