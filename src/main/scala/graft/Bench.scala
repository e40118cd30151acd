package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // optional comma-separated query-name filter for profiling single queries
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    val selected = SparkEntry.queries.filter { case (n, _) => only.forall(_.contains(n)) }
    // untimed warmup: session bring-up, codegen/JIT caches, and one scan of
    // each input table so the first timed query isn't charged for OS/page-
    // cache cold reads the rest never pay (steady-state methodology; the
    // whole r01 "q10 slowest" finding was Map-iteration-order warmup skew)
    Seq("lineitem", "orders", "part", "events", "documents", "embeddings")
      .foreach { t =>
        try spark.read.parquet(s"$sfDir/$t.parquet").count()
        catch { case _: Throwable => () }
      }
    // min-of-reps per query (default 2, back-to-back): this host's
    // hypervisor shows ±15-20% same-day drift plus occasional multi-second
    // interference spikes (BASELINE.md); the min of consecutive runs is the
    // steady-state number that tracks the PLAN, not the neighbor's load.
    // Totals before round 5 (BENCH_r01-r04) were single-pass.
    val reps = sys.env.get("SPARK_GRAFT_BENCH_REPS").map(_.toInt).getOrElse(2).max(1)
    // a failed query must FAIL the bench, not record its near-zero throw
    // time as a speed-up: note the error, keep timing the rest, report
    // every failure in the JSON and the exit code
    val results = selected.toSeq.map { case (name, fn) =>
      var err: Option[String] = None
      val times = Seq.fill(reps) {
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count() }
        catch { case e: Throwable =>
          err = Some(e.toString.linesIterator.nextOption().getOrElse("error"))
        }
        (System.nanoTime() - t0) / 1e9
      }
      // release any internal persist before the NEXT query is timed —
      // cached leftovers both distort later timings and pin exec memory
      spark.catalog.clearCache()
      (name, times.min, err)
    }
    results.foreach { case (n, _, e) =>
      e.foreach(m => System.err.println(s"[bench] $n FAILED: $m")) }
    val failed = results.collect { case (n, _, Some(_)) => n }
    val qs = results.map { case (k, v, _) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val errJson =
      if (failed.isEmpty) ""
      else failed.map(n => "\"" + n + "\"").mkString(""","errors":[""", ",", "]")
    val total = if (results.nonEmpty) results.map(_._2).sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","reps":$reps,"queries":$qs$errJson,"sf":"$sfDir"}""")
    spark.stop()
    if (failed.nonEmpty) sys.exit(1)
  }
}
