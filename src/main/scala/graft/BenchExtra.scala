package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted}

/** Profiling harness (guide §1): NOT the driver bench — Bench.scala stays
  * frozen. Runs selected queries with a stage listener so time can be
  * attributed to stages/jobs, and dumps `.explain("formatted")` per query
  * to plans/<tag>/. Timing methodology matches Bench (count() action,
  * min-of-reps) so numbers are comparable.
  *
  * Usage: SPARK_GRAFT_ONLY=q39_dedup_decision SPARK_GRAFT_PLAN_TAG=r06 \
  *        sbt "runMain graft.BenchExtra"
  */
object BenchExtra {
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
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    val planTag = sys.env.get("SPARK_GRAFT_PLAN_TAG")
    val reps = sys.env.get("SPARK_GRAFT_BENCH_REPS").map(_.toInt).getOrElse(2).max(1)
    val listen = sys.env.get("SPARK_GRAFT_STAGES").contains("1")

    if (listen) spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit =
        println(f"[job ${js.jobId}%3d] stages=${js.stageIds.size} ${Option(js.properties).map(_.getProperty("spark.job.description", "")).getOrElse("")}")
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val wall = (si.completionTime.getOrElse(0L) - si.submissionTime.getOrElse(0L)) / 1e3
        println(f"  [stage ${si.stageId}%3d] tasks=${si.numTasks}%4d wall=$wall%7.3fs ${si.name.take(90)}")
      }
    })

    val selected = SparkEntry.queries.filter { case (n, _) => only.forall(_.contains(n)) }
    Seq("lineitem", "orders", "part", "events", "documents", "embeddings")
      .foreach { t =>
        try spark.read.parquet(s"$sfDir/$t.parquet").count()
        catch { case _: Throwable => () }
      }
    val results = selected.toSeq.map { case (name, fn) =>
      planTag.foreach { tag =>
        val dir = new java.io.File(s"plans/$tag"); dir.mkdirs()
        val plan = fn(spark, sfDir).queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        java.nio.file.Files.writeString(
          java.nio.file.Paths.get(s"plans/$tag/$name.txt"), plan)
      }
      val times = Seq.fill(reps) {
        spark.sparkContext.setJobDescription(name)
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        val dt = (System.nanoTime() - t0) / 1e9
        println(f"[rep] $name $dt%7.3fs")
        dt
      }
      spark.catalog.clearCache()
      (name, times.min)
    }
    results.foreach { case (n, t) => println(f"[min] $n $t%7.3fs") }
    spark.stop()
  }
}
