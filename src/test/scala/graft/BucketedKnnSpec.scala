package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.geo.GeoFixtures
import graft.knn.Knn

/** Substantiates cellRing's `pointCellCol` ingest-layout path (the 100 TB
  * plan in BENCH_SCALING.md's kNN decomposition): a point table written
  * `bucketBy(cell)` once at ingest joins every ring round with ZERO
  * point-side exchange, and the bucket layout survives a catalog round-trip
  * (drop + re-CREATE over the same location — what a fresh JVM does),
  * because bucket ids ride the data file names.
  */
class BucketedKnnSpec extends SparkSpecBase {

  private val z = 6

  private lazy val points = GeoFixtures.images(spark, 2000)
    .select(expr("cast(substring(image_id, 4, 9) as long)").as("point_id"),
      col("lon"), col("lat")).cache()

  private lazy val queries = {
    import spark.implicits._
    Seq((1L, -77.0, 38.9), (2L, 2.3, 48.8), (3L, 0.0, 0.0), (4L, 179.5, 0.0),
      (5L, -179.5, 0.0), (6L, 10.0, 84.0), (7L, 60.0, -60.0))
      .toDF("qid", "qlon", "qlat")
  }

  private def brute(k: Int): Set[(Long, Int, Long)] = {
    val d = points.crossJoin(queries)
      .select(col("qid"), col("point_id"),
        ((col("lon") - col("qlon")) * (col("lon") - col("qlon")) +
          (col("lat") - col("qlat")) * (col("lat") - col("qlat"))).as("dist"))
    val w = Window.partitionBy(col("qid")).orderBy(col("dist"), col("point_id"))
    d.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
      .select(col("qid"), col("rank"), col("point_id"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
  }

  private def withBucketedTable[A](body: => A): A = {
    val loc = java.nio.file.Files.createTempDirectory("knn_bucketed_").toString
    spark.sql("DROP TABLE IF EXISTS knn_points_spec")
    points
      .withColumn("cell",
        graft.functions.GeoFunctions.cell_id(col("lon"), col("lat"), z))
      .write.bucketBy(8, "cell").sortBy("cell")
      .option("path", loc).format("parquet").saveAsTable("knn_points_spec")
    // catalog round-trip: drop the (external) table, re-register from DDL
    // over the files alone — exactly what a fresh JVM's in-memory catalog
    // has to do; files must survive the drop and keep their bucket mapping
    spark.sql("DROP TABLE knn_points_spec")
    spark.sql(s"""CREATE TABLE knn_points_spec
                  (point_id BIGINT, lon DOUBLE, lat DOUBLE, cell BIGINT)
                  USING PARQUET CLUSTERED BY (cell) INTO 8 BUCKETS
                  LOCATION '$loc'""")
    try body
    finally spark.sql("DROP TABLE IF EXISTS knn_points_spec")
  }

  test("cellRing over a bucketBy(cell) table matches brute force (k=5)") {
    withBucketedTable {
      val got = Knn.cellRing(queries, "qid", "qlon", "qlat",
        spark.table("knn_points_spec"), "point_id", "lon", "lat",
        k = 5, z = z, scanFinishThreshold = 0, pointCellCol = Some("cell"))
        .select(col("query_id"), col("rank"), col("point_id"))
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
      assert(got === brute(5))
    }
  }

  test("cached bucketed scan keeps the layout: still no point-side exchange") {
    // cellRing's bucketed path persists the projected scan so rounds 2+ read
    // from memory; InMemoryRelation must preserve the scan's
    // HashPartitioning (alias-aware through the project) or every round
    // would silently pay a full point-side shuffle.
    withBucketedTable {
      val pts = spark.table("knn_points_spec")
        .select(col("point_id"), col("cell").as("__cell")).persist()
      val probe = queries
        .withColumn("__cell",
          graft.functions.GeoFunctions.cell_id(col("qlon"), col("qlat"), z))
        .hint("shuffle_hash")
      val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try {
        pts.count() // materialize the cache before planning the join
        val joined = probe.join(pts, "__cell")
        joined.collect()
        val plan = joined.queryExecution.executedPlan.toString
          .split("== Initial Plan ==")(0)
        assert(plan.contains("InMemoryTableScan"), plan.take(2000))
        val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
        assert(exchanges == 1, s"expected only the query-side exchange:\n$plan")
      } finally {
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        pts.unpersist()
      }
    }
  }

  test("ring-round join over the bucketed table has no point-side exchange") {
    withBucketedTable {
      val pts = spark.table("knn_points_spec")
        .select(col("point_id"), col("cell").as("__cell"))
      // shape of every cellRing round: straggler queries explode to cells,
      // then equi-join the point table on the cell
      val probe = queries
        .withColumn("__cell",
          graft.functions.GeoFunctions.cell_id(col("qlon"), col("qlat"), z))
        .hint("shuffle_hash")
      val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try {
        val joined = probe.join(pts, "__cell")
        joined.collect()
        val plan = joined.queryExecution.executedPlan.toString
          .split("== Initial Plan ==")(0)
        assert(plan.contains("Bucketed: true"), plan.take(2000))
        val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
        assert(exchanges == 1, s"expected only the query-side exchange:\n$plan")
      } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    }
  }
}
