package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.geo.GeoFixtures
import graft.streaming.Streams

/** Streaming point with event time for the stream-static enrichment specs. */
case class GeoPoint(image_id: Long, lon: Double, lat: Double, ts: java.sql.Timestamp)

/** Stream-static geospatial enrichment (`Streams.enrichPoints` /
  * `regionRates`): the streaming plan must produce exactly the batch
  * broadcast-R-tree join's rows — the broadcast probe is a stateless
  * projection, so streaming == batch row-for-row, across micro-batch
  * boundaries.
  */
class GeoStreamsSpec extends SparkSpecBase {

  import spark.implicits._

  private def ts(min: Int): java.sql.Timestamp =
    java.sql.Timestamp.valueOf(f"2024-01-01 00:$min%02d:00")

  private lazy val polys = GeoFixtures.boundaries(spark, 12).cache()

  /** Deterministic points drawn from the image fixture's (skewed) spatial
    * distribution, with an event time striping them across 3 windows.
    */
  private lazy val points: Seq[GeoPoint] =
    GeoFixtures.images(spark, 400).select(col("lon"), col("lat"))
      .collect().zipWithIndex.map { case (r, i) =>
        GeoPoint(i.toLong, r.getDouble(0), r.getDouble(1), ts(i % 45))
      }.toSeq

  private def enriched(df: org.apache.spark.sql.DataFrame) =
    Streams.enrichPoints(df, "lon", "lat", polys, "polygon_id", "ring", tileZ = 12)

  test("stream-static enrichment equals the batch broadcast join across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[GeoPoint]
    val out = enriched(mem.toDF())
    assert(out.isStreaming, "enrichment of a stream must stay a stream")
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("geo_enrich_out").start()
    try {
      // two micro-batches: the broadcast index must serve both
      val (a, b) = points.splitAt(points.length / 2)
      mem.addData(a: _*); q.processAllAvailable()
      mem.addData(b: _*); q.processAllAvailable()
    } finally q.stop()
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    val got = spark.table("geo_enrich_out")
      .select(col("image_id"), col("polygon_id"), col("tile_x"), col("tile_y"))
      .collect().map(key).toSet
    val expected = enriched(points.toDF())
      .select(col("image_id"), col("polygon_id"), col("tile_x"), col("tile_y"))
      .collect().map(key).toSet
    assert(expected.nonEmpty, "fixture must produce enriched rows")
    assert(got === expected)
  }

  test("regionRates: streaming windowed per-region counts equal the batch plan") {
    implicit val sqlCtx = spark.sqlContext
    // watermark rides the post-join event-time column, so only points that
    // actually land in a polygon advance it — the flush-advancer must be a
    // point known (from the batch join) to hit one
    val joinedIds: Set[Long] = enriched(points.toDF())
      .select(col("image_id")).distinct().collect().map(_.getLong(0)).toSet
    val hit = points.find(p => joinedIds(p.image_id)).get
    val advancer = hit.copy(image_id = -1L, ts = ts(59))
    val mem = MemoryStream[GeoPoint]
    val out = Streams.regionRates(mem.toDF(), "ts", "lon", "lat",
      polys, "polygon_id", "ring", windowLen = "15 minutes", delay = "5 minutes")
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("region_rates_out").start()
    // batch equivalent on the same rows; only windows CLOSED by the final
    // watermark (max event ts(59) − 5 min = ts(54) ≥ window end) can have
    // flushed in append mode, so restrict both sides to them — that is all
    // three data windows [0,15) [15,30) [30,45); the advancer's own
    // [45,60) stays open by construction
    val expected = Streams.regionRates((points :+ advancer).toDF(), "ts", "lon", "lat",
      polys, "polygon_id", "ring", windowLen = "15 minutes", delay = "5 minutes")
      .filter(col("window_start") < lit(ts(45)))
      .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2))).toSet
    try {
      mem.addData(points: _*)
      q.processAllAvailable()
      // advance the watermark past every data window's end; the closed
      // windows flush on the trailing no-data batch, which can land just
      // after processAllAvailable returns — poll briefly
      mem.addData(advancer)
      q.processAllAvailable()
      val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
      while (spark.table("region_rates_out").count() < expected.size &&
             System.nanoTime() < deadline) {
        Thread.sleep(100)
        q.processAllAvailable()
      }
    } finally q.stop()
    val got = spark.table("region_rates_out")
      .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2))).toSet
    assert(expected.nonEmpty, "fixture must produce windowed region counts")
    assert(got === expected)
  }
}
