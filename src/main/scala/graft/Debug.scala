package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch diagnostics main (not part of the library surface). */
object Debug {
  def main(args: Array[String]): Unit = {
    val dir = "/root/testdata/sf0.001"
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // q09 row-count anatomy
    val p = geo.GeoTables.points(spark, dir)
    println("pts rows = " + p.count())
    val ways = p.groupBy(col("way_id"))
      .agg(transform(array_sort(collect_list(struct(col("pos"), col("point_id")))),
        v => v.getField("point_id")).as("refs"))
    println("ways rows = " + ways.count())
    println("total refs = " + ways.select(sum(size(col("refs")))).collect()(0))
    val exploded = ways.select(col("way_id"),
      posexplode(col("refs")).as(Seq("pos", "ref")))
    println("exploded = " + exploded.count())
    val nodes = p.select(col("point_id").as("node_id"), col("lon"), col("lat"))
    val joined = ops.OsmOps.resolveWayRefs(ways, "way_id", "refs", nodes, "node_id")
    println("joined = " + joined.count())
    println("distinct ref in nodes = " + nodes.select("node_id").distinct().count())

    // q13 anatomy
    val orders = spark.read.parquet(s"$dir/orders.parquet")
    val kept = orders.filter(col("o_totalprice") > 300000.0)
    println("kept orders = " + kept.count())
    val keptPts = p.join(kept.select(col("o_orderkey").as("way_id")), Seq("way_id"), "left_semi")
    println("kept way pts = " + keptPts.count())
    println("qty>45 pts = " + p.filter(col("quantity") > 45).count())
    val ret = ops.OsmOps.retention(p, "point_id", col("quantity") > 45,
      keptPts.select(col("point_id").as("ref")), "ref")
    println("retention = " + ret.count())

    // q15: polygon 0 anatomy
    val r0 = geo.GeoTables.rects(spark, dir).filter(col("polygon_id") === 0)
      .select("polygon_id", "center_lon", "center_lat")
    r0.show(false)
    val knnRes = graft.knn.Knn.cellRing(r0, "polygon_id", "center_lon", "center_lat",
      p, "point_id", "lon", "lat", k = 5, z = 7)
    knnRes.orderBy("rank").show(false)
    val c = r0.collect()(0)
    val (qlon, qlat) = (c.getDouble(1), c.getDouble(2))
    p.select(col("point_id"),
      ((col("lon") - qlon) * (col("lon") - qlon) + (col("lat") - qlat) * (col("lat") - qlat)).as("dist"))
      .orderBy("dist", "point_id").show(8, false)
    spark.stop()
  }
}
