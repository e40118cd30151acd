package graft

import org.apache.spark.sql.functions._
import graft.join.SpatialJoin

/** Physical-plan shape assertions: predicate pushdown reaches the parquet
  * scan, column pruning drops unused columns, the polygon side broadcasts,
  * and the PIP refinement runs inside whole-stage codegen.
  */
class PlanSpec extends SparkSpecBase {

  private lazy val dir = {
    val d = java.nio.file.Files.createTempDirectory("graft_plan").toString
    graft.geo.GeoFixtures.imagesLite(spark, 20000).write.mode("overwrite").parquet(s"$d/imgs")
    graft.geo.GeoFixtures.boundaries(spark, 30).write.mode("overwrite").parquet(s"$d/polys")
    d
  }

  test("bbox filter pushes down to the parquet scan; columns pruned") {
    val df = spark.read.parquet(s"$dir/imgs")
      .filter(col("lon").between(-80.0, -70.0) && col("lat").between(35.0, 42.0))
      .select("image_id")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters:"), plan)
    assert(plan.contains("GreaterThanOrEqual(lon,-80.0)"), plan)
    // the plan string elides long filter lists — check the survived ones
    assert(plan.contains("(lat#") && plan.contains(">= 35.0)"), plan)
    val readSchema = "ReadSchema: [^\\n]*".r.findFirstIn(plan).getOrElse("")
    assert(readSchema.contains("lon") && readSchema.contains("image_id"), readSchema)
    assert(!readSchema.contains("craft"), s"craft not pruned: $readSchema")
  }

  test("cell spatial join broadcasts the (small) polygon side") {
    val imgs = spark.read.parquet(s"$dir/imgs")
    val polys = spark.read.parquet(s"$dir/polys")
    val plan = SpatialJoin.cellJoin(imgs, "lon", "lat", polys, "ring", z = 6)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(2000))
    assert(!plan.contains("SortMergeJoin"), "polygon side must broadcast, not sort-merge")
  }

  test("point_in_ring refine runs inside whole-stage codegen (final AQE plan)") {
    val imgs = spark.read.parquet(s"$dir/imgs")
    val polys = spark.read.parquet(s"$dir/polys")
    val joined = SpatialJoin.cellJoin(imgs, "lon", "lat", polys, "ring", z = 6)
    joined.collect() // finalize the adaptive plan so codegen spans are visible
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("isFinalPlan=true"), plan.take(500))
    // PIP is fused into the broadcast join condition, inside a '*(n)' span
    val line = plan.linesIterator.find(_.contains("point_in_ring")).getOrElse("")
    assert(line.contains("*("), s"PIP join stage not codegen'd: $line")
  }

  test("cell_id expression is codegen'd on the point side") {
    val imgs = spark.read.parquet(s"$dir/imgs")
    val df = imgs.select(graft.functions.GeoFunctions.cell_id(col("lon"), col("lat"), 7).as("c"))
    val plan = df.queryExecution.executedPlan.toString
    val line = plan.linesIterator.find(_.contains("cell_id")).getOrElse("")
    assert(line.contains("*(") || plan.startsWith("*("), s"cell_id not in WSCG: $line")
  }

  test("tag key-existence filter is partial-pushdown safe and prunes columns") {
    val tagged = spark.read.parquet(s"$dir/imgs")
      .withColumn("tags", map(lit("craft"), col("craft")))
    val q = graft.ops.OsmOps.filterKeepKeys(tagged, "tags", Seq("craft"))
      .select("image_id")
    assert(q.count() === 20000) // every fixture row has a craft tag
  }
}
