package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.geo.OsmFixtures
import graft.io.OsmXml
import graft.jobs.{Pipeline, PipelineConfigIO}
import graft.jobs.Pipeline._

/** R3 multi-output shared-ingest pipeline: planner conjunction semantics,
  * the reference README composite scenario with independently recomputed
  * golden counts, shared-scan column pruning, config-file equivalence, and
  * the J3 normalized-username byte round-trip.
  */
class PipelineSpec extends SparkSpecBase {

  private lazy val planet = OsmFixtures.planet(spark, 300, 60, 10)
  private lazy val tmp = Files.createTempDirectory("pipeline").toString
  private lazy val inOsm = { val p = s"$tmp/in.osm"; OsmXml.writePlanet(planet, p); p }

  private val K = Seq("amenity", "craft", "shop")

  test("planner conjoins output requirements into the ingest scan (Config.Init)") {
    val c = PipelineConfig(
      inputs = Seq(InputSpec(uri = "x.osm")),
      outputs = Seq(
        OutputSpec(uri = "a.osm", keysToKeep = Seq("amenity", "craft"), dropVersion = true,
          dropTimestamp = true, dropRelations = true, waysToNodes = true),
        OutputSpec(uri = "b.geojsonl", keysToKeep = Seq("craft"), dropTimestamp = true,
          dropChangeset = true, dropRelations = true)))
    val p = Pipeline.plan(c)
    assert(p.inputKeepKeys.head.toSet === Set("amenity", "craft")) // union of keeps
    assert(p.dropTimestamp) // every output drops it
    assert(!p.dropVersion && !p.dropChangeset) // only one output drops
    assert(p.dropRelations && !p.dropWays && !p.dropNodes)
    assert(!p.convertAllWaysToNodes) // only one output converts

    // keep-pushdown binds only when every output declares a keep set
    val c2 = c.copy(outputs = Seq(c.outputs.head, c.outputs(1).copy(keysToKeep = Nil)))
    assert(Pipeline.plan(c2).inputKeepKeys.head.isEmpty)

    // drop-keys push down as the intersection of output drop sets
    val c3 = PipelineConfig(c.inputs, Seq(
      OutputSpec(uri = "a.osm", keysToDrop = Seq("x", "y")),
      OutputSpec(uri = "b.osm", keysToDrop = Seq("y", "z"))))
    assert(Pipeline.plan(c3).inputDropKeys.head === Seq("y"))

    // input keep narrows against the output union
    val c4 = PipelineConfig(
      Seq(InputSpec(uri = "x.osm", keysToKeep = Seq("craft", "building"))),
      c.outputs)
    assert(Pipeline.plan(c4).inputKeepKeys.head === Seq("craft"))
  }

  /** The composite config both scenario tests share (README.md:79-90 +
    * breweries&distilleries geojsonl example): two outputs, shared ingest.
    */
  private def compositeConfig(a: String, b: String) = PipelineConfig(
    inputs = Seq(InputSpec(uri = inOsm)),
    outputs = Seq(
      OutputSpec(uri = a, filter = Some(FilterSpec(keepKeys = K)),
        keysToKeep = K, waysToNodes = true,
        dropVersion = true, dropTimestamp = true, dropChangeset = true,
        dropRelations = true),
      OutputSpec(uri = b,
        filter = Some(FilterSpec(dfl = Some("(@craft like brewery) or (@craft like distillery)"))),
        keysToKeep = Seq("craft"), waysToNodes = true,
        dropTimestamp = true, dropRelations = true)))

  /** independent expectations from the raw fixture rows (plain Scala) */
  private lazy val nodeTags: Seq[(Long, Map[String, String])] =
    planet.nodes.collect().map(r => r.getLong(0) -> r.getMap[String, String](8).toMap).toSeq
  private lazy val wayTags: Seq[(Long, Map[String, String])] =
    planet.ways.collect().map(r => r.getLong(0) -> r.getMap[String, String](7).toMap).toSeq
  private def crafty(m: Map[String, String]) =
    m.get("craft").exists(v => v == "brewery" || v == "distillery")
  private lazy val expA =
    nodeTags.count(_._2.keySet.intersect(K.toSet).nonEmpty) +
      wayTags.count(_._2.keySet.intersect(K.toSet).nonEmpty)
  private lazy val expB = nodeTags.count(t => crafty(t._2)) + wayTags.count(t => crafty(t._2))

  test("README composite scenario: shared ingest, two outputs, golden counts") {
    val a = s"$tmp/a.osm"
    val b = s"$tmp/b.geojsonl"
    val reports = Pipeline.run(spark, compositeConfig(a, b))
    val ra = reports.find(_.uri == a).get
    val rb = reports.find(_.uri == b).get

    assert(expA > 0 && expB > 0 && expB < expA) // fixture is non-trivial
    assert(ra.nodes === expA.toLong)
    assert(ra.ways === 0L && ra.relations === 0L) // converted + dropped
    assert(rb.nodes === expB.toLong)

    // geojsonl: one feature line per kept node, nothing else
    val lines = scala.io.Source.fromFile(b).getLines().toSeq
    assert(lines.size === expB)
    assert(lines.forall(_.startsWith("{\"type\":\"Feature\"")))

    // .osm output round-trips: keys projected to K, version dropped,
    // usernames rejoined from the normalized dimension (J3)
    val backA = OsmXml.readPlanet(spark, a)
    assert(backA.nodes.count() === expA.toLong)
    val keysInA = backA.nodes.select(explode(map_keys(col("tags"))))
      .distinct().collect().map(_.getString(0)).toSet
    assert(keysInA.subsetOf(K.toSet), keysInA)
    assert(backA.nodes.filter(col("version").isNotNull).count() === 0L)
    assert(backA.nodes.filter(col("ts").isNotNull).count() === 0L)
    assert(backA.nodes.filter(col("user").isNull).count() === 0L)
  }

  test("parquet shared scan reads only the union of needed columns") {
    val pq = s"$tmp/planet_pq"
    planet.nodes.write.mode("overwrite").parquet(s"$pq/nodes")
    planet.ways.write.mode("overwrite").parquet(s"$pq/ways")
    planet.relations.write.mode("overwrite").parquet(s"$pq/relations")
    def readSchemaOf(c: PipelineConfig): String = {
      val loaded = Pipeline.loadInput(spark, c.inputs.head, 0, Pipeline.plan(c))
      "ReadSchema: [^\\n]*".r
        .findFirstIn(loaded.nodes.queryExecution.executedPlan.toString).getOrElse("")
    }
    def out(uri: String) = OutputSpec(uri = uri, format = Some("parquet"),
      dropVersion = true, dropTimestamp = true, dropChangeset = true,
      dropUserId = true, dropUserName = true)
    val cAllDrop = PipelineConfig(Seq(InputSpec(uri = pq)),
      Seq(out(s"$tmp/o1"), out(s"$tmp/o2")))
    val rs = readSchemaOf(cAllDrop)
    assert(!rs.contains("version") && !rs.contains("changeset") &&
      !rs.contains("uid") && !rs.contains("user"), rs)
    assert(rs.contains("id") && rs.contains("lon") && rs.contains("tags"), rs)

    // one output keeping changeset forces it back into the shared scan
    val cKeep = cAllDrop.copy(outputs =
      Seq(cAllDrop.outputs.head, cAllDrop.outputs(1).copy(dropChangeset = false)))
    val rs2 = readSchemaOf(cKeep)
    assert(rs2.contains("changeset") && !rs2.contains("version"), rs2)

    // names needed by some output keep uid (the J3 join key) in the scan
    val cNames = cAllDrop.copy(outputs =
      Seq(cAllDrop.outputs.head, cAllDrop.outputs(1).copy(dropUserName = false)))
    val rs3 = readSchemaOf(cNames)
    assert(rs3.contains("uid") && rs3.contains("user"), rs3)
  }

  test("config-file run is equivalent to the programmatic run, byte for byte") {
    // programmatic leg (fresh paths so the test is order-independent)
    val pa = s"$tmp/prog_a.osm"
    val pb = s"$tmp/prog_b.geojsonl"
    Pipeline.run(spark, compositeConfig(pa, pb))

    val ca = s"$tmp/cfg_a.osm"
    val cb = s"$tmp/cfg_b.geojsonl"
    val json =
      s"""{
         |  "inputs": [{"uri": "$inOsm"}],
         |  "outputs": [
         |    {"uri": "$ca", "keys_to_keep": ["amenity", "craft", "shop"],
         |     "ways_to_nodes": true, "drop_version": true, "drop_timestamp": true,
         |     "drop_changeset": true, "drop_relations": true,
         |     "filter": {"keep_keys": ["amenity", "craft", "shop"]}},
         |    {"uri": "$cb", "keys_to_keep": ["craft"], "ways_to_nodes": true,
         |     "drop_timestamp": true, "drop_relations": true,
         |     "filter": {"dfl": "(@craft like brewery) or (@craft like distillery)"}}
         |  ]
         |}""".stripMargin
    val cfgPath = s"$tmp/pipeline.json"
    Files.write(Paths.get(cfgPath), json.getBytes("UTF-8"))
    val parsed = PipelineConfigIO.load(cfgPath)
    assert(parsed === compositeConfig(ca, cb)) // codec fidelity

    Pipeline.run(spark, parsed)
    assert(Files.readAllBytes(Paths.get(ca)).sameElements(Files.readAllBytes(Paths.get(pa))))
    assert(Files.readAllBytes(Paths.get(cb)).sameElements(Files.readAllBytes(Paths.get(pb))))
  }

  test("distributed geojsonl dir sink emits the same ordered stream as the file sink") {
    val fileOut = s"$tmp/stream_file.geojsonl"
    val dirOut = s"$tmp/stream_dir"
    def out(uri: String) = OutputSpec(uri = uri, format = Some("geojsonl"),
      keysToKeep = K, waysToNodes = true, dropRelations = true)
    Pipeline.run(spark, PipelineConfig(Seq(InputSpec(uri = inOsm)),
      Seq(out(fileOut), out(dirOut))))
    val fromFile = scala.io.Source.fromFile(fileOut).getLines().toSeq
    // part files concatenate in name order = range-partition order
    val parts = new java.io.File(dirOut).listFiles()
      .filter(f => f.getName.startsWith("part-")).sortBy(_.getName)
    val fromDir = parts.flatMap(f => scala.io.Source.fromFile(f).getLines()).toSeq
    assert(fromDir === fromFile)
    assert(fromFile.nonEmpty)
  }

  test("J3: normalized-username pipeline round-trips byte-identical to inline") {
    val out = s"$tmp/roundtrip.osm"
    val r = Pipeline.run(spark,
      PipelineConfig(Seq(InputSpec(uri = inOsm)), Seq(OutputSpec(uri = out))))
    assert(r.head.nodes === 300L && r.head.ways === 60L && r.head.relations === 10L)
    assert(Files.readAllBytes(Paths.get(out))
      .sameElements(Files.readAllBytes(Paths.get(inOsm))),
      "pipeline output (users normalized to a dimension and rejoined) must " +
        "be byte-identical to the inline-username write")
  }
}
