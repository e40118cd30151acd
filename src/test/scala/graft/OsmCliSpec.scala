package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.geo.OsmFixtures
import graft.io.OsmXml
import graft.jobs.OsmCli
import graft.jobs.Pipeline._

/** The reference `osm` CLI flag surface (cmd/osm/main.go:139-196) mapped to
  * the pipeline: README brewery scenario end to end, Summary.Print golden
  * shape, flag→config translation, mutual exclusions, overwrite protection.
  */
class OsmCliSpec extends SparkSpecBase {

  private lazy val tmp = Files.createTempDirectory("osmcli").toString
  private lazy val planet = OsmFixtures.planet(spark, 300, 60, 10)
  private lazy val inOsm = { val p = s"$tmp/in.osm"; OsmXml.writePlanet(planet, p); p }

  private def runCli(args: String*): (Int, Seq[String]) = {
    val bos = new java.io.ByteArrayOutputStream()
    val code = OsmCli.run(spark, args.toArray, new java.io.PrintStream(bos, true, "UTF-8"))
    (code, new String(bos.toByteArray, "UTF-8").split("\n").toSeq.filter(_.nonEmpty))
  }

  test("flag surface translates to the reference's config shape") {
    val (strs, bools) = OsmCli.parseArgs(Array(
      "-input_uri", "a.osm:b.osm", "-input_uri_separator", ":",
      "-filter_keys_keep", "craft,amenity", "-bbox", "-77.2,38.7,-76.9,39.0",
      "-ways_to_nodes", "-drop", "relations,timestamp,author",
      "-output_uri", "x.geojsonl", "-output_keys_keep", "craft"))
    val c = OsmCli.toConfig(strs, bools)
    assert(c.inputs.map(_.uri) === Seq("a.osm", "b.osm"))
    assert(c.inputs.head.filter.get.keepKeys === Seq("craft", "amenity"))
    assert(c.inputs.head.filter.get.bbox === Some((-77.2, 38.7, -76.9, 39.0)))
    val o = c.outputs.head
    assert(o.waysToNodes && o.dropRelations && o.dropTimestamp)
    assert(o.dropUserId && o.dropUserName) // author = uid + user
    assert(!o.dropVersion && !o.dropChangeset)
    assert(o.keysToKeep === Seq("craft"))
  }

  test("mutually exclusive keep/drop filter keys fail fast like the reference") {
    intercept[IllegalArgumentException] {
      OsmCli.toConfig(Map("input_uri" -> "x.osm",
        "filter_keys_keep" -> "a", "filter_keys_drop" -> "b"), Set.empty)
    }
  }

  test("unknown flags fail fast; a typo'd boolean never swallows the next flag") {
    val e = intercept[IllegalArgumentException] {
      OsmCli.parseArgs(Array("-input_uri", "x.osm", "-sumarize", "-drop_relations"))
    }
    assert(e.getMessage.contains("-sumarize"))
    // accepted reference no-ops still parse
    val (strs, _) = OsmCli.parseArgs(Array("-aws_default_region", "us-east-1",
      "-input_uri", "x.osm"))
    assert(strs("input_uri") === "x.osm")
  }

  test("README brewery scenario: summarize + ways_to_nodes + output") {
    val outFile = s"$tmp/breweries.osm"
    val (code, lines) = runCli(
      "-input_uri", inOsm, "-summarize",
      "-dfl", "(@craft like brewery) or (@craft like distillery)",
      "-ways_to_nodes", "-drop_relations", "-output_uri", outFile)
    assert(code === 0)

    // independent expectation straight off the fixture rows: the input
    // filter keeps crafty nodes PLUS nodes referenced by kept ways (J2
    // retention, UnmarshalPlanet.go:139-177), and each kept way converts
    // to one fresh node
    def crafty(m: Map[String, String]) =
      m.get("craft").exists(v => v == "brewery" || v == "distillery")
    val craftyNodeIds = planet.nodes.collect()
      .filter(r => crafty(r.getMap[String, String](8).toMap)).map(_.getLong(0)).toSet
    val craftyWays = planet.ways.collect()
      .filter(r => crafty(r.getMap[String, String](7).toMap))
    val refIds = craftyWays.flatMap(_.getSeq[Long](6)).toSet
    val expNodes = (craftyNodeIds ++ refIds).size + craftyWays.length

    // the written planet: retained nodes + converted filtered ways
    val back = OsmXml.readPlanet(spark, outFile)
    assert(back.nodes.count() === expNodes.toLong)
    assert(back.ways.count() === 0L)
    assert(back.relations.count() === 0L)

    // Summary.Print golden shape over the ingested (filtered) planet
    assert(lines.exists(_.startsWith("Bounding Box: ")))
    def stat(prefix: String): Long =
      lines.find(_.startsWith(prefix)).get.stripPrefix(prefix).trim.toLong
    assert(stat("Total Number of Ways:") === 0L) // converted away
    assert(stat("Total Number of Relations:") === 0L)
    assert(stat("Total Number of Nodes:") > 0L)
    assert(stat("Total Number of Keys:") > 0L)
  }

  test("summarize_keys prints per-key node/way/relation blocks") {
    val (code, lines) = runCli("-input_uri", inOsm, "-summarize",
      "-summarize_keys", "craft,amenity")
    assert(code === 0)
    assert(lines.count(_ == "-----------") === 2)
    assert(lines.contains("Key: craft") && lines.contains("Key: amenity"))
    val craftNodes = lines(lines.indexOf("Key: craft") + 1)
    assert(craftNodes.startsWith("Number of Nodes: "))
    // matches the operator's own answer
    val byKey = graft.ops.OsmOps.summarizeByKey(
        planet.nodes, planet.ways, planet.relations, Seq("craft"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(craftNodes === s"Number of Nodes: ${byKey("craft")}")
  }

  test("-profile prints per-stage wall clock like the reference") {
    val (code, lines) = runCli("-input_uri", inOsm, "-summarize", "-profile")
    assert(code === 0)
    assert(lines.exists(_.matches("profile: ingest took \\d+\\.\\d+ s")), lines.mkString("|"))
    assert(lines.exists(_.startsWith("profile: summarize took ")))
  }

  test("overwrite protection and dry_run") {
    val existing = s"$tmp/exists.osm"
    Files.write(java.nio.file.Paths.get(existing), "x".getBytes)
    intercept[IllegalArgumentException] {
      OsmCli.run(spark, Array("-input_uri", inOsm, "-output_uri", existing))
    }
    // -overwrite allows it; -dry_run must not write anything
    val fresh = s"$tmp/fresh.osm"
    val (code, lines) = runCli("-input_uri", inOsm, "-output_uri", fresh, "-dry_run")
    assert(code === 0)
    assert(lines.exists(_.startsWith("dry_run:")))
    assert(!Files.exists(java.nio.file.Paths.get(fresh)))
  }

  test("CLI run equals the equivalent config-file pipeline run byte for byte") {
    val cliOut = s"$tmp/cli_eq.osm"
    val cfgOut = s"$tmp/cfg_eq.osm"
    val (code, _) = runCli("-input_uri", inOsm, "-output_uri", cliOut,
      "-filter_keys_keep", "amenity,craft,shop", "-output_keys_keep", "amenity,craft,shop",
      "-ways_to_nodes", "-drop", "relations,version,timestamp,changeset")
    assert(code === 0)
    graft.jobs.Pipeline.run(spark, PipelineConfig(
      Seq(InputSpec(uri = inOsm,
        filter = Some(FilterSpec(keepKeys = Seq("amenity", "craft", "shop"))))),
      Seq(OutputSpec(uri = cfgOut, keysToKeep = Seq("amenity", "craft", "shop"),
        waysToNodes = true, dropRelations = true, dropVersion = true,
        dropTimestamp = true, dropChangeset = true))))
    assert(Files.readAllBytes(java.nio.file.Paths.get(cliOut))
      .sameElements(Files.readAllBytes(java.nio.file.Paths.get(cfgOut))))
  }
}
