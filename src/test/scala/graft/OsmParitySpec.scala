package graft

import org.apache.spark.sql.functions._
import graft.geo.OsmFixtures
import graft.io.OsmXml
import graft.ops.OsmOps
import graft.dfl.Dfl

/** The reference README golden scenarios recast on the synthetic planet
  * (FIXTURES.md G1-G3) plus XML round-trip fidelity.
  */
class OsmParitySpec extends SparkSpecBase {

  private lazy val planet = OsmFixtures.planet(spark, nNodes = 2000, nWays = 300, nRelations = 30)

  test("XML write -> read round trip preserves every element (S1/S5)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_osm").toString
    val path = s"$dir/planet.osm.gz"
    OsmXml.writePlanet(planet, path)
    val back = OsmXml.readPlanet(spark, path)
    assert(back.bounds === planet.bounds)
    assert(back.nodes.count() === 2000)
    assert(back.ways.count() === 300)
    assert(back.relations.count() === 30)
    // full-fidelity on nodes: ids, coords (7-decimal format), tags, attrs
    // (maps can't be EXCEPT'd — compare sorted entry strings)
    def tagStr = concat_ws(",", sort_array(transform(map_entries(col("tags")),
      e => concat(e.getField("key"), lit("="), e.getField("value"))))).as("tagstr")
    val origN = planet.nodes.select(col("id"), col("version"), col("uid"), col("user"), tagStr)
    assert(origN.except(back.nodes.select(col("id"), col("version"), col("uid"), col("user"), tagStr))
      .count() === 0)
    val coordDiff = planet.nodes.select(col("id"), round(col("lon"), 7).as("lon7"))
      .join(back.nodes.select(col("id"), col("lon")), "id")
      .filter(abs(col("lon7") - col("lon")) > 1e-7).count()
    assert(coordDiff === 0)
    // ways: ref order preserved
    val refDiff = planet.ways.select("id", "refs")
      .except(back.ways.select("id", "refs")).count()
    assert(refDiff === 0)
    val memDiff = planet.relations.select("id", "members")
      .except(back.relations.select("id", "members")).count()
    assert(memDiff === 0)
  }

  test("XML sink is locale-independent: comma-decimal default locale writes dot decimals") {
    // the f-interpolator honors the JVM default locale; a de_DE host would
    // write lon="-77,0366667" that no reader can parse back — the sink
    // must pin Locale.ROOT
    val dir = java.nio.file.Files.createTempDirectory("graft_osm_loc").toString
    val saved = java.util.Locale.getDefault
    val bytes =
      try {
        java.util.Locale.setDefault(java.util.Locale.GERMANY)
        val path = s"$dir/planet_de.osm"
        OsmXml.writePlanet(planet, path)
        java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path))
      } finally java.util.Locale.setDefault(saved)
    val xml = new String(bytes, java.nio.charset.StandardCharsets.UTF_8)
    assert(!xml.matches("(?s).*(lon|lat)=\"[^\"]*,[^\"]*\".*"),
      "comma decimal leaked into a coordinate attribute")
    val back = OsmXml.readPlanet(spark, s"$dir/planet_de.osm")
    assert(back.nodes.count() === 2000)
  }

  test("pretty XML: parse(pretty(x)) == parse(plain(x)); golden indentation shape") {
    val dir = java.nio.file.Files.createTempDirectory("graft_pretty").toString
    val small = OsmFixtures.planet(spark, nNodes = 40, nWays = 8, nRelations = 2)
    val plain = s"$dir/plain.osm"
    val pretty = s"$dir/pretty.osm"
    assert(OsmXml.writePlanet(small, plain) ===
      OsmXml.writePlanet(small, pretty, pretty = true))
    // round trip: the inserted whitespace is ignored by the reader
    val a = OsmXml.readPlanet(spark, plain)
    val b = OsmXml.readPlanet(spark, pretty)
    // maps can't be EXCEPT'd — compare with the tag map rendered to a
    // sorted entry string (same trick as the round-trip test above)
    def cmp(df: org.apache.spark.sql.DataFrame) = df.withColumn("tagstr",
      concat_ws(",", sort_array(transform(map_entries(col("tags")),
        e => concat(e.getField("key"), lit("="), e.getField("value")))))).drop("tags")
    Seq((a.nodes, b.nodes), (a.ways, b.ways), (a.relations, b.relations)).foreach {
      case (x, y) =>
        assert(x.count() === y.count())
        assert(cmp(x).exceptAll(cmp(y)).count() === 0,
          "pretty parse must equal plain parse")
    }
    // golden shape: the reference's encoder.Indent("", "    ") layout —
    // one element per line, 4-space depth-1, 8-space depth-2
    val text = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(pretty)), "UTF-8")
    assert(text.contains("\n    <node"), text.take(300))
    assert(text.contains("\n        <tag"), text.take(600))
    assert(text.contains("\n        <nd"), "way refs at depth 2")
    assert(text.endsWith("\n</osm>"), text.takeRight(40))
    val plainText = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(plain)), "UTF-8")
    assert(!plainText.contains("\n"), "plain mode stays single-line")
  }

  test("G1 summarize: counts, users, distinct keys/tags like README golden shape") {
    val s = OsmOps.summarize(planet.nodes, "uid", "lon", "lat").collect()(0)
    assert(s.getAs[Long]("n_rows") === 2000L)
    assert(s.getAs[Long]("n_users") === 20L)
    assert(s.getAs[Double]("min_lon") >= -77.12 && s.getAs[Double]("max_lon") <= -76.90)
    val card = OsmOps.tagCardinality(planet.nodes, "tags").collect()(0)
    assert(card.getLong(0) >= 4L) // distinct keys present
    assert(card.getLong(1) > card.getLong(0))
  }

  test("G3 DFL filter + ways_to_nodes + drop_relations (README brewery scenario)") {
    // '@craft like brewery' over nodes
    val pred = Dfl.compile("@craft like brewery", k => element_at(col("tags"), k))
    val breweryNodes = planet.nodes.filter(pred)
    val nBrewery = breweryNodes.count()
    assert(nBrewery > 0, "fixture must contain craft=brewery nodes")

    // way-node retention: nodes referenced by kept ways bypass the filter
    val keptWays = planet.ways.filter(
      Dfl.compile("@craft like brewery", k => element_at(col("tags"), k)))
    val keptRefs = keptWays.select(explode(col("refs")).as("ref"))
    val retained = OsmOps.retention(planet.nodes, "id", pred, keptRefs, "ref")
    val expected = planet.nodes
      .join(keptRefs.distinct().withColumnRenamed("ref", "id"), Seq("id"), "left_semi")
      .unionByName(breweryNodes).dropDuplicates("id").count()
    assert(retained.count() === expected)
    assert(retained.count() >= nBrewery)

    // ways_to_nodes: centroid collapse of kept ways with fresh ids > maxId
    val resolved = OsmOps.resolveWayRefs(keptWays, "id", "refs",
      planet.nodes.select(col("id").as("node_id"), col("lon"), col("lat")), "node_id")
    val maxId = OsmOps.maxId(planet.nodes, "id")
    val collapsed = OsmOps.wayCentroids(resolved, maxId)
    assert(collapsed.count() === keptWays.count())
    assert(collapsed.agg(min(col("new_id"))).collect()(0).getLong(0) === maxId + 1)
  }

  test("G2 attribute drops: dropped columns gone, data preserved (F1)") {
    val dropped = OsmOps.dropAttrs(planet.nodes, Seq("version", "changeset", "uid", "user"))
    assert(dropped.columns.toSet === Set("id", "ts", "lon", "lat", "tags"))
    assert(dropped.count() === 2000)
  }

  test("ways assemble to polygons; ~70% closed (X7 closure intent)") {
    val resolved = OsmOps.resolveWayRefs(planet.ways, "id", "refs",
      planet.nodes.select(col("id").as("node_id"), col("lon"), col("lat")), "node_id")
    val asm = OsmOps.assembleWays(resolved)
    val closedFrac = asm.filter(col("closed")).count().toDouble / asm.count()
    assert(closedFrac > 0.6 && closedFrac < 0.8, s"closed fraction $closedFrac")
  }
}
