package graft

import java.nio.file.Files
import java.util.zip.GZIPOutputStream

import org.apache.spark.sql.functions._
import graft.geo.OsmFixtures
import graft.io.{OsmChange, OsmPbf, OsmXml}

/** OsmChange (.osc) diffs — the replication format the reference never
  * touches: parse, last-occurrence-wins, CDC merge against a planet.
  */
class OsmChangeSpec extends SparkSpecBase {

  import spark.implicits._

  private def writeOsc(content: String, gz: Boolean = false): String = {
    val dir = Files.createTempDirectory("graft_osc").toString
    val path = s"$dir/diff.osc" + (if (gz) ".gz" else "")
    val out: java.io.OutputStream =
      if (gz) new GZIPOutputStream(new java.io.FileOutputStream(path))
      else new java.io.FileOutputStream(path)
    try out.write(content.getBytes("UTF-8")) finally out.close()
    path
  }

  private val osc =
    """<?xml version="1.0" encoding="UTF-8"?>
      |<osmChange version="0.6" generator="test">
      |  <create>
      |    <node id="9001" version="1" lat="10.5" lon="20.5" uid="7" user="alice">
      |      <tag k="amenity" v="cafe"/>
      |    </node>
      |    <way id="9101" version="1"><nd ref="9001"/><nd ref="1"/><tag k="highway" v="path"/></way>
      |  </create>
      |  <modify>
      |    <node id="1" version="2" lat="-5.25" lon="3.75"><tag k="fixme" v="moved"/></node>
      |  </modify>
      |  <delete>
      |    <node id="2" version="2" lat="0" lon="0"/>
      |    <relation id="5001" version="2"/>
      |  </delete>
      |  <modify>
      |    <node id="9002" version="1" lat="1.0" lon="1.0"/>
      |  </modify>
      |  <delete>
      |    <node id="9002" version="2" lat="1.0" lon="1.0"/>
      |  </delete>
      |</osmChange>""".stripMargin

  test("parse: ops, document order, tags/refs, unknown-attr tolerance, .gz") {
    val (cn, cw, cr) = OsmChange.read(spark, writeOsc(osc))
    assert(cn.count() === 5 && cw.count() === 1 && cr.count() === 1)
    val byId = cn.collect().map(r => (r.getLong(2), r.getString(0))).toSet
    assert(byId === Set((9001L, "create"), (1L, "modify"), (2L, "delete"),
      (9002L, "modify"), (9002L, "delete")))
    // document order: the 9002 delete comes after its modify
    val ords9002 = cn.filter(col("id") === 9002L)
      .orderBy("ord").collect().map(_.getString(0)).toSeq
    assert(ords9002 === Seq("modify", "delete"))
    // way refs in order; gz round-trips identically
    assert(cw.head().getSeq[Long](8) === Seq(9001L, 1L))
    val (gzN, _, _) = OsmChange.read(spark, writeOsc(osc, gz = true))
    assert(gzN.count() === 5)
  }

  test("applyChange: create/modify/delete with last-occurrence-wins") {
    // base planet: nodes 1..4, one relation 5001
    val nodes = Seq(
      (1L, 0.0, 0.0), (2L, 1.0, 1.0), (3L, 2.0, 2.0), (4L, 3.0, 3.0)
    ).map { case (id, lon, lat) =>
      org.apache.spark.sql.Row(id, null, null, null, null, null, lon, lat,
        Map.empty[String, String])
    }
    val rels = Seq(org.apache.spark.sql.Row(5001L, null, null, null, null, null,
      Seq(org.apache.spark.sql.Row("node", 1L, "member")), Map.empty[String, String]))
    import scala.jdk.CollectionConverters._
    val planet = OsmXml.Planet(
      spark.createDataFrame(nodes.asJava, OsmXml.nodeSchema),
      spark.createDataFrame(Seq.empty[org.apache.spark.sql.Row].asJava, OsmXml.waySchema),
      spark.createDataFrame(rels.asJava, OsmXml.relationSchema), None)

    val after = OsmChange.applyChange(planet, spark, writeOsc(osc))
    val got = after.nodes.orderBy("id")
      .select(col("id"), col("lon"), col("lat"))
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2))).toSeq
    assert(got === Seq(
      (1L, 3.75, -5.25),   // modified in place
      (3L, 2.0, 2.0),      // untouched
      (4L, 3.0, 3.0),      // untouched
      (9001L, 20.5, 10.5)  // created
      // 2 deleted; 9002 modified THEN deleted -> gone (last wins)
    ))
    // modified node carries the new tags, not the old ones
    val n1 = after.nodes.filter(col("id") === 1L).head()
    assert(n1.getMap[String, String](8) === Map("fixme" -> "moved"))
    // created way present; relation 5001 deleted
    assert(after.ways.count() === 1)
    assert(after.relations.count() === 0)
  }

  test("incremental pipeline: pbf-ingested planet + osc diff == re-read world") {
    val planet = OsmFixtures.planet(spark, nNodes = 300, nWays = 40, nRelations = 5)
    val dir = Files.createTempDirectory("graft_osc_pipe").toString
    OsmPbf.writePlanet(planet, s"$dir/base.osm.pbf")
    val base = OsmPbf.readPlanet(spark, s"$dir/base.osm.pbf")
    val diff =
      """<osmChange version="0.6">
        |  <delete><node id="10" lat="0" lon="0"/></delete>
        |  <modify><node id="11" version="9" lat="12.0000001" lon="-7.5"/></modify>
        |  <create><node id="999999" version="1" lat="45.0" lon="45.0"/></create>
        |</osmChange>""".stripMargin
    val after = OsmChange.applyChange(base, spark, writeOsc(diff))
    assert(after.nodes.count() === 300) // -1 +1
    assert(after.nodes.filter(col("id") === 10L).count() === 0)
    assert(after.nodes.filter(col("id") === 999999L).count() === 1)
    val n11 = after.nodes.filter(col("id") === 11L).head()
    assert(n11.getDouble(6) === -7.5 && n11.getDouble(7) === 12.0000001)
    // untouched rows are byte-identical to the base read
    val untouchedBefore = base.nodes.filter(!col("id").isin(10L, 11L))
      .select(col("id"), col("lon"), col("lat"), col("user"))
    val untouchedAfter = after.nodes.filter(!col("id").isin(10L, 11L, 999999L))
      .select(col("id"), col("lon"), col("lat"), col("user"))
    assert(untouchedBefore.except(untouchedAfter).count() === 0)
    assert(untouchedAfter.except(untouchedBefore).count() === 0)
  }

  test("replication stream: COW versions rewrite only touched partitions, chain, and match batch") {
    import graft.io.SnapshotTable
    val planet = OsmFixtures.planet(spark, nNodes = 300, nWays = 40, nRelations = 5)
    val dir = Files.createTempDirectory("graft_repl").toString
    OsmPbf.writePlanet(planet, s"$dir/base.osm.pbf")
    graft.jobs.PbfIngestJob.run(spark, s"$dir/base.osm.pbf", s"$dir/planet")
    val oscDir = Files.createDirectory(java.nio.file.Paths.get(s"$dir/diffs")).toString
    def drop(name: String, content: String): String =
      Files.writeString(java.nio.file.Paths.get(s"$oscDir/$name"), content).toString
    def latest(): String =
      SnapshotTable.readPointer(spark, s"$dir/versions/LATEST").get
    def runStream(): Unit =
      graft.jobs.ReplicationStreamJob
        .run(spark, s"$dir/planet", oscDir, s"$dir/versions")
        .awaitTermination()

    val d1 = drop("000001.osc",
      """<osmChange version="0.6">
        |  <delete><node id="10" lat="0" lon="0"/></delete>
        |  <create><node id="888888" version="1" lat="45.0" lon="45.0"/></create>
        |</osmChange>""".stripMargin)
    runStream()
    val v0 = s"$dir/versions/${latest()}"
    val v0n = SnapshotTable.read(spark, s"$v0/nodes", "part_cell")
    assert(v0n.count() === 300) // -1 +1
    assert(v0n.filter(col("id") === 10L).count() === 0)
    assert(v0n.filter(col("id") === 888888L).count() === 1)
    // COW: the diff-free ways table is ALL manifest pointers into the base
    // planet (40 id-block partitions, zero data rewritten); the nodes table
    // has at least one real rewritten partition under the version root
    val w0 = SnapshotTable.partitionRefs(spark, s"$v0/ways", "part")
    assert(w0.nonEmpty && w0.values.forall(_.location.startsWith(s"$dir/planet")))
    val n0 = SnapshotTable.partitionRefs(spark, s"$v0/nodes", "part_cell")
    assert(n0.values.exists(_.location.startsWith(v0)))
    assert(SnapshotTable.read(spark, s"$v0/ways", "part").count() === 40)

    // second diff: cross-cell node move + delete of the b0-created node —
    // a new version chains off the previous one
    val d2 = drop("000002.osc",
      """<osmChange version="0.6">
        |  <modify><node id="11" version="9" lat="80.0" lon="170.0"/></modify>
        |  <delete><node id="888888" lat="45.0" lon="45.0"/></delete>
        |</osmChange>""".stripMargin)
    runStream()
    val lat1 = latest()
    val v1 = s"$dir/versions/$lat1"
    assert(v1 !== v0)
    val v1n = SnapshotTable.read(spark, s"$v1/nodes", "part_cell")
    assert(v1n.count() === 299)
    assert(v1n.filter(col("id") === 888888L).count() === 0)
    val n11 = v1n.filter(col("id") === 11L).head()
    assert(n11.getDouble(6) === 170.0 && n11.getDouble(7) === 80.0)
    // inheritance chains collapse: v1's untouched ways still point at the
    // ORIGINAL planet dirs, not at v0
    val w1 = SnapshotTable.partitionRefs(spark, s"$v1/ways", "part")
    assert(w1.values.forall(_.location.startsWith(s"$dir/planet")))

    // rerun with no new files: checkpoint says everything consumed — no new
    // version, LATEST unchanged
    runStream()
    assert(latest() === lat1)

    // the streamed chain equals the batch job over the same diffs
    graft.jobs.ApplyChangeJob.run(spark, s"$dir/base.osm.pbf", Seq(d1, d2), s"$dir/batch")
    val bn = SnapshotTable.read(spark, s"$dir/batch/nodes", "part_cell")
    val proj = Seq("id", "lon", "lat", "user")
    assert(v1n.select(proj.map(col): _*).except(bn.select(proj.map(col): _*)).count() === 0)
    assert(bn.select(proj.map(col): _*).except(v1n.select(proj.map(col): _*)).count() === 0)
    assert(SnapshotTable.read(spark, s"$v1/relations", "part").count() ===
      SnapshotTable.read(spark, s"$dir/batch/relations", "part").count())
  }

  test("ApplyChangeJob commits the merged planet as a snapshot table") {
    val planet = OsmFixtures.planet(spark, nNodes = 200, nWays = 20, nRelations = 3)
    val dir = Files.createTempDirectory("graft_osc_job").toString
    OsmPbf.writePlanet(planet, s"$dir/base.osm.pbf")
    val diff = writeOsc(
      """<osmChange version="0.6">
        |  <delete><node id="5" lat="0" lon="0"/><node id="6" lat="0" lon="0"/></delete>
        |  <create><node id="777777" version="1" lat="1.0" lon="2.0"/></create>
        |</osmChange>""".stripMargin)
    val (n, w, r) = graft.jobs.ApplyChangeJob.run(
      spark, s"$dir/base.osm.pbf", Seq(diff), s"$dir/out")
    assert((n, w, r) === ((199L, 20L, 3L)))
    val nodes = graft.io.SnapshotTable.read(spark, s"$dir/out/nodes", "part_cell")
    assert(nodes.count() === 199)
    assert(nodes.filter(col("id") === 777777L).count() === 1)
    assert(nodes.filter(col("id").isin(5L, 6L)).count() === 0)
  }
}
