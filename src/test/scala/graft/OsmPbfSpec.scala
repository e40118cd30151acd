package graft

import org.apache.spark.sql.functions._
import graft.geo.OsmFixtures
import graft.io.{OsmPbf, OsmXml}

/** OSM PBF codec: the planet format the reference refuses
  * (`Input.go:89-90`). Round-trip fidelity, XML-parity of the decoded
  * frames, multi-blob fan-out, the plain-node fallback for
  * mixed-null info, and the named unsupported-codec error.
  */
class OsmPbfSpec extends SparkSpecBase {

  import spark.implicits._

  private lazy val planet = OsmFixtures.planet(spark, nNodes = 2000, nWays = 300, nRelations = 30)

  private def tmp(name: String): String =
    java.nio.file.Files.createTempDirectory("graft_pbf").toString + "/" + name

  /** tags map rendered to a sorted entry string (maps can't be EXCEPT'd). */
  private def tagStr = concat_ws(",", sort_array(transform(map_entries(col("tags")),
    e => concat(e.getField("key"), lit("="), e.getField("value"))))).as("tagstr")

  /** second-granularity timestamp (PBF date_granularity=1000). */
  private def tsSec = (unix_timestamp(col("ts"))).as("ts_sec")

  test("PBF write -> read round trip preserves every element across many blobs") {
    val path = tmp("planet.osm.pbf")
    // 150 elems/block -> >a dozen OSMData blobs; the scan must reassemble all
    assert(OsmPbf.writePlanet(planet, path, blockElems = 150) === ((2000L, 300L, 30L)))
    val idx = OsmPbf.blockIndex(path)
    assert(idx.count(_.kind == "OSMHeader") === 1)
    assert(idx.count(_.kind == "OSMData") > 12, s"expected many data blobs, got ${idx.size}")

    val back = OsmPbf.readPlanet(spark, path)
    assert(back.nodes.count() === 2000)
    assert(back.ways.count() === 300)
    assert(back.relations.count() === 30)
    // nodes: attrs + tags + 1e-7-quantized coords
    val origN = planet.nodes.select(col("id"), col("version"), tsSec, col("changeset"),
      col("uid"), col("user"), round(col("lon"), 7).as("lon7"), round(col("lat"), 7).as("lat7"), tagStr)
    val backN = back.nodes.select(col("id"), col("version"), tsSec, col("changeset"),
      col("uid"), col("user"), col("lon").as("lon7"), col("lat").as("lat7"), tagStr)
    assert(origN.except(backN).count() === 0)
    assert(backN.except(origN).count() === 0)
    // ways: delta-coded refs restored in order
    assert(planet.ways.select(col("id"), col("refs"), tagStr)
      .except(back.ways.select(col("id"), col("refs"), tagStr)).count() === 0)
    // relations: member (type, ref, role) triples in order
    assert(planet.relations.select(col("id"), col("members"), tagStr)
      .except(back.relations.select(col("id"), col("members"), tagStr)).count() === 0)
  }

  test("PBF-read equals XML-read of the same planet (format-agnostic frames)") {
    val xmlPath = tmp("planet.osm")
    val pbfPath = tmp("planet.osm.pbf")
    OsmXml.writePlanet(planet, xmlPath)
    OsmPbf.writePlanet(planet, pbfPath)
    val fromXml = OsmXml.readPlanet(spark, xmlPath)
    val fromPbf = OsmPbf.readPlanet(spark, pbfPath)
    // both writers quantize coords to the same 1e-7 grid and both readers
    // decode the same decimal to the nearest double -> exact equality
    val nx = fromXml.nodes.select(col("id"), col("lon"), col("lat"), col("uid"), col("user"), tagStr)
    val np = fromPbf.nodes.select(col("id"), col("lon"), col("lat"), col("uid"), col("user"), tagStr)
    assert(nx.except(np).count() === 0)
    assert(np.except(nx).count() === 0)
    assert(fromXml.ways.select(col("id"), col("refs"), tagStr)
      .except(fromPbf.ways.select(col("id"), col("refs"), tagStr)).count() === 0)
  }

  test("bounds ride the OSMHeader bbox") {
    val path = tmp("bounded.osm.pbf")
    val withBounds = OsmXml.Planet(planet.nodes, planet.ways, planet.relations,
      Some((-77.12, 38.79, -76.9, 39.0)))
    OsmPbf.writePlanet(withBounds, path)
    val back = OsmPbf.readPlanet(spark, path)
    assert(back.bounds === Some((-77.12, 38.79, -76.9, 39.0)))
  }

  test("mixed-null info falls back to plain nodes and keeps per-node nulls") {
    val nodes = Seq[(Long, Integer, java.sql.Timestamp, java.lang.Long, java.lang.Long, String, Double, Double, Map[String, String])](
      (1L, 2, new java.sql.Timestamp(1500000000000L), 7L, 42L, "alice", -77.0000001, 38.5, Map("craft" -> "brewery")),
      (2L, null, null, null, null, null, -76.5, 38.9000009, Map.empty[String, String]),
      (3L, 5, null, null, 43L, "bob", -76.9, 38.7, Map("x" -> "y"))
    ).map(t => org.apache.spark.sql.Row(t._1, t._2, t._3, t._4, t._5, t._6, t._7, t._8, t._9))
    import scala.jdk.CollectionConverters._
    val p = OsmXml.Planet(
      spark.createDataFrame(nodes.asJava, OsmXml.nodeSchema),
      spark.createDataFrame(Seq.empty[org.apache.spark.sql.Row].asJava, OsmXml.waySchema),
      spark.createDataFrame(Seq.empty[org.apache.spark.sql.Row].asJava, OsmXml.relationSchema),
      None)
    val path = tmp("mixed.osm.pbf")
    OsmPbf.writePlanet(p, path)
    val back = OsmPbf.nodes(spark, path).orderBy("id").collect()
    assert(back.length === 3)
    assert(back(0).getString(5) === "alice" && back(0).getLong(4) === 42L)
    assert(back(1).isNullAt(1) && back(1).isNullAt(2) && back(1).isNullAt(4) && back(1).isNullAt(5))
    // per-field absence inside one info: node 3 has version+uid+user, no ts/cs
    assert(back(2).getInt(1) === 5 && back(2).isNullAt(2) && back(2).isNullAt(3))
    assert(back(2).getString(5) === "bob")
    // 1e-7 coordinate grid round-trips exactly
    assert(back(0).getDouble(6) === -77.0000001)
    assert(back(1).getDouble(7) === 38.9000009)
  }

  test("element-class scans are independent (ways decodable without nodes)") {
    val path = tmp("classes.osm.pbf")
    OsmPbf.writePlanet(planet, path)
    assert(OsmPbf.ways(spark, path).count() === 300)
    assert(OsmPbf.relations(spark, path).count() === 30)
  }

  test("unsupported blob codecs raise a named error") {
    val w = new OsmPbf.WireOut
    w.bytes(4, Array[Byte](1, 2, 3)) // lzma_data
    val e = intercept[IllegalArgumentException](OsmPbf.decodeBlob(w.toBytes))
    assert(e.getMessage.contains("lzma"))
  }

  test("multi-file input: directory of parts, glob, comma list") {
    val dir = java.nio.file.Files.createTempDirectory("graft_pbf_parts").toString
    val a = OsmFixtures.planet(spark, nNodes = 120, nWays = 10, nRelations = 2, seed = 1L)
    val b = OsmFixtures.planet(spark, nNodes = 80, nWays = 5, nRelations = 1, seed = 2L)
    OsmPbf.writePlanet(a, s"$dir/part-a.osm.pbf")
    OsmPbf.writePlanet(b, s"$dir/part-b.osm.pbf")
    assert(OsmPbf.nodes(spark, dir).count() === 200)          // directory
    assert(OsmPbf.nodes(spark, s"$dir/*.osm.pbf").count() === 200) // glob
    assert(OsmPbf.ways(spark,
      s"$dir/part-a.osm.pbf,$dir/part-b.osm.pbf").count() === 15)  // comma list
    val e = intercept[IllegalArgumentException](
      OsmPbf.nodes(spark, s"$dir/missing-*.osm.pbf").count())
    assert(e.getMessage.contains("no files match"))
  }

  test("truncated file raises a named error, not a hang or garbage rows") {
    val path = tmp("trunc.osm.pbf")
    val small = OsmFixtures.planet(spark, nNodes = 50, nWays = 0, nRelations = 0)
    OsmPbf.writePlanet(small, path)
    val bytes = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path))
    val cut = java.nio.file.Paths.get(tmp("cut.osm.pbf"))
    java.nio.file.Files.write(cut, java.util.Arrays.copyOf(bytes, bytes.length - 7))
    val e = intercept[Exception](OsmPbf.blockIndex(cut.toString))
    assert(e.getMessage != null && e.getMessage.toLowerCase.contains("pbf") ||
      e.isInstanceOf[java.io.EOFException],
      s"expected a named pbf/EOF error, got $e")
  }

  test("DataSource V2: spark.read.format(osmpbf), column pruning reaches the scan") {
    val path = tmp("dsv2.osm.pbf")
    OsmPbf.writePlanet(planet, path)
    val df = spark.read.format("osmpbf").load(path)
    assert(df.count() === 2000)
    assert(df.schema === graft.io.OsmXml.nodeSchema)
    // pruned projection: the V2 scan's readSchema must carry ONLY the
    // required columns (the decode then skips tags/info/stringtable wire
    // sections for them — OsmPbf.PbfProj)
    val pruned = df.select(col("id"), col("lon"), col("lat"))
    val scans = pruned.queryExecution.executedPlan.collect {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b
    }
    assert(scans.nonEmpty, "expected a V2 BatchScan")
    assert(scans.head.scan.readSchema().fieldNames.toSeq === Seq("id", "lon", "lat"))
    // pruned values equal the full library scan's
    val a = pruned.collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2))).toSet
    val b = OsmPbf.nodes(spark, path).select(col("id"), col("lon"), col("lat"))
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2))).toSet
    assert(a === b)
    // element option + tag map through SQL on the full read
    assert(spark.read.format("osmpbf").option("element", "ways").load(path).count() === 300)
    val brew = df.filter(element_at(col("tags"), "craft") === "brewery").count()
    val brewLib = OsmPbf.nodes(spark, path)
      .filter(element_at(col("tags"), "craft") === "brewery").count()
    assert(brew === brewLib && brew > 0)
  }

  private def batchScans(df: org.apache.spark.sql.DataFrame) =
    df.queryExecution.executedPlan.collect {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b
    }

  test("sidecar stats prune blobs for pushed id and bbox predicates") {
    import scala.jdk.CollectionConverters._
    // two spatial bands in id order -> id-ordered blobs are spatially pure
    val rows = (1 to 400).map { i =>
      val south = i <= 200
      org.apache.spark.sql.Row(i.toLong, null, null, null, null, null,
        -77.0 + i * 1e-4, if (south) -40.0 + i * 1e-4 else 40.0 + i * 1e-4,
        Map.empty[String, String])
    }
    val p = OsmXml.Planet(
      spark.createDataFrame(rows.asJava, OsmXml.nodeSchema),
      spark.createDataFrame(Seq.empty[org.apache.spark.sql.Row].asJava, OsmXml.waySchema),
      spark.createDataFrame(Seq.empty[org.apache.spark.sql.Row].asJava, OsmXml.relationSchema),
      None)
    val path = tmp("banded.osm.pbf")
    OsmPbf.writePlanet(p, path, blockElems = 50) // 8 blobs: 4 south, 4 north
    assert(OsmPbf.readIndex(path).map(_.count(_.kind == 'n')) === Some(8))

    val df = spark.read.format("osmpbf").load(path)
    def plannedParts(d: org.apache.spark.sql.DataFrame): Int = {
      val s = batchScans(d); assert(s.nonEmpty); s.head.inputRDD.getNumPartitions
    }
    val all = df.select(col("id"), col("lat"))
    // bbox predicate: only the 4 southern blobs survive planning
    val south = df.filter(col("lat") < 0.0).select(col("id"), col("lat"))
    assert(plannedParts(south) < plannedParts(all),
      s"expected blob pruning: ${plannedParts(south)} vs ${plannedParts(all)}")
    assert(south.count() === 200)
    // id range: one blob
    val one = df.filter(col("id") <= 50L)
    assert(plannedParts(one) === 1)
    assert(one.count() === 50)
    // results equal the unpruned scan + filter
    val a = south.collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
    val b = all.filter(col("lat") < 0.0).collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
    assert(a === b)
    // STALE sidecar (recorded length mismatched) is ignored, scan falls
    // back to the block index and stays correct
    val idxPath = java.nio.file.Paths.get(path + ".idx")
    val lines = java.nio.file.Files.readAllLines(idxPath).asScala.toSeq
    java.nio.file.Files.write(idxPath,
      (("pbfidx v1 1" +: lines.tail): Seq[String]).asJava)
    assert(OsmPbf.readIndex(path) === None)
    assert(spark.read.format("osmpbf").load(path).filter(col("lat") < 0.0).count() === 200)
  }

  test("members-only relation projection keeps the string table (roles) — regression") {
    val path = tmp("relproj.osm.pbf")
    OsmPbf.writePlanet(planet, path)
    // pruning away tags+info must NOT prune the string table member roles
    // live in (this once indexed an empty table and crashed on sid > 0)
    val mem = spark.read.format("osmpbf").option("element", "relations").load(path)
      .select(col("id"), col("members"))
    val got = mem.collect().map(r => (r.getLong(0), r.getSeq[org.apache.spark.sql.Row](1)
      .map(m => (m.getString(0), m.getLong(1), m.getString(2))))).toMap
    val full = OsmPbf.relations(spark, path)
      .select(col("id"), col("members"))
      .collect().map(r => (r.getLong(0), r.getSeq[org.apache.spark.sql.Row](1)
        .map(m => (m.getString(0), m.getLong(1), m.getString(2))))).toMap
    assert(got === full)
    assert(got.values.exists(_.exists(_._3.nonEmpty)), "fixture must carry non-empty roles")
  }

  test("multi-path load(a, b) decodes Spark's JSON paths option — regression") {
    val dir = java.nio.file.Files.createTempDirectory("graft_pbf_mp").toString
    val a = OsmFixtures.planet(spark, nNodes = 60, nWays = 5, nRelations = 1, seed = 3L)
    val b = OsmFixtures.planet(spark, nNodes = 40, nWays = 5, nRelations = 1, seed = 4L)
    OsmPbf.writePlanet(a, s"$dir/a.osm.pbf")
    OsmPbf.writePlanet(b, s"$dir/b.osm.pbf")
    val df = spark.read.format("osmpbf").load(s"$dir/a.osm.pbf", s"$dir/b.osm.pbf")
    assert(df.count() === 100)
  }

  test("sidecar-backed COUNT(*) pushdown and planner statistics") {
    val path = tmp("cnt.osm.pbf")
    OsmPbf.writePlanet(planet, path)
    val df = spark.read.format("osmpbf").load(path)
    // count(*) with no filters answers from the sidecar: metadata only
    val cnt = df.groupBy().count()
    val desc = cnt.queryExecution.executedPlan.toString
    assert(desc.contains("COUNT(*)=2000"), desc.take(1500))
    assert(cnt.collect().head.getLong(0) === 2000L)
    assert(df.count() === 2000L) // Dataset.count() rides the same pushdown
    // a filtered count does NOT (blob stats are superset-safe, not exact)
    val f = df.filter(col("id") <= 10L).groupBy().count()
    assert(!f.queryExecution.executedPlan.toString.contains("COUNT(*)="))
    assert(f.collect().head.getLong(0) === 10L)
    // planner statistics come from the sidecar: sizeInBytes = compressed
    // blob bytes (not the "assume huge" default), rowCount exact if exposed
    val stats = df.queryExecution.optimizedPlan.stats
    assert(stats.sizeInBytes > 0 && stats.sizeInBytes < (100L << 20), stats.sizeInBytes)
    stats.rowCount.foreach(rc => assert(rc === BigInt(2000)))
    // ways element counts independently
    assert(spark.read.format("osmpbf").option("element", "ways").load(path).count() === 300L)
  }

  test("distributed part sink: parallel part files read back whole with pruning sidecars") {
    val dir = java.nio.file.Files.createTempDirectory("graft_pbf_dist").toString + "/parts"
    val (n, w, r) = OsmPbf.writePlanetParts(planet, dir, blockElems = 100, partsPerClass = 6)
    assert((n, w, r) === ((2000L, 300L, 30L)))
    // several self-contained parts per class, each with its own sidecar
    val files = new java.io.File(dir).list().toSeq
    assert(files.count(f => f.startsWith("part-nodes-") && f.endsWith(".osm.pbf")) > 1)
    assert(files.count(_.endsWith(".osm.pbf.idx")) ===
      files.count(_.endsWith(".osm.pbf")), "every part carries a sidecar")
    assert(!files.exists(_.endsWith(".inprogress")), "no torn files")
    // the directory reads back as one planet, equal to the single-file path
    val single = tmp("single.osm.pbf")
    OsmPbf.writePlanet(planet, single)
    def key(df: org.apache.spark.sql.DataFrame) = df
      .select(col("id"), col("lon"), col("lat"), col("user"), tagStr)
      .collect().map(_.toString).toSet
    assert(key(OsmPbf.nodes(spark, dir)) === key(OsmPbf.nodes(spark, single)))
    assert(OsmPbf.ways(spark, dir).count() === 300)
    assert(OsmPbf.relations(spark, dir).count() === 30)
    // pushed predicates prune across part sidecars too
    val pruned = spark.read.format("osmpbf").load(dir).filter(col("id") <= 10L)
    assert(pruned.count() === 10)
  }

  test("PbfIngestJob: pbf planet -> resumable snapshot parquet; rerun is a no-op") {
    val pbf = tmp("ingest.osm.pbf")
    OsmPbf.writePlanet(planet, pbf)
    val out = java.nio.file.Files.createTempDirectory("graft_pbf_ingest").toString
    val (n, w, r) = graft.jobs.PbfIngestJob.run(spark, pbf, out)
    assert((n, w, r) === ((2000L, 300L, 30L)))
    // the snapshot tables read back whole, spatially partitioned
    val nodes = graft.io.SnapshotTable.read(spark, s"$out/nodes", "part_cell")
    assert(nodes.count() === 2000)
    assert(nodes.select(col("part_cell")).distinct().count() >= 1)
    assert(graft.io.SnapshotTable.read(spark, s"$out/ways", "part").count() === 300)
    // rerun over the same input: every partition already committed
    val again = graft.jobs.PbfIngestJob.run(spark, pbf, out)
    assert(again === ((2000L, 300L, 30L)))
  }

  test("the path the reference rejects runs end-to-end: CLI .osm.pbf input + pbf output") {
    val pbfIn = tmp("in.osm.pbf")
    val xmlIn = tmp("in.osm")
    OsmPbf.writePlanet(planet, pbfIn)
    OsmXml.writePlanet(planet, xmlIn)
    def cli(args: String*): Unit = {
      val bos = new java.io.ByteArrayOutputStream()
      val code = graft.jobs.OsmCli.run(spark, args.toArray,
        new java.io.PrintStream(bos, true, "UTF-8"))
      assert(code === 0, new String(bos.toByteArray, "UTF-8"))
    }
    // identical filter from the PBF and the XML input must write
    // byte-identical XML (timestamps dropped: PBF is second-granularity,
    // XML preserves the fixture's millis). The -bbox rides the PBF path's
    // V2 source, where it pushes down into blob pruning against the
    // sidecar — same rows either way.
    val outA = tmp("a.osm"); val outB = tmp("b.osm")
    cli("-input_uri", pbfIn, "-filter_keys_keep", "craft",
      "-bbox", "-77.2,38.7,-76.95,39.1",
      "-drop", "relations,timestamp", "-output_uri", outA)
    cli("-input_uri", xmlIn, "-filter_keys_keep", "craft",
      "-bbox", "-77.2,38.7,-76.95,39.1",
      "-drop", "relations,timestamp", "-output_uri", outB)
    val a = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(outA))
    val b = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(outB))
    assert(java.util.Arrays.equals(a, b), "PBF-input run must equal XML-input run byte-for-byte")
    // pbf as an OUTPUT format: write through the pipeline sink, read back
    val outP = tmp("out.osm.pbf")
    cli("-input_uri", xmlIn, "-filter_keys_keep", "craft",
      "-bbox", "-77.2,38.7,-76.95,39.1",
      "-drop", "relations,timestamp", "-output_uri", outP, "-output_format", "pbf")
    val back = OsmPbf.readPlanet(spark, outP)
    val viaXml = OsmXml.readPlanet(spark, outA)
    assert(back.nodes.count() === viaXml.nodes.count())
    assert(back.ways.count() === viaXml.ways.count())
    assert(back.nodes.select(col("id"), col("lon"), col("lat"), col("uid"), col("user"))
      .except(viaXml.nodes.select(col("id"), col("lon"), col("lat"), col("uid"), col("user")))
      .count() === 0)
  }
}
