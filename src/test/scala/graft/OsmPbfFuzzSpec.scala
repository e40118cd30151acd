package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.io.{OsmPbf, OsmXml}

import scala.util.Random

/** Seeded fuzz round-trips for the hand-rolled PBF wire codec: adversarial
  * values the structured fixtures never produce — unicode/empty tags,
  * huge ids (zigzag near 2^62), coordinates pinned to the ±180/§85
  * extremes, unsorted way refs (negative deltas), mixed-null info (plain
  * node fallback), empty element classes.
  */
class OsmPbfFuzzSpec extends SparkSpecBase {

  private val rnd = new Random(42)

  private def randString(r: Random): String = {
    val pools = Seq("cafe", "café", "渋谷", "🍺brew", "a b\tc", "", "ß∂ƒ©", "<&\">'",
      "x" * 300)
    if (r.nextBoolean()) pools(r.nextInt(pools.size))
    else r.alphanumeric.take(1 + r.nextInt(12)).mkString
  }

  private def randTags(r: Random): Map[String, String] =
    (0 until r.nextInt(4)).map(_ => (randString(r) + r.nextInt(100)) -> randString(r)).toMap

  private def ts(r: Random): java.sql.Timestamp =
    new java.sql.Timestamp((1L + r.nextInt(1 << 30)) * 1000L) // whole seconds

  test("500 fuzzed nodes/ways/relations round-trip exactly") {
    val usedIds = scala.collection.mutable.Set.empty[Long]
    def freshId(): Long = {
      var id = 0L
      do {
        id = if (rnd.nextBoolean()) rnd.nextInt(1 << 20).toLong + 1
             else (rnd.nextLong() & ((1L << 62) - 1)) + 1 // huge ids: zigzag stress
      } while (!usedIds.add(id))
      id
    }
    val nodes = (1 to 300).map { i =>
      val full = rnd.nextInt(3) // 0 = no info, 1 = full, 2 = partial (plain fallback)
      val lon = rnd.nextInt(5) match {
        case 0 => -180.0
        case 1 => 180.0
        case _ => rnd.nextDouble() * 360.0 - 180.0
      }
      val lat = rnd.nextInt(5) match {
        case 0 => -85.0511
        case 1 => 85.0511
        case _ => rnd.nextDouble() * 170.0 - 85.0
      }
      Row(freshId(),
        if (full == 1 || (full == 2 && rnd.nextBoolean())) Integer.valueOf(rnd.nextInt(100)) else null,
        if (full == 1) ts(rnd) else null,
        if (full == 1) java.lang.Long.valueOf(rnd.nextInt(1 << 24).toLong) else null,
        if (full == 1) java.lang.Long.valueOf(rnd.nextInt(100000).toLong) else null,
        if (full == 1) "user-" + randString(rnd) else null,
        lon, lat, randTags(rnd))
    }
    val ways = (1 to 150).map { _ =>
      // refs deliberately UNSORTED: delta coding must survive negative deltas
      val refs = (0 until 2 + rnd.nextInt(8)).map(_ => rnd.nextInt(1 << 20).toLong + 1)
      Row(freshId(), null, null, null, null, null, refs, randTags(rnd))
    }
    val rels = (1 to 50).map { _ =>
      val members = (0 until 1 + rnd.nextInt(4)).map { _ =>
        Row(Seq("node", "way", "relation")(rnd.nextInt(3)),
          rnd.nextInt(1 << 20).toLong + 1, randString(rnd))
      }
      Row(freshId(), null, null, null, null, null, members, randTags(rnd))
    }
    import scala.jdk.CollectionConverters._
    val p = OsmXml.Planet(
      spark.createDataFrame(nodes.asJava, OsmXml.nodeSchema),
      spark.createDataFrame(ways.asJava, OsmXml.waySchema),
      spark.createDataFrame(rels.asJava, OsmXml.relationSchema), None)
    val path = java.nio.file.Files.createTempDirectory("graft_pbf_fuzz").toString + "/fuzz.osm.pbf"
    assert(OsmPbf.writePlanet(p, path, blockElems = 64) === ((300L, 150L, 50L)))
    val back = OsmPbf.readPlanet(spark, path)

    def tagStr = concat_ws(",", sort_array(transform(map_entries(col("tags")),
      e => concat(e.getField("key"), lit("="), e.getField("value"))))).as("tagstr")
    // nodes: everything except coords exact; coords at the 1e-7 quantum
    val n0 = p.nodes.select(col("id"), col("version"), col("uid"), col("user"),
      unix_timestamp(col("ts")).as("ts_sec"), col("changeset"),
      round(col("lon"), 7).as("lon7"), round(col("lat"), 7).as("lat7"), tagStr)
    val n1 = back.nodes.select(col("id"), col("version"), col("uid"), col("user"),
      unix_timestamp(col("ts")).as("ts_sec"), col("changeset"),
      col("lon").as("lon7"), col("lat").as("lat7"), tagStr)
    // quantization can differ in the last ulp between round() and the
    // decoder; compare coords by tolerance via a join
    val joined = n0.as("a").join(n1.as("b"), col("a.id") === col("b.id"))
    assert(joined.count() === 300)
    assert(joined.filter(
      abs(col("a.lon7") - col("b.lon7")) > 1e-7 ||
      abs(col("a.lat7") - col("b.lat7")) > 1e-7).count() === 0)
    assert(joined.filter(
      !(col("a.tagstr") <=> col("b.tagstr")) ||
      !(col("a.version") <=> col("b.version")) ||
      !(col("a.uid") <=> col("b.uid")) ||
      !(col("a.user") <=> col("b.user")) ||
      !(col("a.ts_sec") <=> col("b.ts_sec")) ||
      !(col("a.changeset") <=> col("b.changeset"))).count() === 0)
    // ways: unsorted refs restored in exact order
    assert(p.ways.select(col("id"), col("refs"), tagStr)
      .except(back.ways.select(col("id"), col("refs"), tagStr)).count() === 0)
    assert(p.relations.select(col("id"), col("members"), tagStr)
      .except(back.relations.select(col("id"), col("members"), tagStr)).count() === 0)
  }

  test("partial DenseInfo (versions + timestamps only) decodes; absent fields are null") {
    // osmformat.proto makes each DenseInfo array individually optional —
    // privacy-stripped third-party extracts carry versions/timestamps but
    // no changeset/uid/user_sid arrays. Hand-build such a file (our own
    // writer always emits all five) and decode: used to AIOOBE on the
    // first node.
    val st = new OsmPbf.WireOut
    st.string(1, "") // string table: index 0 = ""
    val di = new OsmPbf.WireOut
    locally { val w = new OsmPbf.WireOut; Seq(1L, 1L, 2L).foreach(w.varint); di.bytes(1, w.toBytes) } // versions
    locally { val w = new OsmPbf.WireOut; Seq(1000L, 1L, 1L).foreach(w.zigzag); di.bytes(2, w.toBytes) } // ts deltas
    val dense = new OsmPbf.WireOut
    locally { val w = new OsmPbf.WireOut; Seq(10L, 1L, 1L).foreach(w.zigzag); dense.bytes(1, w.toBytes) } // ids
    dense.message(5, di)
    locally { val w = new OsmPbf.WireOut; Seq(100L, 1L, 1L).foreach(w.zigzag); dense.bytes(8, w.toBytes) } // lats
    locally { val w = new OsmPbf.WireOut; Seq(200L, 1L, 1L).foreach(w.zigzag); dense.bytes(9, w.toBytes) } // lons
    val group = new OsmPbf.WireOut
    group.message(2, dense)
    val block = new OsmPbf.WireOut
    block.message(1, st)
    block.message(2, group)
    block.key(17, 0); block.varint(100L)  // granularity
    block.key(18, 0); block.varint(1000L) // date_granularity
    def rawBlob(kind: String, payload: Array[Byte]): Array[Byte] = {
      val blob = new OsmPbf.WireOut
      blob.bytes(1, payload) // raw storage
      val blobBytes = blob.toBytes
      val header = new OsmPbf.WireOut
      header.string(1, kind)
      header.key(3, 0); header.varint(blobBytes.length.toLong)
      val h = header.toBytes
      java.nio.ByteBuffer.allocate(4 + h.length + blobBytes.length)
        .putInt(h.length).put(h).put(blobBytes).array()
    }
    val path = java.nio.file.Files.createTempDirectory("graft_pbf_pi").toString + "/partial.osm.pbf"
    val fos = new java.io.FileOutputStream(path)
    fos.write(rawBlob("OSMData", block.toBytes)); fos.close()
    val rows = OsmPbf.nodes(spark, path).orderBy("id").collect()
    assert(rows.length === 3)
    assert(rows.map(_.getLong(rows(0).fieldIndex("id"))).toSeq === Seq(10L, 11L, 12L))
    rows.foreach { r =>
      assert(!r.isNullAt(r.fieldIndex("version")), "present array must decode")
      assert(!r.isNullAt(r.fieldIndex("ts")), "present array must decode")
      assert(r.isNullAt(r.fieldIndex("changeset")), "absent array must be null")
      assert(r.isNullAt(r.fieldIndex("uid")), "absent array must be null")
      assert(r.isNullAt(r.fieldIndex("user")), "absent array must be null")
    }
  }

  test("truncated DenseInfo array: in-range nodes decode, the tail is null") {
    // a present-but-TRUNCATED array (0 < length < node count) must not
    // silently repeat the last accumulated value for the out-of-range
    // tail — it decodes like an absent array there (null), while in-range
    // nodes keep their delta-accumulated values
    val st = new OsmPbf.WireOut
    st.string(1, "") // string table: index 0 = ""
    val di = new OsmPbf.WireOut
    locally { val w = new OsmPbf.WireOut; Seq(1L, 1L, 2L).foreach(w.varint); di.bytes(1, w.toBytes) } // versions ×3
    locally { val w = new OsmPbf.WireOut; Seq(1000L, 1L).foreach(w.zigzag); di.bytes(2, w.toBytes) } // ts deltas ×2 (truncated)
    val dense = new OsmPbf.WireOut
    locally { val w = new OsmPbf.WireOut; Seq(10L, 1L, 1L).foreach(w.zigzag); dense.bytes(1, w.toBytes) } // ids ×3
    dense.message(5, di)
    locally { val w = new OsmPbf.WireOut; Seq(100L, 1L, 1L).foreach(w.zigzag); dense.bytes(8, w.toBytes) } // lats
    locally { val w = new OsmPbf.WireOut; Seq(200L, 1L, 1L).foreach(w.zigzag); dense.bytes(9, w.toBytes) } // lons
    val group = new OsmPbf.WireOut
    group.message(2, dense)
    val block = new OsmPbf.WireOut
    block.message(1, st)
    block.message(2, group)
    block.key(17, 0); block.varint(100L)  // granularity
    block.key(18, 0); block.varint(1000L) // date_granularity
    def rawBlob(kind: String, payload: Array[Byte]): Array[Byte] = {
      val blob = new OsmPbf.WireOut
      blob.bytes(1, payload) // raw storage
      val blobBytes = blob.toBytes
      val header = new OsmPbf.WireOut
      header.string(1, kind)
      header.key(3, 0); header.varint(blobBytes.length.toLong)
      val h = header.toBytes
      java.nio.ByteBuffer.allocate(4 + h.length + blobBytes.length)
        .putInt(h.length).put(h).put(blobBytes).array()
    }
    val path = java.nio.file.Files.createTempDirectory("graft_pbf_tr").toString + "/trunc.osm.pbf"
    val fos = new java.io.FileOutputStream(path)
    fos.write(rawBlob("OSMData", block.toBytes)); fos.close()
    val rows = OsmPbf.nodes(spark, path).orderBy("id").collect()
    assert(rows.length === 3)
    val tsIdx = rows(0).fieldIndex("ts")
    assert(!rows(0).isNullAt(tsIdx) && !rows(1).isNullAt(tsIdx),
      "in-range nodes keep their accumulated timestamps")
    assert(rows(2).isNullAt(tsIdx),
      "the node past the truncated array's end must be null, not a stale repeat")
    rows.foreach(r => assert(!r.isNullAt(r.fieldIndex("version"))))
  }

  test("a member type PBF cannot represent fails the WRITE with a named error") {
    import scala.jdk.CollectionConverters._
    val rel = Row(1L, null, null, null, null, null,
      Seq(Row("", 42L, "outer")), Map.empty[String, String])
    val p = OsmXml.Planet(
      spark.createDataFrame(Seq.empty[Row].asJava, OsmXml.nodeSchema),
      spark.createDataFrame(Seq.empty[Row].asJava, OsmXml.waySchema),
      spark.createDataFrame(Seq(rel).asJava, OsmXml.relationSchema), None)
    val path = java.nio.file.Files.createTempDirectory("graft_pbf_mt").toString + "/bad.osm.pbf"
    val e = intercept[Exception](OsmPbf.writePlanet(p, path))
    // previously encoded member_type -1 silently — a file this engine's
    // own reader crashes on
    assert(e.getMessage != null && e.getMessage.contains("member type"),
      s"expected a named member-type error, got $e")
  }

  test("empty planet round-trips (header-only file)") {
    import scala.jdk.CollectionConverters._
    val empty = OsmXml.Planet(
      spark.createDataFrame(Seq.empty[Row].asJava, OsmXml.nodeSchema),
      spark.createDataFrame(Seq.empty[Row].asJava, OsmXml.waySchema),
      spark.createDataFrame(Seq.empty[Row].asJava, OsmXml.relationSchema),
      Some((1.0, 2.0, 3.0, 4.0)))
    val path = java.nio.file.Files.createTempDirectory("graft_pbf_e").toString + "/empty.osm.pbf"
    assert(OsmPbf.writePlanet(empty, path) === ((0L, 0L, 0L)))
    val back = OsmPbf.readPlanet(spark, path)
    assert(back.nodes.count() === 0 && back.ways.count() === 0 && back.relations.count() === 0)
    assert(back.bounds === Some((1.0, 2.0, 3.0, 4.0)))
  }
}
