package graft.geo

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import graft.io.OsmXml

import scala.collection.mutable

/** Deterministic synthetic "DC-like" OSM planet fixture (FIXTURES.md §2):
  * nodes/ways/relations with OSM-parity schemas, Zipf-ish tag sampling
  * including the README scenario values (`craft=brewery`), ~70% closed
  * ways, guaranteed-resolvable refs, and a users dimension.
  */
object OsmFixtures {
  import GeoFixtures.{mix, uniform}

  val TagKeys = Array("craft", "amenity", "shop", "highway", "building")
  val TagVals: Map[String, Array[String]] = Map(
    "craft" -> Array("brewery", "distillery", "pottery", "carpenter"),
    "amenity" -> Array("cafe", "school", "bench"),
    "shop" -> Array("bakery", "books"),
    "highway" -> Array("residential", "primary"),
    "building" -> Array("yes", "house"))

  def planet(spark: SparkSession, nNodes: Int, nWays: Int, nRelations: Int,
             seed: Long = 5L): OsmXml.Planet = {
    val bbox = (-77.12, 38.79, -76.90, 39.00) // DC-like extent
    val users = (1 to 20).map(u => u.toLong -> s"mapper$u").toMap

    def tagsFor(id: Long, salt: Long): Map[String, String] = {
      val nTags = (mix(id + salt) & 3L).toInt // 0..3 tags
      (0 until nTags).map { i =>
        // Zipf-ish: low key indices much more likely
        val kIdx = math.min(TagKeys.length - 1,
          (math.pow(uniform(id, salt + 7 * i), 2.0) * TagKeys.length).toInt)
        val k = TagKeys(kIdx)
        val vs = TagVals(k)
        k -> vs(math.min(vs.length - 1, (math.pow(uniform(id, salt + 11 * i), 2.0) * vs.length).toInt))
      }.toMap
    }

    def common(id: Long, salt: Long): (Integer, java.sql.Timestamp, java.lang.Long, java.lang.Long, String) = {
      val uid = (mix(id + salt + 1) & 0x7fffffffL) % 20 + 1
      ( (mix(id + salt + 2) & 7L).toInt + 1,
        new java.sql.Timestamp(1500000000000L + (mix(id + salt + 3) & 0xffffffffL)),
        java.lang.Long.valueOf((mix(id + salt + 4) & 0xffffffL)),
        java.lang.Long.valueOf(uid),
        users(uid))
    }

    val nodeRows = (1 to nNodes).map { i =>
      val id = i.toLong + seed * 31L
      val (v, ts, cs, uid, user) = common(id, 100)
      val lon = bbox._1 + uniform(id, 201) * (bbox._3 - bbox._1)
      val lat = bbox._2 + uniform(id, 203) * (bbox._4 - bbox._2)
      Row(i.toLong, v, ts, cs, uid, user, lon, lat, tagsFor(id, 301))
    }

    val wayRows = (1 to nWays).map { i =>
      val id = i.toLong + seed * 77L
      val (v, ts, cs, uid, user) = common(id, 400)
      val len = 3 + (mix(id + 401) & 0x7fffffffL).toInt % 6
      val refs0 = (0 until len).map(j =>
        1L + (mix(id + 500 + j) & 0x7fffffffL) % nNodes)
      val closed = uniform(id, 601) < 0.7
      val refs = if (closed) refs0 :+ refs0.head else refs0
      Row(1000000L + i, v, ts, cs, uid, user, refs, tagsFor(id, 701))
    }

    val relRows = (1 to nRelations).map { i =>
      val id = i.toLong + seed * 131L
      val (v, ts, cs, uid, user) = common(id, 800)
      val nm = 1 + (mix(id + 801) & 3L).toInt
      val members = (0 until nm).map { j =>
        val isWay = (mix(id + 900 + j) & 1L) == 0L
        if (isWay) Row("way", 1000000L + 1 + (mix(id + 910 + j) & 0x7fffffffL) % nWays, "outer")
        else Row("node", 1L + (mix(id + 920 + j) & 0x7fffffffL) % nNodes, "")
      }
      Row(2000000L + i, v, ts, cs, uid, user, members, tagsFor(id, 1001))
    }

    import scala.jdk.CollectionConverters._
    OsmXml.Planet(
      spark.createDataFrame(nodeRows.asJava, OsmXml.nodeSchema),
      spark.createDataFrame(wayRows.asJava, OsmXml.waySchema),
      spark.createDataFrame(relRows.asJava, OsmXml.relationSchema),
      Some(bbox))
  }
}
