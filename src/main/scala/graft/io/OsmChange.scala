package graft.io

import javax.xml.stream.XMLInputFactory

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import scala.collection.mutable

/** OsmChange (`.osc` / `.osc.gz`) support — the OSM ecosystem's diff
  * format (minutely/hourly/daily planet replication), which the reference
  * does not touch at all (its only input is a full `.osm` snapshot). This
  * is the incremental path a 100 TB pipeline actually runs: ingest the
  * planet once ([[OsmPbf]] → snapshot parquet), then merge small `.osc`
  * diffs instead of re-reading the world.
  *
  * Format (public OsmChange spec): `<osmChange>` containing `<create>`,
  * `<modify>`, `<delete>` sections, each holding plain `node`/`way`/
  * `relation` elements in [[OsmXml]]'s shapes. Codec parity with OsmXml:
  * same StAX tolerance for unknown attributes/elements, same `.gz`
  * transparency, same schemas plus a leading `op` column and a document-
  * order `ord` for last-occurrence-wins semantics.
  */
object OsmChange {

  private def withMeta(schema: StructType): StructType =
    StructType(
      StructField("op", StringType, false) +:
      StructField("ord", LongType, false) +: schema.fields)

  val nodeChangeSchema: StructType = withMeta(OsmXml.nodeSchema)
  val wayChangeSchema: StructType = withMeta(OsmXml.waySchema)
  val relationChangeSchema: StructType = withMeta(OsmXml.relationSchema)

  /** One change file's element frames (op ∈ create|modify|delete, ord =
    * document order). Driver-side StAX parse like [[OsmXml.readPlanet]] —
    * change files are diffs, small by construction.
    */
  def read(spark: SparkSession, path: String): (DataFrame, DataFrame, DataFrame) = {
    val f = XMLInputFactory.newInstance()
    // keep the source handle: XMLStreamReader.close() does NOT close it
    // (StAX contract), and a replay of thousands of diffs must not leak fds
    val src = OsmXml.openIn(path)
    try {
      val r = f.createXMLStreamReader(src)
      val nodes = mutable.ArrayBuffer.empty[Row]
      val ways = mutable.ArrayBuffer.empty[Row]
      val rels = mutable.ArrayBuffer.empty[Row]
      var op: String = null
      var ord = 0L
      // element handling is OsmXml.parseElements — structurally the same
      // parser the planet codec uses, so tolerance/timestamp/tag semantics
      // cannot drift between the two formats. This wrapper only tracks the
      // enclosing create/modify/delete section and stamps (op, ord).
      OsmXml.parseElements(r,
        (kind, c, lonLat, tags, refs, members) => if (op != null) {
          kind match {
            case "node" =>
              nodes += Row(op, ord, c._1, c._2, c._3, c._4, c._5, c._6,
                lonLat._1, lonLat._2, tags)
            case "way" =>
              ways += Row(op, ord, c._1, c._2, c._3, c._4, c._5, c._6, refs, tags)
            case "relation" =>
              rels += Row(op, ord, c._1, c._2, c._3, c._4, c._5, c._6, members, tags)
          }
          ord += 1
        },
        onOtherStart = {
          case (n @ ("create" | "modify" | "delete"), _) => op = n
          case _ => // unknown: ignored, OsmXml-style
        },
        onOtherEnd = {
          case "create" | "modify" | "delete" => op = null
          case _ =>
        })
      import scala.jdk.CollectionConverters._
      (spark.createDataFrame(nodes.asJava, nodeChangeSchema),
        spark.createDataFrame(ways.asJava, wayChangeSchema),
        spark.createDataFrame(rels.asJava, relationChangeSchema))
    } finally src.close()
  }

  /** Last occurrence (document order) per id — osmosis semantics when an
    * element appears several times in one change stream.
    */
  def lastPerId(change: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("id")).orderBy(col("ord").desc)
    change.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
  }

  /** CDC merge of one element class: `delete` removes the id, `create`/
    * `modify` upsert the new row. One anti-join (touched ids out) + one
    * union (surviving upserts in) — the change side of a daily diff is
    * ~10^5 rows against a 10^9-row planet, so Catalyst broadcasts it and
    * the planet is never shuffled.
    */
  def applyClass(base: DataFrame, change: DataFrame): DataFrame = {
    val last = lastPerId(change)
    val touched = last.select(col("id"))
    val upserts = last.filter(col("op") =!= "delete").drop("op", "ord")
    base.join(touched, Seq("id"), "left_anti").unionByName(upserts)
  }

  /** Apply a change file to a planet. Bounds are dropped (a diff can move
    * them arbitrarily; recompute via `OsmOps.bounds` when needed).
    */
  def applyChange(planet: OsmXml.Planet, spark: SparkSession, path: String): OsmXml.Planet = {
    val (cn, cw, cr) = read(spark, path)
    OsmXml.Planet(
      applyClass(planet.nodes, cn),
      applyClass(planet.ways, cw),
      applyClass(planet.relations, cr),
      None)
  }
}
