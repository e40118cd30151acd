package graft.io

import java.io.{BufferedInputStream, BufferedOutputStream, FileInputStream, FileOutputStream}
import java.util.zip.{GZIPInputStream, GZIPOutputStream}
import javax.xml.stream.{XMLInputFactory, XMLOutputFactory, XMLStreamConstants}

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import scala.collection.mutable

/** OSM XML compatibility reader/writer — S1/S5 in SURVEY.md §2.1.
  *
  * The engine's canonical storage is Parquet; this driver-side StAX
  * codec exists to ingest/emit golden fixtures in the reference's format
  * (element/attribute shapes per /root/reference/osm/UnmarshalNode.go:22-92,
  * MarshalNode.go:14-66, MarshalPlanet.go:23-188), including `.osm.gz`
  * (reference Input.go:63-98). Unknown attributes/elements are ignored,
  * mirroring the reference's switch-with-default parse.
  *
  * Output order follows the reference: bounds, then nodes (insertion/id
  * order), then ways — MarshalPlanet.go:130-162.
  */
object OsmXml {

  val nodeSchema: StructType = StructType(Seq(
    StructField("id", LongType, false),
    StructField("version", IntegerType, true),
    StructField("ts", TimestampType, true),
    StructField("changeset", LongType, true),
    StructField("uid", LongType, true),
    StructField("user", StringType, true),
    StructField("lon", DoubleType, false),
    StructField("lat", DoubleType, false),
    StructField("tags", MapType(StringType, StringType, false), false)))

  val waySchema: StructType = StructType(Seq(
    StructField("id", LongType, false),
    StructField("version", IntegerType, true),
    StructField("ts", TimestampType, true),
    StructField("changeset", LongType, true),
    StructField("uid", LongType, true),
    StructField("user", StringType, true),
    StructField("refs", ArrayType(LongType, false), false),
    StructField("tags", MapType(StringType, StringType, false), false)))

  val relationSchema: StructType = StructType(Seq(
    StructField("id", LongType, false),
    StructField("version", IntegerType, true),
    StructField("ts", TimestampType, true),
    StructField("changeset", LongType, true),
    StructField("uid", LongType, true),
    StructField("user", StringType, true),
    StructField("members", ArrayType(StructType(Seq(
      StructField("type", StringType, true),
      StructField("ref", LongType, false),
      StructField("role", StringType, true))), false), false),
    StructField("tags", MapType(StringType, StringType, false), false)))

  case class Planet(nodes: DataFrame, ways: DataFrame, relations: DataFrame,
                    bounds: Option[(Double, Double, Double, Double)])

  /** Open an input URI the way the reference's Input.Open does
    * (`/root/reference/osm/Input.go:36-60`): `stdin`/`-`, `http(s)://`,
    * or a local file path, with `.gz` and `.bz2` transparently
    * decompressed (the reference's two codecs, Input.go:47-75; bzip2 via
    * commons-compress off Spark's classpath). Bulk scale data rides
    * Hadoop FS schemes via `spark.read` instead (file/hdfs out of the
    * box; s3a with hadoop-aws + SDK jars deployed — not bundled in this
    * sandbox, see COVERAGE.md §S3).
    */
  private[io] def openIn(path: String) = {
    val raw: java.io.InputStream =
      if (path == "stdin" || path == "-") System.in
      else if (path.startsWith("http://") || path.startsWith("https://"))
        new java.net.URL(path).openStream()
      else if (path.startsWith("file:")) // file-stream sources hand URIs
        new FileInputStream(java.nio.file.Paths.get(java.net.URI.create(path)).toString)
      else new FileInputStream(path)
    val buf = new BufferedInputStream(raw)
    if (path.endsWith(".gz")) new GZIPInputStream(buf)
    else if (path.endsWith(".bz2"))
      new org.apache.commons.compress.compressors.bzip2.BZip2CompressorInputStream(buf)
    else buf
  }

  private val tsFmt = java.time.format.DateTimeFormatter.ISO_OFFSET_DATE_TIME

  private def parseTs(s: String): java.sql.Timestamp =
    java.sql.Timestamp.from(java.time.OffsetDateTime.parse(s, tsFmt).toInstant)

  /** Read a .osm / .osm.gz planet file into typed DataFrames. */
  /** Shared StAX walk over OSM element streams — `.osm` planets and `.osc`
    * change sections alike (the two codecs must never drift: same
    * unknown-attribute/element tolerance, same timestamp parsing, same
    * tag/nd/member handling). Each COMPLETED node/way/relation is handed to
    * `onElement`; elements outside that set (`bounds`, osmChange's
    * `create`/`modify`/`delete` section markers, unknowns) surface through
    * `onOtherStart`/`onOtherEnd` — unknowns are ignored by the default
    * callbacks, mirroring the reference's switch-with-default parse.
    *
    * `common` = (id, version, ts, changeset, uid, user), absent attrs null.
    */
  private[io] def parseElements(
      r: javax.xml.stream.XMLStreamReader,
      onElement: (String,
        (Long, Integer, java.sql.Timestamp, java.lang.Long, java.lang.Long, String),
        (Double, Double), Map[String, String], Seq[Long], Seq[Row]) => Unit,
      onOtherStart: (String, Map[String, String]) => Unit = (_, _) => (),
      onOtherEnd: String => Unit = _ => ()): Unit = {
    var curKind: String = null
    var attrs: Map[String, String] = Map.empty
    var tags = mutable.LinkedHashMap.empty[String, String]
    var refs = mutable.ArrayBuffer.empty[Long]
    var members = mutable.ArrayBuffer.empty[Row]

    def attr(name: String): Option[String] = attrs.get(name)
    def finishElement(): Unit = {
      val common = (
        attr("id").map(_.toLong).getOrElse(0L),
        attr("version").map(v => java.lang.Integer.valueOf(v.toInt)).orNull,
        attr("timestamp").map(parseTs).orNull,
        attr("changeset").map(v => java.lang.Long.valueOf(v.toLong)).orNull,
        attr("uid").map(v => java.lang.Long.valueOf(v.toLong)).orNull,
        attr("user").orNull)
      onElement(curKind, common,
        (attr("lon").map(_.toDouble).getOrElse(0.0), attr("lat").map(_.toDouble).getOrElse(0.0)),
        tags.toMap, refs.toSeq, members.toSeq)
      curKind = null
    }

    while (r.hasNext) {
      r.next() match {
        case XMLStreamConstants.START_ELEMENT =>
          val name = r.getLocalName
          def readAttrs(): Map[String, String] =
            (0 until r.getAttributeCount).map(i => r.getAttributeLocalName(i) -> r.getAttributeValue(i)).toMap
          name match {
            case "node" | "way" | "relation" =>
              curKind = name; attrs = readAttrs()
              tags = mutable.LinkedHashMap.empty; refs = mutable.ArrayBuffer.empty
              members = mutable.ArrayBuffer.empty
            case "tag" if curKind != null =>
              val a = readAttrs(); tags += (a.getOrElse("k", "") -> a.getOrElse("v", ""))
            case "nd" if curKind == "way" =>
              readAttrs().get("ref").foreach(v => refs += v.toLong)
            case "member" if curKind == "relation" =>
              val a = readAttrs()
              members += Row(a.getOrElse("type", ""), a.get("ref").map(_.toLong).getOrElse(0L),
                a.getOrElse("role", ""))
            case other => onOtherStart(other, readAttrs())
          }
        case XMLStreamConstants.END_ELEMENT =>
          if (curKind != null && r.getLocalName == curKind) finishElement()
          else if (curKind == null) onOtherEnd(r.getLocalName)
        case _ =>
      }
    }
    r.close()
    // the caller owns closing the underlying source stream: per the StAX
    // contract XMLStreamReader.close() does not close it
  }

  def readPlanet(spark: SparkSession, path: String): Planet = {
    val f = XMLInputFactory.newInstance()
    val src = openIn(path)
    try {
      val r = f.createXMLStreamReader(src)
      val nodes = mutable.ArrayBuffer.empty[Row]
      val ways = mutable.ArrayBuffer.empty[Row]
      val rels = mutable.ArrayBuffer.empty[Row]
      var bounds: Option[(Double, Double, Double, Double)] = None
      parseElements(r,
        (kind, c, lonLat, tags, refs, members) => kind match {
          case "node" =>
            nodes += Row(c._1, c._2, c._3, c._4, c._5, c._6, lonLat._1, lonLat._2, tags)
          case "way" =>
            ways += Row(c._1, c._2, c._3, c._4, c._5, c._6, refs, tags)
          case "relation" =>
            rels += Row(c._1, c._2, c._3, c._4, c._5, c._6, members, tags)
        },
        onOtherStart = {
          case ("bounds", a) =>
            bounds = Some((a("minlon").toDouble, a("minlat").toDouble,
              a("maxlon").toDouble, a("maxlat").toDouble))
          case _ => // unknown element: ignored (reference default case)
        })
      import scala.jdk.CollectionConverters._
      Planet(
        spark.createDataFrame(nodes.asJava, nodeSchema),
        spark.createDataFrame(ways.asJava, waySchema),
        spark.createDataFrame(rels.asJava, relationSchema),
        bounds)
    } finally src.close()
  }

  /** Write DataFrames back to .osm / .osm.gz in the reference's order:
    * bounds, nodes by id, ways by id (MarshalPlanet.go:130-162). Collects
    * to the driver — fixture-scale only. Returns (nodes, ways, relations)
    * written, counted from the collected arrays (no extra actions).
    *
    * `pretty` adds newline + 4-space indentation, the reference's
    * `encoder.Indent("", "    ")` shape (MarshalPlanet.go:63-65); the
    * inserted whitespace is character data the reader ignores, so
    * parse(pretty(x)) == parse(plain(x)) (OsmParitySpec round-trip).
    */
  /** Locale-fixed "%.7f" — the f-interpolator honors the JVM default
    * locale, and a comma-decimal locale would write lon="-77,0366667"
    * that no OSM reader (including [[readPlanet]]) can parse back.
    */
  private def f7(d: Double): String =
    String.format(java.util.Locale.ROOT, "%.7f", java.lang.Double.valueOf(d))

  def writePlanet(p: Planet, path: String, pretty: Boolean = false): (Long, Long, Long) = {
    val rawOut = new BufferedOutputStream(new FileOutputStream(path))
    val out =
      if (path.endsWith(".gz")) new GZIPOutputStream(rawOut)
      else if (path.endsWith(".bz2"))
        new org.apache.commons.compress.compressors.bzip2.BZip2CompressorOutputStream(rawOut)
      else rawOut
    // mid-write failures (a collect throwing on executor loss, disk full)
    // must not leak the descriptor or leave a torn file posing as output —
    // close what we opened and delete the partial file before rethrowing
    try writePlanetTo(p, out, pretty)
    catch {
      case e: Throwable =>
        try out.close() catch { case _: Throwable => () }
        try new java.io.File(path).delete() catch { case _: Throwable => () }
        throw e
    }
  }

  private def writePlanetTo(p: Planet, out: java.io.OutputStream,
                            pretty: Boolean): (Long, Long, Long) = {
    val w = XMLOutputFactory.newInstance().createXMLStreamWriter(out, "UTF-8")
    def indent(depth: Int): Unit =
      if (pretty) w.writeCharacters("\n" + "    " * depth)
    w.writeStartDocument("UTF-8", "1.0")
    indent(0)
    w.writeStartElement("osm")
    w.writeAttribute("version", "0.6")
    w.writeAttribute("generator", "graft")
    p.bounds.foreach { case (minLon, minLat, maxLon, maxLat) =>
      indent(1)
      w.writeEmptyElement("bounds")
      w.writeAttribute("minlon", f7(minLon)); w.writeAttribute("minlat", f7(minLat))
      w.writeAttribute("maxlon", f7(maxLon)); w.writeAttribute("maxlat", f7(maxLat))
    }

    def writeCommon(r: Row): Unit = {
      w.writeAttribute("id", r.getLong(0).toString)
      if (!r.isNullAt(1)) w.writeAttribute("version", r.getInt(1).toString)
      if (!r.isNullAt(2)) w.writeAttribute("timestamp",
        java.time.OffsetDateTime.ofInstant(r.getTimestamp(2).toInstant,
          java.time.ZoneOffset.UTC).format(tsFmt))
      if (!r.isNullAt(3)) w.writeAttribute("changeset", r.getLong(3).toString)
      if (!r.isNullAt(4)) w.writeAttribute("uid", r.getLong(4).toString)
      if (!r.isNullAt(5)) w.writeAttribute("user", r.getString(5))
    }
    def writeTags(tags: Map[String, String]): Unit =
      tags.toSeq.sortBy(_._1).foreach { case (k, v) =>
        indent(2)
        w.writeEmptyElement("tag"); w.writeAttribute("k", k); w.writeAttribute("v", v)
      }

    val nodeRows = p.nodes.orderBy(col("id")).collect()
    nodeRows.foreach { r =>
      indent(1)
      w.writeStartElement("node")
      writeCommon(r)
      w.writeAttribute("lon", f7(r.getDouble(6)))
      w.writeAttribute("lat", f7(r.getDouble(7)))
      val tags = r.getMap[String, String](8).toMap
      writeTags(tags)
      if (tags.nonEmpty) indent(1)
      w.writeEndElement()
    }
    val wayRows = p.ways.orderBy(col("id")).collect()
    wayRows.foreach { r =>
      indent(1)
      w.writeStartElement("way")
      writeCommon(r)
      val refs = r.getSeq[Long](6)
      refs.foreach { ref =>
        indent(2)
        w.writeEmptyElement("nd"); w.writeAttribute("ref", ref.toString)
      }
      val tags = r.getMap[String, String](7).toMap
      writeTags(tags)
      if (refs.nonEmpty || tags.nonEmpty) indent(1)
      w.writeEndElement()
    }
    val relRows = p.relations.orderBy(col("id")).collect()
    relRows.foreach { r =>
      indent(1)
      w.writeStartElement("relation")
      writeCommon(r)
      val members = r.getSeq[Row](6)
      members.foreach { m =>
        indent(2)
        w.writeEmptyElement("member")
        w.writeAttribute("type", m.getString(0))
        w.writeAttribute("ref", m.getLong(1).toString)
        w.writeAttribute("role", m.getString(2))
      }
      val tags = r.getMap[String, String](7).toMap
      writeTags(tags)
      if (members.nonEmpty || tags.nonEmpty) indent(1)
      w.writeEndElement()
    }
    indent(0)
    w.writeEndElement()
    w.writeEndDocument()
    w.close()
    out.close()
    (nodeRows.length.toLong, wayRows.length.toLong, relRows.length.toLong)
  }
}
