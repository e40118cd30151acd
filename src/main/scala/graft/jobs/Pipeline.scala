package graft.jobs

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.io.OsmXml
import graft.ops.OsmOps

/** R3 — the reference's main execution shape: ONE shared ingest feeding N
  * concurrent outputs (`/root/reference/cmd/osm/main.go:716-890`), with
  * output-level requirements conjoined and pushed into the input scan the
  * way `Config.Init` does (`/root/reference/osm/Config.go:100-267`):
  *
  *  - an element class is dropped at ingest only if every output drops it;
  *  - an attribute (version/timestamp/changeset/uid/user) is dropped at
  *    ingest only if every output drops it;
  *  - tag keep-keys push down as the UNION of output keep sets, but only
  *    when every output declares one (else the scan keeps all);
  *  - tag drop-keys push down as the INTERSECTION of output drop sets;
  *  - ways→nodes conversion runs once, shared, when every output wants it.
  *
  * (The reference's `drop_ways` conjunction at Config.go:100-122 can never
  * re-set true from the output loop once an input keeps ways — we implement
  * the documented intent: dropped everywhere ⇔ all inputs drop OR all
  * outputs drop.)
  *
  * The post-ingest frames are `persist()`ed and every output write runs
  * concurrently against them (Spark's FIFO scheduler interleaves the
  * actions), mirroring the reference's parallel writer goroutines.
  *
  * J3 — usernames are normalized at ingest into a (uid → name) dimension
  * (reference `UnmarshalPlanet.go:75-80` keeps one name per uid in
  * `p.UserNames`) and broadcast-rejoined at output time
  * (`MarshalNode.go:33`); element frames carry only `uid`.
  */
object Pipeline {

  /** Composite row filter (reference Filter: KeepNode.go:11-58) —
    * keep-keys row test, drop-keys row test, bbox containment, DFL
    * expression over tags plus the version/timestamp/uid/user attributes.
    */
  case class FilterSpec(
      keepKeys: Seq[String] = Nil,
      dropKeys: Seq[String] = Nil,
      bbox: Option[(Double, Double, Double, Double)] = None,
      dfl: Option[String] = None)

  case class InputSpec(
      uri: String,
      filter: Option[FilterSpec] = None,
      dropWays: Boolean = false,
      dropRelations: Boolean = false,
      dropVersion: Boolean = false,
      dropTimestamp: Boolean = false,
      dropChangeset: Boolean = false,
      dropUserId: Boolean = false,
      dropUserName: Boolean = false,
      keysToKeep: Seq[String] = Nil,
      keysToDrop: Seq[String] = Nil)

  case class OutputSpec(
      uri: String,
      format: Option[String] = None, // osm | geojson | geojsonl | parquet
      filter: Option[FilterSpec] = None,
      waysToNodes: Boolean = false,
      dropNodes: Boolean = false,
      dropWays: Boolean = false,
      dropRelations: Boolean = false,
      dropVersion: Boolean = false,
      dropTimestamp: Boolean = false,
      dropChangeset: Boolean = false,
      dropUserId: Boolean = false,
      dropUserName: Boolean = false,
      keysToKeep: Seq[String] = Nil,
      keysToDrop: Seq[String] = Nil)

  case class PipelineConfig(inputs: Seq[InputSpec], outputs: Seq[OutputSpec])

  /** What the shared scan may skip, conjoined across outputs (Config.Init). */
  case class IngestPlan(
      dropNodes: Boolean,
      dropWays: Boolean,
      dropRelations: Boolean,
      dropVersion: Boolean,
      dropTimestamp: Boolean,
      dropChangeset: Boolean,
      dropUserId: Boolean,
      dropUserName: Boolean,
      inputKeepKeys: Seq[Seq[String]], // per input; Nil = keep every key
      inputDropKeys: Seq[Seq[String]],
      convertAllWaysToNodes: Boolean) {

    /** Attribute columns an ingest scan must still read. */
    def neededAttrCols: Seq[String] =
      Seq("version" -> dropVersion, "ts" -> dropTimestamp,
        "changeset" -> dropChangeset, "uid" -> dropUserId)
        .collect { case (c, false) => c }
  }

  def plan(c: PipelineConfig): IngestPlan = {
    def allOut(f: OutputSpec => Boolean) = c.outputs.nonEmpty && c.outputs.forall(f)
    def allIn(f: InputSpec => Boolean) = c.inputs.nonEmpty && c.inputs.forall(f)

    // union of keep sets, only binding when every output declares one
    val outKeep: Seq[String] =
      if (allOut(_.keysToKeep.nonEmpty)) c.outputs.flatMap(_.keysToKeep).distinct
      else Nil
    // intersection of drop sets, only binding when every output declares one
    val outDrop: Seq[String] =
      if (allOut(_.keysToDrop.nonEmpty))
        c.outputs.map(_.keysToDrop.toSet).reduce(_ intersect _).toSeq.sorted
      else Nil

    IngestPlan(
      dropNodes = allOut(_.dropNodes),
      dropWays = allIn(_.dropWays) || allOut(_.dropWays),
      dropRelations = allIn(_.dropRelations) || allOut(_.dropRelations),
      dropVersion = allOut(_.dropVersion),
      dropTimestamp = allOut(_.dropTimestamp),
      dropChangeset = allOut(_.dropChangeset),
      dropUserId = allOut(_.dropUserId),
      dropUserName = allOut(_.dropUserName),
      inputKeepKeys = c.inputs.map { in =>
        if (in.keysToKeep.isEmpty) outKeep
        else if (outKeep.isEmpty) in.keysToKeep
        else outKeep.intersect(in.keysToKeep)
      },
      inputDropKeys = c.inputs.map(in => (in.keysToDrop ++ outDrop).distinct),
      convertAllWaysToNodes = allOut(_.waysToNodes))
  }

  // ---- filters ---------------------------------------------------------------

  /** Compile a FilterSpec to a Catalyst predicate over an element frame.
    * DFL `@name` resolves attributes the way KeepNode builds its map
    * (timestamp/version/uid/user), all other names via the tags map.
    */
  def filterPredicate(f: FilterSpec, hasCoords: Boolean): Column = {
    val tagKeys = map_keys(col("tags"))
    var pred: Column = lit(true)
    if (f.keepKeys.nonEmpty)
      pred = pred && arrays_overlap(tagKeys, lit(f.keepKeys.toArray))
    if (f.dropKeys.nonEmpty)
      pred = pred && !arrays_overlap(tagKeys, lit(f.dropKeys.toArray))
    f.bbox.foreach { case (minLon, minLat, maxLon, maxLat) =>
      if (hasCoords)
        pred = pred && col("lon").between(minLon, maxLon) &&
          col("lat").between(minLat, maxLat)
    }
    f.dfl.foreach { expr =>
      pred = pred && graft.dfl.Dfl.compile(expr, {
        case "timestamp" => col("ts")
        case "version" => col("version")
        case "uid" => col("uid")
        case "user" => col("user")
        case k => element_at(col("tags"), k)
      })
    }
    pred
  }

  // ---- ingest ----------------------------------------------------------------

  private def emptyOf(spark: SparkSession, schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.createDataFrame(java.util.Collections.emptyList[org.apache.spark.sql.Row](), schema)

  /** Null out an attribute column (the reference's parse-time attribute
    * drop leaves the field unset; our writers omit null attributes).
    * `uid` survives unless names are dropped too: it is the J3 join key
    * for the username dimension even when no output prints it.
    */
  private def dropAttrs(df: DataFrame, p: IngestPlan): DataFrame = {
    var d = df
    def nullify(c: String, t: String): Unit =
      d = d.withColumn(c, lit(null).cast(t))
    if (p.dropVersion) nullify("version", "int")
    if (p.dropTimestamp) nullify("ts", "timestamp")
    if (p.dropChangeset) nullify("changeset", "long")
    if (p.dropUserId && p.dropUserName) nullify("uid", "long")
    if (p.dropUserName) nullify("user", "string")
    d
  }

  private def projectTags(df: DataFrame, keep: Seq[String], drop: Seq[String]): DataFrame = {
    var d = df
    if (keep.nonEmpty) d = d.withColumn("tags", OsmOps.keepKeys(col("tags"), keep))
    if (drop.nonEmpty) d = d.withColumn("tags", OsmOps.dropKeys(col("tags"), drop))
    d
  }

  /** Load one input as OSM XML (.osm/.osm.gz) or a parquet planet directory
    * (`<uri>/nodes|ways|relations`). Parquet scans read only the columns the
    * conjoined plan needs — Catalyst prunes the rest out of the ReadSchema.
    */
  def loadInput(spark: SparkSession, in: InputSpec, idx: Int, p: IngestPlan): OsmXml.Planet = {
    val osmLike = in.uri.endsWith(".osm") || in.uri.endsWith(".osm.gz") ||
      in.uri.endsWith(".osm.bz2")
    val raw: OsmXml.Planet =
      if (osmLike) OsmXml.readPlanet(spark, in.uri)
      else {
        def readClass(name: String, schema: org.apache.spark.sql.types.StructType,
                      bodyCols: Seq[String], skip: Boolean): DataFrame = {
          if (skip) return emptyOf(spark, schema)
          val path = s"${in.uri}/$name"
          // existence via Hadoop FS, not java.io — parquet planets can live
          // on any supported scheme (hdfs, s3a with its jars), not just file:
          val hPath = new org.apache.hadoop.fs.Path(path)
          val fs = hPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
          if (!fs.exists(hPath)) return emptyOf(spark, schema)
          val scan = spark.read.parquet(path)
          // prune: id + body + tags + only the attrs some output still needs
          val needed = Seq("id") ++ p.neededAttrCols.filterNot(_ == "uid") ++
            (if (p.dropUserId && p.dropUserName) Nil else Seq("uid")) ++
            (if (p.dropUserName) Nil else Seq("user")) ++ bodyCols ++ Seq("tags")
          val pruned = scan.select(needed.map(col): _*)
          // restore dropped attrs as nulls so all inputs share one schema
          schema.fields.foldLeft(pruned) { (d, f) =>
            if (d.columns.contains(f.name)) d
            else d.withColumn(f.name, lit(null).cast(f.dataType))
          }.select(schema.fieldNames.map(col): _*)
        }
        OsmXml.Planet(
          readClass("nodes", OsmXml.nodeSchema, Seq("lon", "lat"), skip = p.dropNodes),
          readClass("ways", OsmXml.waySchema, Seq("refs"), skip = p.dropWays || in.dropWays),
          readClass("relations", OsmXml.relationSchema, Seq("members"),
            skip = p.dropRelations || in.dropRelations),
          None)
      }

    val keep = p.inputKeepKeys(idx)
    val drop = p.inputDropKeys(idx)
    var nodes = projectTags(dropAttrs(raw.nodes, p), keep, drop)
    var ways =
      if (p.dropWays || in.dropWays) emptyOf(spark, OsmXml.waySchema)
      else projectTags(dropAttrs(raw.ways, p), keep, drop)
    var rels =
      if (p.dropRelations || in.dropRelations) emptyOf(spark, OsmXml.relationSchema)
      else projectTags(dropAttrs(raw.relations, p), keep, drop)

    // input filter: ways/relations filter directly; nodes referenced by any
    // kept way bypass the node filter (UnmarshalPlanet.go:139-177, J2)
    in.filter.foreach { f =>
      ways = ways.filter(filterPredicate(f, hasCoords = false))
      rels = rels.filter(filterPredicate(f, hasCoords = false))
      val nodeKeep = filterPredicate(f, hasCoords = true)
      nodes =
        if (p.dropWays || in.dropWays) nodes.filter(nodeKeep)
        else OsmOps.retention(nodes, "id", nodeKeep,
          ways.select(explode(col("refs")).as("ref")), "ref")
    }
    OsmXml.Planet(nodes, ways, rels, raw.bounds)
  }

  // ---- shared state after ingest ----------------------------------------------

  case class Shared(nodes: DataFrame, ways: DataFrame, relations: DataFrame,
                    users: DataFrame, maxId: Long,
                    bounds: Option[(Double, Double, Double, Double)]) {
    def unpersist(): Unit = {
      nodes.unpersist(); ways.unpersist(); relations.unpersist(); users.unpersist()
    }
  }

  /** Union the inputs (duplicate-id fail-fast per class, J4), normalize
    * usernames into the (uid, user) dimension (J3), persist everything.
    */
  def ingest(spark: SparkSession, c: PipelineConfig, p: IngestPlan): Shared = {
    val planets = c.inputs.zipWithIndex.map { case (in, i) => loadInput(spark, in, i, p) }
    def unite(dfs: Seq[DataFrame]): DataFrame =
      if (dfs.size == 1) dfs.head else OsmOps.unionWithDupCheck(dfs, "id")
    val nodes0 = unite(planets.map(_.nodes))
    val ways0 = unite(planets.map(_.ways))
    val rels0 = unite(planets.map(_.relations))

    // J3: one name per uid — the reference's dict keeps the LAST name seen
    // (UnmarshalPlanet.go:75-80, parse-order-dependent); we take max(name)
    // per uid so the dimension is deterministic at any parallelism
    val users = Seq(nodes0, ways0, rels0)
      .map(_.select(col("uid"), col("user")).filter(col("uid").isNotNull && col("user").isNotNull))
      .reduce(_ unionByName _)
      .groupBy(col("uid")).agg(max(col("user")).as("user"))
      .persist(StorageLevel.MEMORY_AND_DISK)

    val nodes = nodes0.drop("user").persist(StorageLevel.MEMORY_AND_DISK)
    val ways = ways0.drop("user").persist(StorageLevel.MEMORY_AND_DISK)
    val rels = rels0.drop("user").persist(StorageLevel.MEMORY_AND_DISK)

    // fresh-id base for ways→nodes: max over every element id (Planet.maxId)
    val ids = Seq(nodes, ways, rels).map(_.select(col("id"))).reduce(_ union _)
    val maxId = ids.agg(max(col("id"))).collect()(0) match {
      case r if r.isNullAt(0) => 0L
      case r => r.getLong(0)
    }
    Shared(nodes, ways, rels, users, maxId, planets.headOption.flatMap(_.bounds))
  }

  /** Ways→nodes: centroid over the way's node references — including the
    * duplicated closing vertex of closed rings, as the reference sums every
    * NodeReference (Planet.go:209-244) — with fresh ids maxId+1.. assigned
    * in way-id order (W1; the reference's iteration order is insertion
    * order, which for parsed files IS id order). Version/timestamp/
    * changeset/uid/tags carry over from the way.
    */
  def waysToNodes(shared: Shared): DataFrame = {
    val resolved = OsmOps.resolveWayRefs(
      shared.ways.select(col("id").as("way_id"), col("refs")), "way_id", "refs",
      shared.nodes.select(col("id").as("node_id"), col("lon"), col("lat")), "node_id")
    val cent = resolved.groupBy(col("way_id"))
      .agg(avg(col("lon")).as("lon"), avg(col("lat")).as("lat"))
    val withIds = OsmOps.sequentialIds(
      cent.join(shared.ways.withColumnRenamed("id", "way_id"), Seq("way_id")),
      "way_id", shared.maxId, "new_id")
    withIds.select(
      col("new_id").as("id"), col("version"), col("ts"), col("changeset"),
      col("uid"), lit(null).cast("string").as("user"),
      col("lon"), col("lat"), col("tags"))
  }

  // ---- outputs ----------------------------------------------------------------

  /** Output format by explicit override, then by extension — the
    * reference's sniffing order (main.go:721-729) with parquet added as the
    * engine's canonical scale sink.
    */
  def formatOf(o: OutputSpec): String = o.format.getOrElse {
    val u = o.uri.stripSuffix(".gz").stripSuffix(".bz2")
    if (u.endsWith(".geojson")) "geojson"
    else if (u.endsWith(".geojsonl")) "geojsonl"
    else if (u.endsWith(".osm")) "osm"
    else "parquet"
  }

  case class OutputReport(uri: String, format: String, nodes: Long, ways: Long, relations: Long)

  private def applyOutputShape(df: DataFrame, o: OutputSpec, users: DataFrame,
                               hasCoords: Boolean): DataFrame = {
    // J3 rejoin first: the username dimension is broadcast back on uid
    // (MarshalNode.go:33), so output filters can resolve `@user` too
    var d =
      if (o.dropUserName) df.withColumn("user", lit(null).cast("string"))
      else df.join(broadcast(users), Seq("uid"), "left")
    o.filter.foreach(f => d = d.filter(filterPredicate(f, hasCoords)))
    d = projectTags(d, o.keysToKeep, o.keysToDrop)
    if (o.dropVersion) d = d.withColumn("version", lit(null).cast("int"))
    if (o.dropTimestamp) d = d.withColumn("ts", lit(null).cast("timestamp"))
    if (o.dropChangeset) d = d.withColumn("changeset", lit(null).cast("long"))
    if (o.dropUserId) d = d.withColumn("uid", lit(null).cast("long"))
    d
  }

  def runOutput(shared: Shared, o: OutputSpec, sharedConverted: Option[DataFrame]): OutputReport = {
    val spark = shared.nodes.sparkSession
    val convert = o.waysToNodes
    val baseNodes =
      if (!convert) shared.nodes.withColumn("user", lit(null).cast("string"))
        .select(OsmXml.nodeSchema.fieldNames.map(col): _*)
      else {
        val extra = sharedConverted.getOrElse(waysToNodes(shared))
        shared.nodes.withColumn("user", lit(null).cast("string"))
          .select(OsmXml.nodeSchema.fieldNames.map(col): _*)
          .unionByName(extra)
      }
    val baseWays =
      if (convert || o.dropWays) emptyOf(spark, OsmXml.waySchema)
      else shared.ways.withColumn("user", lit(null).cast("string"))
        .select(OsmXml.waySchema.fieldNames.map(col): _*)
    val baseRels =
      if (o.dropRelations) emptyOf(spark, OsmXml.relationSchema)
      else shared.relations.withColumn("user", lit(null).cast("string"))
        .select(OsmXml.relationSchema.fieldNames.map(col): _*)

    def shaped(df: DataFrame, hasCoords: Boolean, schema: org.apache.spark.sql.types.StructType) =
      if (o.dropNodes && hasCoords) emptyOf(spark, schema)
      else applyOutputShape(df.drop("user"), o, shared.users, hasCoords)
        .select(schema.fieldNames.map(col): _*)

    val nodes = shaped(baseNodes, hasCoords = true, OsmXml.nodeSchema)
    val ways = shaped(baseWays, hasCoords = false, OsmXml.waySchema)
    val rels = shaped(baseRels, hasCoords = false, OsmXml.relationSchema)

    val fmt = formatOf(o)
    val singleFile = o.uri.stripSuffix(".gz").stripSuffix(".bz2")
      .matches(".*\\.(osm|geojson|geojsonl)")
    fmt match {
      case "osm" =>
        OsmXml.writePlanet(OsmXml.Planet(nodes, ways, rels, shared.bounds), o.uri)
      case "geojsonl" if !singleFile =>
        // directory URI: distributed text write; orderBy range-partitions,
        // so part files concatenate to the same globally-ordered stream
        // the single-file sink produces
        featureFrame(nodes, ways).orderBy(col("id")).select(col("f"))
          .write.mode("overwrite").text(o.uri)
      case "geojson" | "geojsonl" =>
        writeGeoJson(nodes, ways, o.uri, featureCollection = fmt == "geojson")
      case "parquet" =>
        nodes.write.mode("overwrite").parquet(s"${o.uri}/nodes")
        ways.write.mode("overwrite").parquet(s"${o.uri}/ways")
        rels.write.mode("overwrite").parquet(s"${o.uri}/relations")
    }
    OutputReport(o.uri, fmt, nodes.count(), ways.count(), rels.count())
  }

  /** GeoJSON features: nodes as Points, ways as LineString/Polygon with
    * geometry resolved through the node frame (reference
    * GetFeatureCollection / GetFeatures). Returns (id, f) — the shared
    * plan of both geojson sinks.
    */
  def featureFrame(nodes: DataFrame, ways: DataFrame): DataFrame = {
    import graft.functions.GeoFunctions
    val nodeFeatures = nodes.select(col("id"),
      GeoFunctions.geojson_feature(col("id"), col("lon"), col("lat"), col("tags")).as("f"))
    val resolved = OsmOps.resolveWayRefs(
      ways.select(col("id").as("way_id"), col("refs")), "way_id", "refs",
      nodes.select(col("id").as("node_id"), col("lon"), col("lat")), "node_id")
    val wayFeatures = OsmOps.assembleWays(resolved)
      .join(ways.select(col("id").as("way_id"), col("tags")), Seq("way_id"))
      .select(col("way_id").as("id"),
        concat(lit("""{"type":"Feature","id":"""), col("way_id"),
          lit(""","properties":"""), to_json(col("tags")),
          lit(""","geometry":"""), GeoFunctions.geojson_way_geometry(col("ring")),
          lit("}")).as("f"))
    nodeFeatures.unionByName(wayFeatures)
  }

  /** Single-file GeoJSON sinks (reference parity: one FeatureCollection /
    * one feature-per-line file) — driver write at fixture scale; dir URIs
    * take the distributed `write.text` path in [[runOutput]].
    */
  private def writeGeoJson(nodes: DataFrame, ways: DataFrame, path: String,
                           featureCollection: Boolean): Unit = {
    val features = featureFrame(nodes, ways).orderBy(col("id"))
      .select(col("f")).collect().map(_.getString(0))
    val out = new java.io.PrintWriter(new java.io.BufferedWriter(new java.io.FileWriter(path)))
    try {
      if (featureCollection) {
        out.print("""{"type":"FeatureCollection","features":[""")
        out.print(features.mkString(","))
        out.println("]}")
      } else features.foreach(out.println)
    } finally out.close()
  }

  /** Execute the whole pipeline: plan → shared ingest → N concurrent
    * output writes (reference main.go:716-890's writer goroutines).
    */
  def run(spark: SparkSession, c: PipelineConfig): Seq[OutputReport] = {
    require(c.inputs.nonEmpty, "pipeline needs at least one input")
    require(c.outputs.nonEmpty, "pipeline needs at least one output")
    val p = plan(c)
    val shared = ingest(spark, c, p)
    try {
      val sharedConverted =
        if (p.convertAllWaysToNodes)
          Some(waysToNodes(shared).persist(StorageLevel.MEMORY_AND_DISK))
        else None
      import scala.concurrent.{Await, Future}
      import scala.concurrent.duration.Duration
      import scala.concurrent.ExecutionContext.Implicits.global
      val futures = c.outputs.map(o => Future(runOutput(shared, o, sharedConverted)))
      val reports = Await.result(Future.sequence(futures), Duration.Inf)
      sharedConverted.foreach(_.unpersist())
      reports
    } finally shared.unpersist()
  }
}

/** Config-file-driven execution (reference LoadConfig.go:15-45 loads HCL;
  * we load the same shape as JSON): `PipelineJob <config.json>`.
  */
object PipelineJob {
  def main(args: Array[String]): Unit = {
    val spark = Jobs.session("graft-pipeline")
    val config = PipelineConfigIO.load(args(0))
    val reports = Pipeline.run(spark, config)
    reports.foreach { r =>
      println(s"""{"uri": "${r.uri}", "format": "${r.format}", "nodes": ${r.nodes}, "ways": ${r.ways}, "relations": ${r.relations}}""")
    }
    spark.stop()
  }
}
