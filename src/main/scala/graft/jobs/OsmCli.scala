package graft.jobs

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.jobs.Pipeline._
import graft.ops.OsmOps

/** Flag-parity CLI over the pipeline — the reference's `osm` command
  * surface (`/root/reference/cmd/osm/main.go:139-196`) so a go-osm user can
  * run their existing invocations against the engine:
  *
  * {{{
  *   runMain graft.jobs.OsmCli -input_uri in.osm -summarize \
  *     -filter_dfl_exp '@craft like brewery' -ways_to_nodes \
  *     -drop_relations -output_uri breweries.osm
  * }}}
  *
  * Supported flags: config_uri (JSON or the reference's HCL shape),
  * input_uri(+separator), filter_keys_keep, filter_keys_drop (mutually
  * exclusive, main.go:257), filter_dfl_exp (and the README's `-dfl`
  * shorthand), bbox, ways_to_nodes, drop (convenience list),
  * drop_nodes/ways/relations/version/timestamp/changeset/uid/user/author,
  * output_uri(+separator), output_format (defaults to "osm" like
  * main.go:181 — extension sniffing never fires, exactly as in the
  * reference), output_keys_keep/drop, gdal_ini_uri/gdal_ini_section
  * (attribute-drop + keep-keys merge, main.go:411-425), pretty (indented
  * XML), summarize(+summarize_keys), overwrite, dry_run, version, help.
  * Flags parse as `-flag value`, `-flag=value`, or bare booleans — Go's
  * flag grammar. AWS/read_buffer flags don't apply to this engine (Hadoop
  * FS and Spark own IO); filter_dfl_cache is an accepted no-op (the DFL
  * cache is obsolete under codegen).
  */
object OsmCli {

  private val BoolFlags = Set(
    "ways_to_nodes", "drop_nodes", "drop_ways", "drop_relations",
    "drop_version", "drop_timestamp", "drop_changeset", "drop_uid",
    "drop_user", "drop_author", "summarize", "pretty", "overwrite",
    "dry_run", "version", "help", "verbose", "profile", "filter_dfl_cache")

  /** Value-taking flags; the AWS/GDAL/buffer ones are accepted no-ops so
    * existing invocations run unchanged (Hadoop FS and Spark own IO here).
    */
  private val StringFlags = Set(
    "config_uri", "input_uri", "input_uri_separator",
    "filter_keys_keep", "filter_keys_drop", "filter_dfl_exp", "dfl", "bbox",
    "drop", "output_uri", "output_uri_separator", "output_format",
    "output_keys_keep", "output_keys_drop", "summarize_keys",
    "read_buffer_size", "gdal_ini_uri", "gdal_ini_section",
    "aws_default_region", "aws_access_key_id", "aws_secret_access_key",
    "aws_session_token")

  /** Go strconv.ParseBool — the value grammar Go's flag package accepts
    * for `-boolflag=value` (the ONLY value-carrying form for booleans).
    */
  private def goBool(v: String): Boolean = v match {
    case "1" | "t" | "T" | "true" | "TRUE" | "True" => true
    case "0" | "f" | "F" | "false" | "FALSE" | "False" => false
    case other =>
      throw new IllegalArgumentException(s"""invalid boolean value "$other"""")
  }

  /** (string flags, boolean flags). Accepts `-flag value`, `-flag=value`,
    * and bare `-flag` — the three forms Go's flag package (used by the
    * reference) parses; for booleans `-flag=value` is the only
    * value-carrying form, with strconv.ParseBool's grammar. Unknown flags
    * fail fast like the reference (a typo'd boolean must not silently
    * swallow the next flag as its value).
    */
  def parseArgs(args: Array[String]): (Map[String, String], Set[String]) = {
    val strs = Map.newBuilder[String, String]
    val bools = scala.collection.mutable.Set.empty[String]
    var i = 0
    while (i < args.length) {
      val a = args(i)
      require(a.startsWith("-"), s"expected a -flag, got: $a")
      val body = a.dropWhile(_ == '-')
      val (name, eqValue) = body.indexOf('=') match {
        case -1 => (body, None)
        case j => (body.take(j), Some(body.drop(j + 1)))
      }
      if (BoolFlags(name)) {
        // Go: a bool flag given bare is true; -flag=v parses v (last wins)
        if (eqValue.forall(goBool)) bools += name else bools -= name
        i += 1
      } else if (StringFlags(name)) {
        eqValue match {
          case Some(v) => strs += (name -> v); i += 1
          case None =>
            require(i + 1 < args.length, s"flag -$name needs a value")
            strs += (name -> args(i + 1)); i += 2
        }
      } else throw new IllegalArgumentException(s"unknown flag: -$name")
    }
    (strs.result(), bools.toSet)
  }

  private def csv(s: Option[String]): Seq[String] =
    s.map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq).getOrElse(Nil)

  /** Build the PipelineConfig the reference's main.go would build. */
  def toConfig(strs: Map[String, String], bools: Set[String]): PipelineConfig = {
    // validations and the -drop convenience merge run BEFORE the config_uri
    // branch, exactly like the reference (main.go:255-281 precede the
    // :285 config load): the override path must see the merged drop flags
    // and must still reject contradictory filter key lists.
    val keep = csv(strs.get("filter_keys_keep"))
    val drop = csv(strs.get("filter_keys_drop"))
    require(keep.isEmpty || drop.isEmpty,
      "-filter_keys_keep and -filter_keys_drop are mutually exclusive")
    // -drop convenience list (main.go:263; "author" = uid + user)
    val dropList = csv(strs.get("drop")).map(_.toLowerCase).toSet
    def b(flag: String): Boolean = bools(flag) || dropList(flag.stripPrefix("drop_"))
    val dropAuthor = bools("drop_author") || dropList("author")
    // reference validation (main.go:278): uid can't go while the name stays
    require(!(b("drop_uid") && !dropAuthor && !b("drop_user")),
      "You cannot drop the user id but keep the user name.")
    strs.get("config_uri") match {
      case Some(uri) =>
        val loaded = PipelineConfigIO.load(uri)
        // reference main.go:293-330: -input_uri given WITH -config_uri
        // REPLACES the config's inputs (keys-keep/drop filter + element
        // drops from the MERGED flags, drop_nodes included —
        // NewInputConfig at main.go:319). Outputs stay the config's.
        // Without -input_uri the config is used verbatim.
        val inSep0 = strs.get("input_uri_separator").filter(_.nonEmpty)
        val overrideInputs = strs.get("input_uri").map(u =>
          inSep0.map(s => u.split(java.util.regex.Pattern.quote(s)).toSeq)
            .getOrElse(Seq(u))).getOrElse(Nil)
          .map { u =>
            InputSpec(uri = u,
              filter = if (keep.isEmpty && drop.isEmpty) None
                       else Some(FilterSpec(keepKeys = keep, dropKeys = drop)),
              dropNodes = b("drop_nodes"),
              dropWays = b("drop_ways"),
              dropRelations = b("drop_relations"))
          }
        return if (overrideInputs.isEmpty) loaded
               else loaded.copy(inputs = overrideInputs)
      case None =>
    }
    val bbox = strs.get("bbox").map { b =>
      val p = b.split(",").map(_.trim.toDouble)
      require(p.length == 4, s"bbox needs minx,miny,maxx,maxy: $b")
      (p(0), p(1), p(2), p(3))
    }
    val dfl = strs.get("filter_dfl_exp").orElse(strs.get("dfl")).filter(_.nonEmpty)
    val filter =
      if (keep.isEmpty && drop.isEmpty && bbox.isEmpty && dfl.isEmpty) None
      else Some(FilterSpec(keepKeys = keep, dropKeys = drop, bbox = bbox, dfl = dfl))


    val inSep = strs.get("input_uri_separator").filter(_.nonEmpty)
    val inputs = strs.get("input_uri").map(u =>
      inSep.map(s => u.split(java.util.regex.Pattern.quote(s)).toSeq).getOrElse(Seq(u)))
      .getOrElse(Nil)
      .map(u => InputSpec(uri = u, filter = filter))

    val outSep = strs.get("output_uri_separator").filter(_.nonEmpty)
    val outputs0 = strs.get("output_uri").map(u =>
      outSep.map(s => u.split(java.util.regex.Pattern.quote(s)).toSeq).getOrElse(Seq(u)))
      .getOrElse(Nil)
      .map { u =>
        OutputSpec(
          uri = u,
          // reference parity: -output_format DEFAULTS to "osm" (main.go:181),
          // which makes the extension sniff at main.go:723 unreachable — so
          // `-output_uri out.geojson` without -output_format writes OSM XML
          // in the reference, and must here too. (The programmatic
          // Pipeline.formatOf still sniffs when format is None.)
          format = Some(strs.get("output_format").filter(_.nonEmpty).getOrElse("osm")),
          // reference main.go:395: every output receives the INPUT filter
          // (NewOutputConfig's second argument) and re-applies it at
          // marshal time — without this, feature sinks would emit
          // way-geometry nodes that retention kept but the filter rejects
          filter = filter,
          waysToNodes = bools("ways_to_nodes"),
          dropNodes = b("drop_nodes"),
          dropWays = b("drop_ways"),
          dropRelations = b("drop_relations"),
          dropVersion = b("drop_version"),
          dropTimestamp = b("drop_timestamp"),
          dropChangeset = b("drop_changeset"),
          dropUserId = b("drop_uid") || dropAuthor,
          dropUserName = b("drop_user") || dropAuthor,
          keysToKeep = csv(strs.get("output_keys_keep")),
          keysToDrop = csv(strs.get("output_keys_drop")),
          pretty = bools("pretty"))
      }

    // GDAL ini merge (main.go:411-425): [section] fields override the
    // attribute-drop flags (osm_version/changeset/timestamp/uid/user map to
    // drop_* via !ParseBool), and `attributes` becomes the keep-keys
    // projection — UNLESS -output_keys_keep/-output_keys_drop were given,
    // which the reference applies after the merge (main.go:427-436).
    // (The reference's GDAL_INI_KEYS list at main.go:57 omits "osm_uid" and
    // spells "attributes" as "osm_attributes", so those two lookups always
    // miss there; we read the keys the merge code actually uses — the
    // documented GDAL osmconf.ini field names.)
    val outputs = strs.get("gdal_ini_uri").filter(_.nonEmpty) match {
      case None => outputs0
      case Some(uri) =>
        val section = strs.get("gdal_ini_section").filter(_.nonEmpty).getOrElse("points")
        val ini = graft.io.IniFile.loadSection(uri, section)
        def keep(k: String): Boolean = graft.io.IniFile.parseBool(ini.getOrElse(k, ""))
        val iniKeys = csv(ini.get("attributes"))
        outputs0.map { o =>
          o.copy(
            dropVersion = !keep("osm_version"),
            dropChangeset = !keep("osm_changeset"),
            dropTimestamp = !keep("osm_timestamp"),
            dropUserId = !keep("osm_uid"),
            dropUserName = !keep("osm_user"),
            keysToKeep = if (strs.contains("output_keys_keep")) o.keysToKeep else iniKeys)
        }
    }
    // reference main.go:437-440: checked AFTER the GDAL merge (an ini
    // `attributes` keep + -output_keys_drop is the error case flags alone
    // can't see)
    outputs.foreach(o => require(o.keysToKeep.isEmpty || o.keysToDrop.isEmpty,
      s"-output_keys_keep (${o.keysToKeep.mkString(",")}) and -output_keys_drop " +
        s"(${o.keysToDrop.mkString(",")}) are mutually exclusive"))
    PipelineConfig(inputs, outputs)
  }

  /** Summary.Print parity (reference Summary.go:25-39), computed the way
    * the reference's ONE-PASS Summarize intends (Planet.go:497-520): every
    * printed headline number — users, per-class counts, key cardinality,
    * tag cardinality — comes from a SINGLE multi-aggregate job over one
    * unioned frame (per-class tag maps posexplode_outer'd so row counts and
    * key/tag cardinalities share the pass; the username dimension unioned
    * in as its own discriminator rows). The optional per-key table is the
    * one extra job (a groupBy can't ride a global aggregate). ≤2 Spark
    * actions total, asserted in OsmCliSpec.
    */
  def printSummary(out: java.io.PrintStream, shared: Shared,
                   converted: Option[org.apache.spark.sql.DataFrame],
                   keys: Seq[String]): Unit = {
    val (mnLon, mnLat, mxLon, mxLat) = shared.bounds.getOrElse((0.0, 0.0, 0.0, 0.0))
    val nodesAll = converted match {
      case Some(c) => shared.nodes.select("id", "tags").unionByName(c.select("id", "tags"))
      case None => shared.nodes.select("id", "tags")
    }
    val waysAll =
      if (converted.isDefined) shared.ways.select("id", "tags").limit(0)
      else shared.ways.select("id", "tags")

    // one row per (element, tag) — plus one marker row for tagless elements
    // (pos null) so plain row counts survive the explode — plus one row per
    // distinct user from the J3 dimension
    def kv(df: org.apache.spark.sql.DataFrame, et: String) =
      df.select(lit(et).as("et"),
        posexplode_outer(col("tags")).as(Seq("pos", "key", "value")))
    val unioned = kv(nodesAll, "node")
      .unionByName(kv(waysAll, "way"))
      .unionByName(kv(shared.relations.select("id", "tags"), "relation"))
      .unionByName(shared.users.select(lit("user").as("et"),
        lit(null).cast("int").as("pos"), lit(null).cast("string").as("key"),
        lit(null).cast("string").as("value")))
    def nRows(et: String) = // first exploded row or the tagless marker row
      count(when(col("et") === et && (col("pos").isNull || col("pos") === 0), 1))
    val row = unioned.agg(
      count(when(col("et") === "user", 1)).as("n_users"),
      nRows("node").as("n_nodes"), nRows("way").as("n_ways"),
      nRows("relation").as("n_relations"),
      countDistinct(col("key")).as("n_keys"),
      countDistinct(col("key"), col("value")).as("n_tags")).collect()(0)

    out.println("Bounding Box: " + Seq(mnLon, mnLat, mxLon, mxLat)
      .map(v => String.format(java.util.Locale.ROOT, "%.6f", Double.box(v)))
      .mkString(",")) // locale-independent, like Go's FormatFloat
    out.println(s"Total Number of Users: ${row.getLong(0)}")
    out.println(s"Total Number of Nodes: ${row.getLong(1)}")
    out.println(s"Total Number of Ways: ${row.getLong(2)}")
    out.println(s"Total Number of Relations: ${row.getLong(3)}")
    out.println(s"Total Number of Keys: ${row.getLong(4)}")
    out.println(s"Total Number of Tags: ${row.getLong(5)}")
    if (keys.nonEmpty) {
      val byKey = OsmOps.summarizeByKey(
          nodesAll.select(col("tags")), waysAll.select(col("tags")),
          shared.relations.select(col("tags")), keys)
        .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
      keys.foreach { k =>
        val (n, w, r) = byKey.getOrElse(k, (0L, 0L, 0L))
        out.println("-----------")
        out.println(s"Key: $k")
        out.println(s"Number of Nodes: $n")
        out.println(s"Number of Ways: $w")
        out.println(s"Number of Relations: $r")
      }
    }
  }

  /** Returns a process exit code (testable; [[main]] wraps it). */
  def run(spark: SparkSession, args: Array[String],
          out: java.io.PrintStream = System.out): Int = {
    val (strs, bools) = parseArgs(args)
    if (bools("version")) { out.println("graft-osm (Spark engine)"); return 0 }
    if (bools("help")) { out.println("see OsmCli scaladoc for the flag surface"); return 0 }
    val c = toConfig(strs, bools)
    val summarizeWanted = bools("summarize")
    require(c.inputs.nonEmpty, "input_uri is missing")
    if (c.outputs.nonEmpty) validate(c)

    // reference overwrite protection: refuse existing single-file outputs
    if (!bools("overwrite")) c.outputs.foreach { o =>
      val f = new java.io.File(o.uri)
      require(!f.isFile, s"output file already exists at ${o.uri} (use -overwrite)")
    }
    if (bools("dry_run")) {
      out.println(s"dry_run: ${c.inputs.length} input(s), ${c.outputs.length} output(s); plan = ${plan(c)}")
      return 0
    }

    // -profile: per-stage wall-clock like the reference's instrumentation
    // (main.go:657-698, 880-894 logs open/unmarshal/summarize/write)
    def staged[T](stage: String)(body: => T): T = {
      val t0 = System.nanoTime()
      val r = body
      if (bools("profile"))
        out.println("profile: " + stage + " took " + String.format(
          java.util.Locale.ROOT, "%.3f", Double.box((System.nanoTime() - t0) / 1e9)) + " s")
      r
    }

    val p = plan(c)
    val shared = staged("ingest")(ingest(spark, c, p))
    try {
      // summarize-only runs still honor -ways_to_nodes (the planet-level
      // conversion the reference applies before summarizing)
      val wantConvert =
        p.convertAllWaysToNodes || (c.outputs.isEmpty && bools("ways_to_nodes"))
      val conv =
        if (wantConvert)
          Some(staged("ways_to_nodes") {
            val d = waysToNodes(shared)
              .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
            // persist is lazy: when profiling, materialize here so the
            // stage is attributed to the conversion, not the next action
            if (bools("profile")) d.count()
            d
          })
        else None
      c.outputs.foreach { o =>
        val r = staged(s"write ${o.uri}")(runOutput(shared, o, conv))
        if (bools("verbose"))
          out.println(s"wrote ${r.uri} (${r.format}): ${r.nodes} nodes, ${r.ways} ways, ${r.relations} relations")
      }
      if (summarizeWanted)
        staged("summarize")(printSummary(out, shared, conv, csv(strs.get("summarize_keys"))))
      conv.foreach(_.unpersist())
      0
    } finally shared.unpersist()
  }

  def main(args: Array[String]): Unit = {
    val spark = Jobs.session("graft-osm-cli")
    val code =
      try run(spark, args)
      catch {
        case e: IllegalArgumentException => System.err.println(e.getMessage); 1
      }
    spark.stop()
    if (code != 0) sys.exit(code)
  }
}
