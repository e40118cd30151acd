package graft.jobs

import org.json4s._
import org.json4s.jackson.JsonMethods

import graft.jobs.Pipeline._

/** JSON config codec for [[Pipeline]] — same shape as the reference's HCL
  * config (`/root/reference/osm/Config.go:17-34`, field names per its hcl
  * tags), loaded with json4s from Spark's classpath. A config-file run is
  * spec'd equivalent to the programmatic run (PipelineSpec).
  *
  * {{{
  * { "inputs":  [ {"uri": "in.osm", "drop_relations": true} ],
  *   "outputs": [ {"uri": "a.osm", "keys_to_keep": ["craft"],
  *                 "ways_to_nodes": true, "drop_version": true,
  *                 "filter": {"dfl": "(@craft like brewery)"}} ] }
  * }}}
  */
object PipelineConfigIO {

  private def fields(jv: JValue): Map[String, JValue] = jv match {
    case JObject(fs) => fs.toMap
    case other => throw new IllegalArgumentException(s"expected object, got $other")
  }

  private def str(m: Map[String, JValue], k: String): Option[String] =
    m.get(k).collect { case JString(s) => s }

  private def bool(m: Map[String, JValue], k: String): Boolean =
    m.get(k).collect { case JBool(b) => b }.getOrElse(false)

  private def strs(m: Map[String, JValue], k: String): Seq[String] =
    m.get(k).collect { case JArray(vs) => vs.collect { case JString(s) => s } }
      .getOrElse(Nil)

  private def num(jv: JValue): Double = jv match {
    case JDouble(d) => d
    case JInt(i) => i.toDouble
    case JDecimal(d) => d.toDouble
    case JLong(l) => l.toDouble
    case other => throw new IllegalArgumentException(s"expected number, got $other")
  }

  /** First non-empty of several field spellings — the documented names are
    * the reference's hcl tags; the codec's original spellings stay accepted
    * so existing configs keep working. */
  private def strsAny(m: Map[String, JValue], ks: String*): Seq[String] =
    ks.iterator.map(strs(m, _)).find(_.nonEmpty).getOrElse(Nil)

  private def filterOf(m: Map[String, JValue]): Option[FilterSpec] =
    m.get("filter").map { jv =>
      val f = fields(jv)
      val bbox = f.get("bbox").collect {
        case JArray(vs) if vs.size == 4 =>
          (num(vs(0)), num(vs(1)), num(vs(2)), num(vs(3)))
      }
      FilterSpec(
        // reference Filter.go tags: keys_keep / keys_drop (the filter's
        // names differ from the projection's keep_keys/drop_keys!)
        keepKeys = strsAny(f, "keys_keep", "keep_keys"),
        dropKeys = strsAny(f, "keys_drop", "drop_keys"),
        bbox = bbox,
        dfl = str(f, "expression").orElse(str(f, "dfl")))
    }

  private def inputOf(jv: JValue): InputSpec = {
    val m = fields(jv)
    InputSpec(
      uri = str(m, "uri").getOrElse(throw new IllegalArgumentException("input needs uri")),
      filter = filterOf(m),
      dropWays = bool(m, "drop_ways"),
      dropRelations = bool(m, "drop_relations"),
      dropVersion = bool(m, "drop_version"),
      dropTimestamp = bool(m, "drop_timestamp"),
      dropChangeset = bool(m, "drop_changeset"),
      dropUserId = bool(m, "drop_user_id"),
      dropUserName = bool(m, "drop_user_name"),
      keysToKeep = strsAny(m, "keep_keys", "keys_to_keep"),
      keysToDrop = strsAny(m, "drop_keys", "keys_to_drop"))
  }

  private def outputOf(jv: JValue): OutputSpec = {
    val m = fields(jv)
    OutputSpec(
      uri = str(m, "uri").getOrElse(throw new IllegalArgumentException("output needs uri")),
      format = str(m, "format"),
      filter = filterOf(m),
      waysToNodes = bool(m, "ways_to_nodes"),
      dropNodes = bool(m, "drop_nodes"),
      dropWays = bool(m, "drop_ways"),
      dropRelations = bool(m, "drop_relations"),
      dropVersion = bool(m, "drop_version"),
      dropTimestamp = bool(m, "drop_timestamp"),
      dropChangeset = bool(m, "drop_changeset"),
      dropUserId = bool(m, "drop_user_id"),
      dropUserName = bool(m, "drop_user_name"),
      keysToKeep = strsAny(m, "keep_keys", "keys_to_keep"),
      keysToDrop = strsAny(m, "drop_keys", "keys_to_drop"),
      snapshotParts = m.get("snapshot_parts").map(jv => num(jv).toInt).getOrElse(0))
  }

  def parse(json: String): PipelineConfig = {
    val m = fields(JsonMethods.parse(json))
    val inputs = m.get("inputs").collect { case JArray(vs) => vs.map(inputOf) }.getOrElse(Nil)
    val outputs = m.get("outputs").collect { case JArray(vs) => vs.map(outputOf) }.getOrElse(Nil)
    PipelineConfig(inputs, outputs)
  }

  // ---- HCL (the reference's native config format) ---------------------------

  /** Filter block with the reference's hcl tags (Filter.go:16-23):
    * `keys_keep`, `keys_drop`, `expression`, `bbox`; `use_cache` is parsed
    * and ignored (the DFL memo cache is obsolete under codegen).
    */
  private def hclFilter(o: Hcl.HObj): Option[FilterSpec] =
    o.one("filter").collect { case f: Hcl.HObj =>
      val bbox = f.nums("bbox") match {
        case Seq(a, b, c, d) => Some((a, b, c, d))
        case _ => None
      }
      FilterSpec(
        keepKeys = f.strs("keys_keep"),
        dropKeys = f.strs("keys_drop"),
        bbox = bbox,
        dfl = f.str("expression").filter(_.nonEmpty))
    }

  private def hclInput(o: Hcl.HObj): InputSpec = InputSpec(
    // InputConfig hcl tags (InputConfig.go:3-18); its drop_nodes exists in
    // the struct but Config.Init never copies it to the input — same here
    uri = o.str("uri").getOrElse(throw new IllegalArgumentException("input needs uri")),
    filter = hclFilter(o),
    dropWays = o.bool("drop_ways"),
    dropRelations = o.bool("drop_relations"),
    dropVersion = o.bool("drop_version"),
    dropTimestamp = o.bool("drop_timestamp"),
    dropChangeset = o.bool("drop_changeset"),
    dropUserId = o.bool("drop_user_id"),
    dropUserName = o.bool("drop_user_name"),
    keysToKeep = o.strs("keep_keys"),
    keysToDrop = o.strs("drop_keys"))

  private def hclOutput(o: Hcl.HObj): OutputSpec = OutputSpec(
    // OutputConfig hcl tags (OutputConfig.go:3-20)
    uri = o.str("uri").getOrElse(throw new IllegalArgumentException("output needs uri")),
    format = o.str("format"), // engine extension; the reference sniffs/flags
    filter = hclFilter(o),
    waysToNodes = o.bool("ways_to_nodes"),
    dropNodes = o.bool("drop_nodes"),
    dropWays = o.bool("drop_ways"),
    dropRelations = o.bool("drop_relations"),
    dropVersion = o.bool("drop_version"),
    dropTimestamp = o.bool("drop_timestamp"),
    dropChangeset = o.bool("drop_changeset"),
    dropUserId = o.bool("drop_user_id"),
    dropUserName = o.bool("drop_user_name"),
    keysToKeep = o.strs("keep_keys"),
    keysToDrop = o.strs("drop_keys"),
    pretty = o.bool("pretty"))

  /** Repeated `inputs { … }` blocks AND the `inputs = [ { … } ]` spelling
    * both accumulate (hcl DecodeObject-into-slice behavior).
    */
  private def hclBlocks(root: Hcl.HObj, key: String): Seq[Hcl.HObj] =
    root.all(key).flatMap {
      case o: Hcl.HObj => Seq(o)
      case Hcl.HList(vs) => vs.collect { case o: Hcl.HObj => o }
      case _ => Nil
    }

  /** Parse the reference's HCL config shape (LoadConfig.go:15-45 decodes
    * into Config.InputConfigs/OutputConfigs).
    */
  def parseHcl(text: String): PipelineConfig = {
    val root = Hcl.parse(text)
    PipelineConfig(
      hclBlocks(root, "inputs").map(hclInput),
      hclBlocks(root, "outputs").map(hclOutput))
  }

  /** Load a config file: `.hcl`/`.tf` (or anything that doesn't open with a
    * JSON object) parses as the reference's HCL; a leading `{` parses as
    * the JSON mirror. (HCL proper treats JSON as a subset; so does this.)
    */
  def load(path: String): PipelineConfig = {
    // explicit UTF-8: the platform default charset can be ASCII in
    // stripped containers, and a config comment with a unicode char
    // would then fail to read
    val src = scala.io.Source.fromFile(path, "UTF-8")
    val text = try src.mkString finally src.close()
    val lower = path.toLowerCase(java.util.Locale.ROOT)
    if (lower.endsWith(".hcl") || lower.endsWith(".tf")) parseHcl(text)
    else if (text.dropWhile(_.isWhitespace).startsWith("{")) parse(text)
    else parseHcl(text)
  }
}
