package graft.io

/** Minimal INI reader for GDAL OSM driver configs — the reference's
  * `LoadIniSection` (`/root/reference/osm/LoadIniSection.go:8-27`) via
  * gopkg.in/ini.v1: `[section]` headers, `key=value` assignments, `#`/`;`
  * comment lines (GDAL's osmconf.ini uses `#`). Keys before any header
  * live in the default ("") section.
  */
object IniFile {

  /** All key→value pairs of one section (empty map if absent). */
  def loadSection(path: String, section: String): Map[String, String] = {
    // explicit UTF-8: the platform default charset can be ASCII in
    // stripped containers, and a config comment with a unicode char
    // would then fail to read
    val src = scala.io.Source.fromFile(path, "UTF-8")
    try parseSection(src.getLines(), section) finally src.close()
  }

  private[graft] def parseSection(lines: Iterator[String], section: String): Map[String, String] = {
    val out = Map.newBuilder[String, String]
    var cur = ""
    lines.foreach { raw =>
      val line = raw.trim
      if (line.nonEmpty && !line.startsWith("#") && !line.startsWith(";")) {
        if (line.startsWith("[") && line.endsWith("]"))
          cur = line.substring(1, line.length - 1).trim
        else if (cur == section) line.indexOf('=') match {
          case -1 =>
          case i => out += (line.take(i).trim -> line.drop(i + 1).trim)
        }
      }
    }
    out.result()
  }

  /** The reference's ParseBool (`/root/reference/osm/ParseBool.go:3-5`):
    * "yes"/"true"/"y"/"1"/"t" are true, everything else (incl. empty) false.
    */
  def parseBool(v: String): Boolean =
    v == "yes" || v == "true" || v == "y" || v == "1" || v == "t"
}
