package graft

import graft.io.OsmXml

/** Failure-envelope fuzz for the OSM XML codec: malformed planet files
  * must fail with a diagnosable exception — StAX's located
  * XMLStreamException, or the value-conversion errors
  * (NumberFormat/DateTimeParse) for well-formed XML carrying junk
  * values — never an NPE, StackOverflowError, or MatchError. Deep
  * nesting is safe by construction (StAX is iterative) and pinned here.
  */
class OsmXmlFuzzSpec extends SparkSpecBase {

  private val dir = java.nio.file.Files.createTempDirectory("osmfuzz")

  private def tryRead(content: String, name: String): Unit = {
    val p = dir.resolve(name)
    java.nio.file.Files.writeString(p, content)
    try { OsmXml.readPlanet(spark, p.toString); () }
    catch {
      case _: javax.xml.stream.XMLStreamException => ()
      case _: NumberFormatException => ()
      case _: java.time.format.DateTimeParseException => ()
      case e: IllegalArgumentException =>
        assert(e.getMessage != null, s"$name: empty message")
      case e: Throwable =>
        fail(s"$name threw ${e.getClass.getName}: ${e.getMessage}")
    }
  }

  private val valid =
    "<?xml version='1.0'?><osm version=\"0.6\">" +
      "<node id=\"1\" lon=\"1.5\" lat=\"2.5\" version=\"1\" " +
      "timestamp=\"2024-01-01T00:00:00Z\" uid=\"7\" user=\"m\">" +
      "<tag k=\"a\" v=\"b\"/></node>" +
      "<way id=\"2\"><nd ref=\"1\"/></way></osm>"

  test("valid baseline parses") {
    val p = dir.resolve("ok.osm")
    java.nio.file.Files.writeString(p, valid)
    val planet = OsmXml.readPlanet(spark, p.toString)
    assert(planet.nodes.count() === 1L)
  }

  test("random character soup fails diagnosably") {
    val rnd = new scala.util.Random(19)
    val chars = "<>/=\"' abcxml?!&;#10"
    (0 until 120).foreach { i =>
      val n = 1 + rnd.nextInt(80)
      tryRead(Seq.fill(n)(chars.charAt(rnd.nextInt(chars.length))).mkString, s"soup$i.osm")
    }
  }

  test("single-char mutations of a valid planet fail diagnosably or parse") {
    val rnd = new scala.util.Random(23)
    val mutChars = "<>/=\"x&"
    (0 until valid.length).foreach { pos =>
      tryRead(valid.updated(pos, mutChars.charAt(rnd.nextInt(mutChars.length))),
        s"mut$pos.osm")
    }
  }

  test("truncations at every prefix fail diagnosably or parse") {
    (0 to valid.length).foreach(n => tryRead(valid.take(n), s"trunc$n.osm"))
  }

  test("the change codec shares the failure envelope (junk .osc)") {
    val validOsc =
      "<?xml version='1.0'?><osmChange version=\"0.6\">" +
        "<create><node id=\"9\" lon=\"1\" lat=\"2\" version=\"1\"/></create>" +
        "<delete><node id=\"1\" version=\"2\"/></delete></osmChange>"
    def tryChange(content: String, name: String): Unit = {
      val p = dir.resolve(name)
      java.nio.file.Files.writeString(p, content)
      try { graft.io.OsmChange.read(spark, p.toString); () }
      catch {
        case _: javax.xml.stream.XMLStreamException => ()
        case _: NumberFormatException => ()
        case _: java.time.format.DateTimeParseException => ()
        case e: IllegalArgumentException => assert(e.getMessage != null)
        case e: Throwable =>
          fail(s"$name threw ${e.getClass.getName}: ${e.getMessage}")
      }
    }
    tryChange(validOsc, "ok.osc") // baseline must not throw at all
    val rnd = new scala.util.Random(29)
    val mutChars = "<>/=\"x&"
    (0 until validOsc.length).foreach { pos =>
      tryChange(validOsc.updated(pos, mutChars.charAt(rnd.nextInt(mutChars.length))),
        s"oscmut$pos.osc")
    }
    (0 to validOsc.length by 7).foreach(n => tryChange(validOsc.take(n), s"osctr$n.osc"))
  }

  test("deep unknown-element nesting is iterative-safe") {
    tryRead("<?xml version='1.0'?><osm>" + "<g>" * 5000 + "</g>" * 5000 + "</osm>",
      "deep.osm")
  }
}
