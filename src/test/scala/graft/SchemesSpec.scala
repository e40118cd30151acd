package graft

import java.net.InetSocketAddress
import java.nio.file.{Files, Paths}

import com.sun.net.httpserver.HttpServer

import graft.geo.OsmFixtures
import graft.io.{OsmXml, UriTemplate}

/** S3 (URI schemes) evidence + X9 (URI template render).
  *
  * Proves — not asserts — what each scheme does in this engine: http(s)
  * and stdin feed the XML compatibility reader exactly like the reference's
  * Input.Open; file:// URIs flow through spark.read; s3a:// fails with the
  * documented missing-connector error because hadoop-aws is not bundled
  * (COVERAGE.md §S3 lists the jars a deployment adds).
  */
class SchemesSpec extends SparkSpecBase {

  private lazy val tmp = Files.createTempDirectory("schemes").toString
  private lazy val planet = OsmFixtures.planet(spark, 50, 10, 2)

  test("http:// input: readPlanet over a local HTTP server equals the file read") {
    val gz = s"$tmp/fixture.osm.gz"
    OsmXml.writePlanet(planet, gz)
    val bytes = Files.readAllBytes(Paths.get(gz))

    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/fixture.osm.gz", exchange => {
      exchange.sendResponseHeaders(200, bytes.length.toLong)
      exchange.getResponseBody.write(bytes)
      exchange.close()
    })
    server.start()
    try {
      val url = s"http://127.0.0.1:${server.getAddress.getPort}/fixture.osm.gz"
      val viaHttp = OsmXml.readPlanet(spark, url)
      val viaFile = OsmXml.readPlanet(spark, gz)
      assert(viaHttp.nodes.collect().toSet === viaFile.nodes.collect().toSet)
      assert(viaHttp.ways.collect().toSet === viaFile.ways.collect().toSet)
      assert(viaHttp.bounds === viaFile.bounds)
    } finally server.stop(0)
  }

  test("stdin input: readPlanet('stdin') consumes System.in") {
    val plain = s"$tmp/fixture.osm"
    OsmXml.writePlanet(planet, plain)
    val orig = System.in
    try {
      System.setIn(new java.io.FileInputStream(plain))
      val viaStdin = OsmXml.readPlanet(spark, "stdin")
      assert(viaStdin.nodes.count() === 50L)
      assert(viaStdin.ways.count() === 10L)
    } finally System.setIn(orig)
  }

  test(".osm.bz2 round-trips identically to the plain file (second codec)") {
    val bz = s"$tmp/fixture.osm.bz2"
    val plainRef = s"$tmp/fixture_codec_ref.osm"
    OsmXml.writePlanet(planet, bz)
    OsmXml.writePlanet(planet, plainRef)
    // really bzip2 on disk: magic bytes BZh
    val head = java.nio.file.Files.readAllBytes(Paths.get(bz)).take(3)
    assert(head.sameElements(Array[Byte]('B', 'Z', 'h')))
    // compare codec-path against plain-path (the writer's %.7f rounding
    // applies to both, so this isolates the codec itself)
    val viaBz = OsmXml.readPlanet(spark, bz)
    val viaPlain = OsmXml.readPlanet(spark, plainRef)
    assert(viaBz.nodes.collect().toSet === viaPlain.nodes.collect().toSet)
    assert(viaBz.ways.collect().toSet === viaPlain.ways.collect().toSet)
    assert(viaBz.relations.collect().toSet === viaPlain.relations.collect().toSet)
  }

  test("file:// URIs and globs flow through spark.read") {
    val dir = s"$tmp/pq"
    planet.nodes.write.mode("overwrite").parquet(dir)
    assert(spark.read.parquet(s"file://$dir").count() === 50L)
    assert(spark.read.parquet(s"file://$tmp/p*").count() === 50L) // glob
  }

  test("s3a:// fails with the documented missing-connector error (sandbox)") {
    val e = intercept[Exception] {
      spark.read.parquet("s3a://graft-nonexistent/data.parquet").count()
    }
    val msg = (e.getMessage + " " + e.getClass.getName).toLowerCase
    // hadoop-aws isn't on the classpath: Hadoop reports the unresolved
    // scheme/class, which is the deployment boundary COVERAGE.md documents
    assert(msg.contains("s3a") || msg.contains("classnotfound") ||
      msg.contains("unsupportedfilesystem"), msg)
  }

  // ---- X9: URI template render -------------------------------------------------

  test("uri template: paths, pipes, and the reference's five helpers") {
    val ctx = Map[String, Any](
      "name" -> "District-Of-Columbia",
      "ext" -> "osm",
      "n" -> 3,
      "bbox" -> Map("minlon" -> -77.12, "maxlon" -> -76.9),
      "tags" -> Map("craft" -> "brewery", "amenity" -> "cafe"))

    assert(UriTemplate.render("{{.name}}.{{.ext}}", ctx) === "District-Of-Columbia.osm")
    assert(UriTemplate.render("{{ .name | lower }}", ctx) === "district-of-columbia")
    assert(UriTemplate.render("{{ .name | lower | upper }}", ctx) === "DISTRICT-OF-COLUMBIA")
    assert(UriTemplate.render("""{{ replace "-" "_" .name }}""", ctx) === "District_Of_Columbia")
    assert(UriTemplate.render("""{{ .name | replace "-" "_" }}""", ctx) === "District_Of_Columbia")
    assert(UriTemplate.render("{{ float64 .n }}", ctx) === "3.000000")
    // json: sorted map keys, Go json.Marshal parity
    assert(UriTemplate.render("{{ json .tags }}", ctx) ===
      """{"amenity":"cafe","craft":"brewery"}""")
    // nested path lookup
    assert(UriTemplate.render("{{ .bbox.minlon }}", ctx) === "-77.12")
    // literal text around actions is preserved verbatim
    assert(UriTemplate.render("s3://bucket/{{ .name | lower }}/{{.ext}}", ctx) ===
      "s3://bucket/district-of-columbia/osm")
  }

  test("uri template: unknown keys and functions fail fast") {
    intercept[NoSuchElementException](UriTemplate.render("{{ .missing }}", Map.empty))
    intercept[IllegalArgumentException](
      UriTemplate.render("{{ frobnicate .x }}", Map[String, Any]("x" -> "1")))
  }

  test("uri template: literal-only actions and the whole-context dot render") {
    // Go's text/template renders bare literals; these used to be routed
    // to applyFn as function names and throw
    val ctx = Map[String, Any]("a" -> 1, "b" -> "two")
    assert(UriTemplate.render("""{{ "v1" }}/data""", ctx) === "v1/data")
    assert(UriTemplate.render("{{ 5 }}", ctx) === "5")
    assert(UriTemplate.render("{{ -2.5 | float64 }}", ctx) === "-2.500000")
    assert(UriTemplate.render("""{{ "Mixed-Case" | lower }}""", ctx) === "mixed-case")
    // {{ . }} is the whole context; json-piping it is the useful form
    assert(UriTemplate.render("{{ . | json }}", ctx) === """{"a":1,"b":"two"}""")
  }
}
