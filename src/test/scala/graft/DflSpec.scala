package graft

import org.apache.spark.sql.functions._
import graft.dfl.Dfl

/** DFL parser + compiler vs expected row sets — reference semantics
  * (`@craft like brewery`, /root/reference/README.md:105).
  */
class DflSpec extends SparkSpecBase {

  import spark.implicits._

  private lazy val df = Seq(
    (1L, Map("craft" -> "brewery", "name" -> "a"), 10.0),
    (2L, Map("craft" -> "distillery"), 30.0),
    (3L, Map("shop" -> "bakery"), 50.0),
    (4L, Map("craft" -> "brewery", "active" -> "yes"), 70.0),
    (5L, Map[String, String](), 90.0)
  ).toDF("id", "tags", "qty")

  private def run(dfl: String): Set[Long] =
    df.filter(Dfl.compile(dfl, {
      case "qty" => col("qty")
      case k => element_at(col("tags"), k)
    })).select("id").collect().map(_.getLong(0)).toSet

  test("like without wildcard is equality (go-dfl bareword semantics)") {
    assert(run("@craft like brewery") === Set(1L, 4L))
  }

  test("like with wildcard is SQL LIKE") {
    assert(run("@craft like '%ery'") === Set(1L, 2L, 4L))
  }

  test("function map: len/lower/upper/trim/abs as operands") {
    assert(run("len(@craft) > 7") === Set(2L))              // distillery only
    assert(run("len(@craft) >= 7") === Set(1L, 2L, 4L))     // missing tag -> false
    assert(run("upper(@craft) like BREWERY") === Set(1L, 4L))
    assert(run("lower(@craft) == trim(' brewery ')") === Set(1L, 4L))
    assert(run("@craft == trim('brewery')") === Set(1L, 4L))
    assert(run("abs(@qty) >= 50") === Set(3L, 4L, 5L))
  }

  test("boolean functions prefix/suffix stand alone and negate two-valued") {
    assert(run("prefix(@craft, brew)") === Set(1L, 4L))
    assert(run("suffix(@craft, ery)") === Set(1L, 2L, 4L))
    // missing attribute: prefix() is FALSE, not(prefix()) is TRUE
    assert(run("not prefix(@craft, brew)") === Set(2L, 3L, 5L))
    assert(run("prefix(@craft, brew) and @qty > 50") === Set(4L))
  }

  test("function attributes feed projection pushdown") {
    assert(Dfl.attributes("prefix(@craft, x) and len(@name) > 1")
      === Seq("craft", "name"))
  }

  test("unknown functions and bad arity fail fast") {
    intercept[IllegalArgumentException](run("frob(@craft) == 1"))
    intercept[IllegalArgumentException](run("len(@craft, @name) > 1"))
    intercept[IllegalArgumentException](run("len(@craft)")) // non-boolean alone
  }

  test("and / or / not / parens") {
    assert(run("(@craft like brewery) and (@qty > 50)") === Set(4L))
    assert(run("(@craft like brewery) or (@shop like bakery)") === Set(1L, 3L, 4L))
    assert(run("not (@craft like brewery) and @qty < 60") === Set(2L, 3L))
  }

  test("in list") {
    assert(run("@craft in [brewery, distillery]") === Set(1L, 2L, 4L))
  }

  test("comparisons and equality operators") {
    assert(run("@qty >= 50") === Set(3L, 4L, 5L))
    assert(run("@qty == 30") === Set(2L))
    assert(run("@qty != 30 and @qty <= 70") === Set(1L, 3L, 4L))
  }

  test("missing attribute -> comparison is null -> row dropped") {
    assert(run("@missing like x") === Set())
    assert(run("@active == yes") === Set(4L))
  }

  test("attributes() extraction for projection pushdown") {
    assert(Dfl.attributes("(@craft like brewery) and (@qty > 5 or not @x in [1, 2])")
      === Seq("craft", "qty", "x"))
  }

  test("parse errors are rejected") {
    intercept[IllegalArgumentException](Dfl.parse("@a like"))
    intercept[IllegalArgumentException](Dfl.parse("(@a like b"))
    intercept[IllegalArgumentException](Dfl.parse("@a like b extra tokens"))
  }

  test("extended function map: trim variants, numeric funcs, min/max") {
    assert(run("ltrim('  brewery') == @craft") === Set(1L, 4L))
    assert(run("rtrim('brewery  ') == @craft") === Set(1L, 4L))
    assert(run("ceil(@qty) == 10") === Set(1L))
    assert(run("floor(@qty) == 90") === Set(5L))
    assert(run("round(@qty) >= 70") === Set(4L, 5L))
    assert(run("min(@qty, 50) == 50") === Set(3L, 4L, 5L))   // qty >= 50
    assert(run("max(@qty, 30) == 30") === Set(1L, 2L))       // qty <= 30
    assert(run("min(@qty) == 10") === Set(1L))
  }

  test("replace and split; in over array-valued right side") {
    assert(run("replace(@craft, 'distillery', 'brewery') like brewery") === Set(1L, 2L, 4L))
    // plain-string semantics: '$' in the replacement is literal, never a
    // Matcher group reference
    assert(run("replace(@craft, 'brewery', '$1x') like '$1x'") === Set(1L, 4L))
    // multi-value tag semantics: `x in split(@tag, ';')`
    val multi = Seq(
      (1L, Map("cuisine" -> "pizza;kebab"), 0.0),
      (2L, Map("cuisine" -> "sushi"), 0.0),
      (3L, Map[String, String](), 0.0)
    ).toDF("id", "tags", "qty")
    val got = multi.filter(Dfl.compile("kebab in split(@cuisine, ';')",
      k => element_at(col("tags"), k))).select("id").collect().map(_.getLong(0)).toSet
    assert(got === Set(1L))
    // separator is treated literally, not as a regex
    val dotted = Seq((1L, Map("a" -> "x.y"), 0.0), (2L, Map("a" -> "xzy"), 0.0))
      .toDF("id", "tags", "qty")
    val gotDot = dotted.filter(Dfl.compile("x in split(@a, '.')",
      k => element_at(col("tags"), k))).select("id").collect().map(_.getLong(0)).toSet
    assert(gotDot === Set(1L))
  }

  test("quote handling: doubled-quote escape; mid-word quote is an error; like needs a literal") {
    val odf = Seq((1L, Map("name" -> "O'Brien"), 0.0), (2L, Map("name" -> "Smith"), 0.0))
      .toDF("id", "tags", "qty")
    val got = odf.filter(Dfl.compile("@name like 'O''Brien'",
      k => element_at(col("tags"), k))).select("id").collect().map(_.getLong(0)).toSet
    assert(got === Set(1L))
    // a quote mid-bareword is a parse error, not a silently-unmatchable token
    intercept[IllegalArgumentException](run("@craft like it's"))
    // like with a non-literal right side gets a descriptive error, not a MatchError
    val e = intercept[IllegalArgumentException](run("@craft like @qty"))
    assert(e.getMessage.contains("literal"))
  }

  test("long-tail string functions: substr/contains") {
    assert(run("substr(@craft, 1, 4) == brew") === Set(1L, 4L))
    assert(run("contains(@craft, rew)") === Set(1L, 4L))
    assert(run("contains(@craft, ery)") === Set(1L, 2L, 4L))
    // missing attribute: contains() is null -> FALSE, negation is TRUE
    assert(run("not contains(@craft, rew)") === Set(2L, 3L, 5L))
  }

  test("long-tail math functions: pow/sqrt/mod") {
    assert(run("pow(@qty, 2) >= 2500") === Set(3L, 4L, 5L))   // qty >= 50
    assert(run("sqrt(@qty) > 7") === Set(3L, 4L, 5L))
    assert(run("mod(@qty, 40) == 10") === Set(1L, 3L, 5L))    // 10, 50, 90
  }

  test("long-tail array functions: first/last/join over split") {
    // brewery -> [br, w, ry]; distillery -> [dist, ill, ry]; bakery n/a
    assert(run("first(split(@craft, 'e')) == br") === Set(1L, 4L))
    assert(run("last(split(@craft, 'e')) == ry") === Set(1L, 2L, 4L))
    assert(run("join(split(@craft, 'e'), '-') == 'br-w-ry'") === Set(1L, 4L))
  }
}
