package graft

import graft.jobs.Hcl

/** Fuzz the HCL config parser (user-authored `-config_uri` files): junk
  * must reject via IllegalArgumentException with a line-numbered message —
  * never a StackOverflow, NPE, MatchError, or infinite loop.
  */
class HclFuzzSpec extends SparkSpecBase {

  private def tryParse(s: String): Unit =
    try { Hcl.parse(s); () }
    catch {
      case e: IllegalArgumentException =>
        assert(e.getMessage != null && e.getMessage.nonEmpty,
          s"empty message for <${s.take(60)}>")
      case e: Throwable =>
        fail(s"<${s.take(80)}> threw ${e.getClass.getName}: ${e.getMessage}")
    }

  test("random character soup never escapes IllegalArgumentException") {
    val rnd = new scala.util.Random(13)
    val chars = "{}[]=\",\nab1#/*\\$ "
    (0 until 800).foreach { _ =>
      val n = 1 + rnd.nextInt(60)
      tryParse(Seq.fill(n)(chars.charAt(rnd.nextInt(chars.length))).mkString)
    }
  }

  test("single-char mutations of a valid config stay well-behaved") {
    val valid =
      "ways_to_nodes = true\n" +
        "filter { dfl = \"@craft like brewery\" }\n" +
        "output \"a\" { uri = \"x.osm\" pretty = true }\n"
    assert(Hcl.parse(valid) != null)
    val rnd = new scala.util.Random(17)
    val mutChars = "{}[]=\"\n#\\"
    (0 until valid.length).foreach { pos =>
      val c = mutChars.charAt(rnd.nextInt(mutChars.length))
      tryParse(valid.updated(pos, c))
    }
  }

  test("pathological nesting terminates without stack overflow") {
    tryParse("a = " + "[" * 3000 + "1" + "]" * 3000)
    tryParse("b " + "{ c " * 3000 + "= 1" + " }" * 3000)
    tryParse("[" * 5000) // unbalanced
  }
}
