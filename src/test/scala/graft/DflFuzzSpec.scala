package graft

import graft.dfl.Dfl
import org.apache.spark.sql.functions.col

/** Parser fuzz: the DFL surface is user-typed CLI input (`-dfl '...'`);
  * junk must produce IllegalArgumentException with a message — never a
  * StackOverflow, NPE, or MatchError — and near-miss mutations of a valid
  * expression must either compile or reject the same way.
  */
class DflFuzzSpec extends SparkSpecBase {

  private def tryCompile(s: String): Unit =
    try { Dfl.compile(s, col); () }
    catch {
      case e: IllegalArgumentException =>
        assert(e.getMessage != null && e.getMessage.nonEmpty, s"empty message for <$s>")
      case e: Throwable =>
        fail(s"<$s> threw ${e.getClass.getName}: ${e.getMessage}")
    }

  test("random token soup never escapes IllegalArgumentException") {
    val rnd = new scala.util.Random(7)
    val toks = Array("@craft", "like", "'brewery'", "(", ")", "and", "or",
      "not", "in", "==", "!=", "<", ">", "+", "42", "3.5", "len(", ",",
      "@a", "'x", "null", "true", "[", "]", "~", "%%", "\"", "\\")
    (0 until 500).foreach { _ =>
      val n = 1 + rnd.nextInt(12)
      tryCompile(Seq.fill(n)(toks(rnd.nextInt(toks.length))).mkString(" "))
    }
  }

  test("single-char mutations of a valid expression stay well-behaved") {
    val valid = "(@craft like brewery) and (len(@name) > 3 or @status in [a, b])"
    assert(Dfl.compile(valid, col) != null)
    val rnd = new scala.util.Random(11)
    (0 until valid.length).foreach { pos =>
      val c = "()@'\"[]<>!&| ".charAt(rnd.nextInt(13))
      tryCompile(valid.updated(pos, c))
    }
  }

  test("pathological nesting terminates (no stack overflow)") {
    val deep = "(" * 2000 + "@a == 1" + ")" * 2000
    tryCompile(deep)
    tryCompile("(" * 5000 + "@a") // unbalanced
    // function-argument recursion is a separate parser path from parens —
    // it must be depth-bounded too (found unguarded by review)
    tryCompile("len(" * 5000 + "@a" + ")" * 5000 + " > 1")
    tryCompile("not " * 5000 + "@a == 1")
  }
}
