package graft

import org.apache.spark.sql.functions._
import graft.text.TextOps

/** Text-analysis operators on hand-computable inputs. */
class TextOpsSpec extends SparkSpecBase {

  import spark.implicits._

  private lazy val df = Seq(
    (1L, "the cat sat on the mat"),
    (2L, "Zahlen 123 und der Hund!"),
    (3L, "aaaa")).toDF("doc_id", "text")

  test("token and alpha counts") {
    val r = df.select(col("doc_id"), TextOps.tokenCount(col("text")).as("t"),
      TextOps.alphaCount(col("text")).as("a"))
      .collect().map(x => x.getLong(0) -> (x.getInt(1), x.getInt(2))).toMap
    assert(r(1L) === ((6, 17)))
    assert(r(2L) === ((5, 16))) // Zahlen+und+der+Hund = 16 letters, 5 tokens
    assert(r(3L) === ((1, 4)))
  }

  test("marker counting and language argmax (first-wins ties)") {
    val scores = TextOps.langScores(col("text"), Seq(
      "en" -> Seq(" the "), "de" -> Seq(" und ", " der ")))
    val r = df.select(col("doc_id"), TextOps.langPredict(scores).as("p"))
      .collect().map(x => x.getLong(0) -> x.getString(1)).toMap
    assert(r(1L) === "en") // one " the "
    assert(r(2L) === "de") // und + der = 2
    assert(r(3L) === "en") // all-zero tie -> first language
  }

  test("punctuation and stopword counts match hand counts") {
    import spark.implicits._
    val df = Seq((1L, "the cat, the hat! is a of and: the end."))
      .toDF("doc_id", "text")
    val r = df.select(
      TextOps.punctCount(col("text")).as("p"),
      TextOps.stopwordCount(col("text"), Seq("the", "a", "of", "is")).as("st"))
      .collect()(0)
    assert(r.getInt(0) === 4) // , ! : .
    // space-delimited markers: " the " x2 (", the hat", ": the end"),
    // " a " x1, " of " x1, " is " x1; the leading bare "the" doesn't count
    assert(r.getDouble(1) === 5.0)
  }

  test("rolling fingerprint matches a hand fold") {
    val got = df.filter(col("doc_id") === 3L)
      .select(TextOps.fingerprintRolling(col("text"))).collect()(0).getLong(0)
    val expected = "aaaa".foldLeft(0L)((acc, c) => (acc * 31 + c.toLong) % 1000000007L)
    assert(got === expected)
  }

  test("positional fingerprint matches a hand sum") {
    val got = TextOps.fingerprintPositional(df.filter(col("doc_id") === 3L), "doc_id", "text")
      .collect()(0).getLong(1)
    val expected = (1 to 4).map(i => i.toLong * i * 'a'.toLong).sum % 1000000007L
    assert(got === expected)
  }

  test("degenerate docs: empty text and token-less text don't throw under ANSI") {
    import spark.implicits._
    // empty text (length 0) and pure punctuation (tokenCount 0): the ratio
    // denominators must go NULL (like DuckDB's /0), never DIVIDE_BY_ZERO
    val deg = Seq((1L, ""), (2L, "!!! ???")).toDF("doc_id", "text")
    val q = deg.select(col("doc_id"),
      TextOps.qualityScore(col("text"), length(col("text"))).as("q"),
      (TextOps.stopwordCount(col("text"), Seq("the", "and")) /
        org.apache.spark.sql.functions.nullif(
          TextOps.tokenCount(col("text")), lit(0L))).as("sr"))
      .collect().map(r => r.getLong(0) -> (r.isNullAt(1), r.isNullAt(2))).toMap
    assert(q(1L) === ((true, true)))  // len 0 -> NULL quality, NULL stop_ratio
    assert(q(2L)._2 === true)         // 0 tokens -> NULL stop_ratio
  }

  test("positional fingerprint survives multi-KB documents (int overflow guard)") {
    import spark.implicits._
    // 8000 chars of 'z': the old 32-bit (i+1)^2*ascii weight overflowed past
    // ~4.1k chars (ANSI throws). Expected value mirrors the DuckDB oracle's
    // exact HUGEINT sum, reduced mod p.
    val big = Seq((9L, "z" * 8000)).toDF("doc_id", "text")
    val got = TextOps.fingerprintPositional(big, "doc_id", "text")
      .collect()(0).getLong(1)
    val p = 1000000007L
    val expected = (1 to 8000).map(i =>
      BigInt(i) * i * 'z'.toInt).sum.mod(BigInt(p)).toLong
    assert(got === expected)
  }

  test("quality score: alpha ratio + length band") {
    val q = df.select(col("doc_id"),
      TextOps.qualityScore(col("text"), length(col("text"))).as("q"))
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    // doc 3: 4/4 alpha -> 100, length 4 outside [100,400] -> no bonus
    assert(q(3L) === 100L)
    assert(q(1L) === (100L * 17 / 22)) // floor(77.27) = 77
  }

  test("BPE-ish pre-tokenizer and whitespace token counts (hand counts)") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val df = Seq(
      (1L, "hello world"),       // [hello][ world] = 2 bpe; 2 ws
      (2L, "it's 42 degrees!"),  // [it]['][s][ 42][ degrees][!] = 6 bpe; 3 ws
      (3L, "a  b"),              // double space: [a][ b] = 2 bpe; 2 ws
      (4L, "x123y,z")            // [x][123][y][,][z] = 5 bpe; 1 ws
    ).toDF("id", "text")
    val got = df.select(col("id"),
        graft.text.TextOps.bpeTokenCount(col("text")).as("b"),
        graft.text.TextOps.wsTokenCount(col("text")).as("w"))
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2))).toMap
    assert(got(1L) === ((2, 2)))
    assert(got(2L) === ((6, 3)))
    assert(got(3L) === ((2, 2)))
    assert(got(4L) === ((5, 1)))
  }
}
