package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines:
  * token counting, quality signals, language-ID scoring, and document
  * fingerprinting. All builtin-composed (codegen'd, no UDFs); every
  * function has an exact cross-engine semantic so results are
  * oracle-checkable.
  */
object TextOps {

  val FingerprintP = 1000000007L

  /** Token count: maximal runs of [A-Za-z0-9_]. */
  def tokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[A-Za-z0-9_]+"), lit(0)))

  /** GPT-2-style pre-tokenizer segment count ("BPE-ish"): a token is an
    * optional leading space plus a letter run, digit run, or punctuation
    * run. ASCII classes and no lookarounds keep Java-regex (Spark) and RE2
    * (DuckDB) leftmost-first semantics identical, so the count is
    * oracle-exact.
    */
  val BpePattern: String = " ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9 ]+"

  def bpeTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit(BpePattern), lit(0)))

  /** Whitespace token count — the trivial tokenizer of the pair. */
  def wsTokenCount(text: Column): Column =
    size(filter(split(text, " "), t => length(t) > 0))

  /** Count of alphabetic characters. */
  def alphaCount(text: Column): Column =
    length(regexp_replace(text, "[^A-Za-z]", ""))

  /** Number of (possibly overlapping-free) occurrences of a literal marker. */
  def markerCount(text: Column, marker: String): Column =
    (length(text) - length(replace(text, lit(marker), lit("")))) / lit(marker.length)

  /** Count of sentence-punctuation characters. Explicit character class —
    * identical semantics in Java regex and DuckDB's RE2.
    */
  def punctCount(text: Column): Column =
    length(text) - length(regexp_replace(text, "[.,;:!?]", ""))

  /** Summed occurrence count of space-delimited stopwords (the stopword-
    * ratio numerator of the quality suite; list is pluggable).
    */
  def stopwordCount(text: Column, stops: Seq[String]): Column =
    stops.map(w => markerCount(text, s" $w ")).reduce(_ + _)

  /** Language-ID by marker scoring: per language, the summed occurrence
    * count of its marker strings; prediction = argmax with deterministic
    * first-wins tie-break (languages in the given order). The marker sets
    * are pluggable — this is the n-gram-heuristic shell, not a model.
    */
  def langScores(text: Column, markers: Seq[(String, Seq[String])]): Seq[(String, Column)] =
    markers.map { case (lang, ms) =>
      lang -> ms.map(m => markerCount(text, m)).reduce(_ + _)
    }

  def langPredict(scores: Seq[(String, Column)]): Column = {
    // argmax, first language wins ties: fold right building CASE chain
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    // foldRight puts earlier languages first in the when-chain → first wins ties
    scores.foldRight(lit("und"): Column) { case ((lang, s), acc) =>
      when(s === best, lit(lang)).otherwise(acc)
    }
  }

  /** Quality score: floor(100 * alpha_ratio) + length-band bonus —
    * a deterministic stand-in for heuristic quality classifiers.
    */
  def qualityScore(text: Column, nChars: Column): Column =
    // nullif: an empty document must score NULL on both engines — a bare
    // /0 THROWS under Spark ANSI but returns NULL in DuckDB
    floor(lit(100.0) * alphaCount(text) / nullif(nChars, lit(0))).cast("long") +
      when(nChars.between(100, 400), lit(50L)).otherwise(lit(0L))

  /** Order-sensitive rolling (polynomial) fingerprint:
    * fold over characters of `(acc * 31 + ascii(c)) % p` — the codegen'd
    * [[graft.expr.RollingFingerprintExpr]], one walk over the UTF8 bytes.
    * (The previous `aggregate(split(text, ""), ...)` form allocated a
    * single-character string PER CHARACTER and, like every higher-order
    * function, ran interpreted; equality incl. unicode is spec-pinned.)
    */
  def fingerprintRolling(text: Column): Column = {
    import org.apache.spark.sql.graftbridge.Bridge.{column => toCol, expression => toExpr}
    toCol(graft.expr.RollingFingerprintExpr(toExpr(text), FingerprintP))
  }

  /** Commutative position-weighted fingerprint: Σ ascii(c_i)·i² mod p.
    * Aggregation-friendly (computable via explode + SUM on both engines).
    */
  def fingerprintPositional(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    // per-term arithmetic in LONG with a mod before the ascii multiply:
    // the old int (i+1)²·ascii overflowed (ANSI: throws) past ~4k chars,
    // while the DuckDB oracle sums exactly in HUGEINT. (i² mod p)·ascii
    // ≤ p·127 ≈ 1.3e11 and the partial SUM stays below p·len — identical
    // to the oracle's Σ ascii·i² mod p because mod distributes over both.
    val i = col("i0").cast("long") + 1
    df.select(col(idCol), posexplode(split(col(textCol), "")).as(Seq("i0", "c")))
      .select(col(idCol),
        pmod(pmod(i * i, lit(FingerprintP)) * ascii(col("c")), lit(FingerprintP)).as("w"))
      .groupBy(col(idCol))
      .agg((sum(col("w")) % lit(FingerprintP)).as("fingerprint"))
  }
}
