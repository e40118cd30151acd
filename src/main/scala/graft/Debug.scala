package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch diagnostics main (not part of the library surface). */
object Debug {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val df = Seq(("abc", "x the y the z a")).toDF("s", "t")
    df.select(
      size(split(col("s"), "")).as("split_empty_size"),
      ascii(lit("")).as("ascii_empty"),
      ascii(substring(lit("ab"), 5, 1)).as("ascii_oob"),
      rpad(lit("ab"), 5, "q").as("rpad"),
      text.TextOps.fingerprintRolling(col("s")).as("rolling_abc"), // duck: 96354
      text.TextOps.markerCount(col("t"), " the ").as("marker2"),
      size(regexp_extract_all(lit("ab c1 d_e"), lit("[A-Za-z0-9_]+"), lit(0))).as("tok3"),
      length(regexp_replace(lit("ab c1 d_e"), "[^A-Za-z]", "")).as("alpha5")
    ).show(false)

    // positional fingerprint for 'abc': duck expects 1380
    text.TextOps.fingerprintPositional(df.select(lit(1L).as("doc_id"), col("s").as("text")), "doc_id", "text").show(false)

    // quantize round parity probe
    spark.createDataFrame(Seq((1L, Seq(0.1234567f, -0.9876543f, 2.5004997f))))
      .toDF("id", "emb")
      .select(ann.Ann.quantize(col("emb"))).show(false)
    spark.stop()
  }
}
