package graft.io

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import java.nio.charset.StandardCharsets

/** Parquet-backed snapshot/manifest table — the "Iceberg-like" layer
  * (SURVEY.md §7.1.8; no Iceberg runtime jar exists in this environment).
  *
  * Layout under `root/`:
  * {{{
  *   data/<partCol>=<key>/part-….parquet  partitioned data files
  *   manifests/<key>.json                 per-partition manifest:
  *                                        {key, rows, operator, upstream}
  *   snapshots/s<NNNN>.json               snapshot: parent + partition list
  *                                        + row-count metrics + lineage
  *   CURRENT                              current snapshot id (atomic rename)
  * }}}
  *
  * Resume semantics (north rule G9): a partition is COMMITTED iff its
  * manifest exists. [[commit]] diffs the incoming partition set against
  * committed manifests and (re)writes only the missing ones — a killed run
  * leaves data dirs without manifests, which the rerun overwrites via
  * dynamic partition overwrite. Deterministic upstream pipelines therefore
  * produce byte-identical committed tables after any number of crashes.
  */
object SnapshotTable {

  case class CommitReport(snapshotId: String, written: Seq[String],
                          skipped: Seq[String], totalRows: Long)

  private def fs(spark: SparkSession, p: Path): FileSystem =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def writeFile(spark: SparkSession, p: Path, content: String): Unit = {
    val f = fs(spark, p)
    f.mkdirs(p.getParent)
    val tmp = new Path(p.getParent, s".${p.getName}.tmp")
    val out = f.create(tmp, true)
    out.write(content.getBytes(StandardCharsets.UTF_8))
    out.close()
    if (f.exists(p)) f.delete(p, false)
    if (!f.rename(tmp, p)) throw new java.io.IOException(s"commit rename failed: $p")
  }

  private def readFile(spark: SparkSession, p: Path): Option[String] = {
    val f = fs(spark, p)
    if (!f.exists(p)) None
    else {
      val in = f.open(p)
      try Some(new String(in.readAllBytes(), StandardCharsets.UTF_8))
      finally in.close()
    }
  }

  private def esc(s: String): String =
    s.flatMap { case '"' => "\\\""; case '\\' => "\\\\"; case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString }

  /** Commit `df` into the table, partitioned by `partCol` (string-keyed).
    * Only partitions without a manifest are written. Returns metrics.
    *
    * @param operator lineage tag for the producing operator chain
    * @param upstream upstream snapshot ids / source URIs (lineage)
    */
  def commit(df: DataFrame, root: String, partCol: String,
             operator: String, upstream: Seq[String] = Nil): CommitReport = {
    val spark = df.sparkSession
    val rootP = new Path(root)
    val f = fs(spark, rootP)

    // 1. incoming partition inventory (one agg job; drives resume + metrics)
    val counts: Map[String, Long] = df
      .groupBy(col(partCol).cast("string").as("k")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

    // 2. committed = manifests present
    val manDir = new Path(rootP, "manifests")
    val committed: Set[String] =
      if (!f.exists(manDir)) Set.empty
      else f.listStatus(manDir).map(_.getPath.getName).filter(_.endsWith(".json"))
        .map(_.stripSuffix(".json")).toSet

    val missing = counts.keySet.diff(committed).toSeq.sorted
    val skipped = counts.keySet.intersect(committed).toSeq.sorted

    // 3. write only missing partitions; dynamic overwrite cleans any
    //    half-written dirs from a killed previous run
    if (missing.nonEmpty) {
      df.filter(col(partCol).cast("string").isin(missing: _*))
        .write
        .option("partitionOverwriteMode", "dynamic")
        .mode("overwrite")
        .partitionBy(partCol)
        .parquet(new Path(rootP, "data").toString)
      // 4. per-partition manifests (commit markers with metrics + lineage)
      missing.foreach { k =>
        val m = s"""{"key": "${esc(k)}", "rows": ${counts(k)}, "operator": "${esc(operator)}", "upstream": [${upstream.map(u => "\"" + esc(u) + "\"").mkString(", ")}]}"""
        writeFile(spark, new Path(manDir, s"$k.json"), m)
      }
    }

    // 5. snapshot: parent chain + full partition inventory
    val parent = currentSnapshotId(spark, root)
    val snapId = f"s${parent.map(_.drop(1).toInt + 1).getOrElse(0)}%04d"
    val partsJson = counts.toSeq.sortBy(_._1)
      .map { case (k, n) => s"""{"key": "${esc(k)}", "rows": $n}""" }.mkString(", ")
    val snap =
      s"""{"id": "$snapId", "parent": ${parent.map("\"" + _ + "\"").getOrElse("null")},
         | "operator": "${esc(operator)}", "upstream": [${upstream.map(u => "\"" + esc(u) + "\"").mkString(", ")}],
         | "total_rows": ${counts.values.sum}, "partitions": [$partsJson]}""".stripMargin
    writeFile(spark, new Path(rootP, s"snapshots/$snapId.json"), snap)
    writeFile(spark, new Path(rootP, "CURRENT"), snapId)

    CommitReport(snapId, missing, skipped, counts.values.sum)
  }

  def currentSnapshotId(spark: SparkSession, root: String): Option[String] =
    readFile(spark, new Path(root, "CURRENT")).map(_.trim).filter(_.nonEmpty)

  /** Read the committed table (manifested partitions only). */
  def read(spark: SparkSession, root: String, partCol: String): DataFrame = {
    val rootP = new Path(root)
    val f = fs(spark, rootP)
    val manDir = new Path(rootP, "manifests")
    val keys =
      if (!f.exists(manDir)) Seq.empty[String]
      else f.listStatus(manDir).map(_.getPath.getName).filter(_.endsWith(".json"))
        .map(_.stripSuffix(".json")).toSeq.sorted
    require(keys.nonEmpty, s"no committed partitions under $root")
    val dirs = keys.map(k => new Path(rootP, s"data/$partCol=$k").toString)
    spark.read.option("basePath", new Path(rootP, "data").toString).parquet(dirs: _*)
  }

  /** Per-partition row-count metrics from manifests (lineage audit). */
  def manifestRows(spark: SparkSession, root: String): Map[String, Long] = {
    val rootP = new Path(root)
    val f = fs(spark, rootP)
    val manDir = new Path(rootP, "manifests")
    if (!f.exists(manDir)) Map.empty
    else f.listStatus(manDir).map(_.getPath).filter(_.getName.endsWith(".json")).map { p =>
      val s = readFile(spark, p).get
      val key = """"key": "([^"]*)"""".r.findFirstMatchIn(s).get.group(1)
      val rows = """"rows": (\d+)""".r.findFirstMatchIn(s).get.group(1).toLong
      key -> rows
    }.toMap
  }
}
