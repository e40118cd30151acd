package graft

import org.apache.spark.sql.functions._
import graft.io.SnapshotTable

/** Resume-from-checkpoint semantics (G9): kill-after-partition-k rerun
  * produces identical output and manifest row counts; completed partitions
  * are never rewritten.
  */
class SnapshotTableSpec extends SparkSpecBase {

  import spark.implicits._

  private def freshRoot(): String =
    java.nio.file.Files.createTempDirectory("graft_snap").toString

  private lazy val full = GeoFixturesTable()

  private def GeoFixturesTable() = {
    val imgs = graft.geo.GeoFixtures.images(spark, 500)
    imgs.withColumn("cell5",
      graft.functions.GeoFunctions.cell_id(col("lon"), col("lat"), 3).cast("string"))
      .select("image_id", "caption", "phash", "cell5")
  }

  test("full commit writes every partition with row-count manifests") {
    val root = freshRoot()
    val rep = SnapshotTable.commit(full, root, "cell5", "fixture-images")
    assert(rep.skipped.isEmpty)
    assert(rep.totalRows === 500L)
    assert(rep.snapshotId === "s0000")
    val manifests = SnapshotTable.manifestRows(spark, root)
    val expected = full.groupBy("cell5").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(manifests === expected)
    val back = SnapshotTable.read(spark, root, "cell5")
    assert(back.count() === 500L)
  }

  test("keys with path-special characters survive commit, resume, and read") {
    // Spark ESCAPES special characters in partition directory names, so
    // the manifest filename and the data-dir fallback must use the same
    // escaping — raw keys with ':', ' ', '/', '%', '"' used to break
    // read (path-not-found) or resume (manifest invisible, rewritten
    // every run)
    val keys = Seq("2024-01-01 00:00:00", "a/b", "pct%20done", "qu\"ote", "plain")
    val rows = keys.zipWithIndex.flatMap { case (k, i) =>
      (0 to i).map(j => (s"id_${i}_$j", k))
    }
    val df = rows.toDF("id", "k")
    val root = freshRoot()
    val rep = SnapshotTable.commit(df, root, "k", "specials")
    assert(rep.written.toSet === keys.toSet)
    // resume: an identical second commit must SKIP every key — this is
    // what raw '/' keys broke (manifest written to a nested dir the
    // lister never saw)
    val rep2 = SnapshotTable.commit(df, root, "k", "specials")
    assert(rep2.written.isEmpty, s"re-written: ${rep2.written}")
    assert(rep2.skipped.toSet === keys.toSet)
    assert(SnapshotTable.manifestRows(spark, root).keySet === keys.toSet)
    // read resolves every partition's escaped data dir
    val back = SnapshotTable.read(spark, root, "k")
    assert(back.count() === rows.length.toLong)
    assert(back.select("k").distinct().collect().map(_.getString(0)).toSet === keys.toSet)
  }

  test("null partition keys are rejected loudly, not silently dropped") {
    val df = Seq(("a", Some("k1")), ("b", None), ("c", Some("k2")))
      .toDF("id", "k")
    val e = intercept[IllegalArgumentException] {
      SnapshotTable.commit(df, freshRoot(), "k", "nulls")
    }
    assert(e.getMessage.contains("null partition key"))
  }

  test("partial run (simulated kill) resumes: only missing partitions written") {
    val root = freshRoot()
    val keys = full.select("cell5").distinct().collect().map(_.getString(0)).sorted
    assert(keys.length > 3, "fixture needs several partitions")
    val firstHalf = keys.take(keys.length / 2).toSet

    // "killed" run: only half the partitions got committed
    val rep1 = SnapshotTable.commit(
      full.filter(col("cell5").isin(firstHalf.toSeq: _*)), root, "cell5", "fixture-images")
    assert(rep1.written.toSet === firstHalf)

    // plus a half-written uncommitted partition dir (no manifest) — must be overwritten
    val orphanKey = keys.drop(keys.length / 2).head
    full.filter(col("cell5") === orphanKey).limit(1)
      .write.mode("overwrite").parquet(s"$root/data/cell5=$orphanKey")

    // resumed run over the FULL input
    val rep2 = SnapshotTable.commit(full, root, "cell5", "fixture-images")
    assert(rep2.skipped.toSet === firstHalf, "completed partitions must be skipped")
    assert(rep2.written.toSet === keys.toSet -- firstHalf)
    assert(rep2.snapshotId === "s0001")

    // identical final output + manifest metrics
    val back = SnapshotTable.read(spark, root, "cell5")
    assert(back.count() === 500L)
    val diff = back.select("image_id", "caption", "phash")
      .except(full.select("image_id", "caption", "phash")).count()
    assert(diff === 0L)
    val expected = full.groupBy("cell5").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(SnapshotTable.manifestRows(spark, root) === expected)
  }

  test("re-commit of an unchanged table is a no-op (all partitions skipped)") {
    val root = freshRoot()
    SnapshotTable.commit(full, root, "cell5", "fixture-images")
    val rep = SnapshotTable.commit(full, root, "cell5", "fixture-images")
    assert(rep.written.isEmpty)
    assert(rep.skipped.nonEmpty)
  }

  test("snapshot chain records parent and lineage") {
    val root = freshRoot()
    SnapshotTable.commit(full, root, "cell5", "op-a", Seq("src:testdata"))
    SnapshotTable.commit(full, root, "cell5", "op-b", Seq("s0000"))
    assert(SnapshotTable.currentSnapshotId(spark, root) === Some("s0001"))
    val snap = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$root/snapshots/s0001.json")))
    assert(snap.contains(""""parent": "s0000""""))
    assert(snap.contains("op-b"))
  }
}
