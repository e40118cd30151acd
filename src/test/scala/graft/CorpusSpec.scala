package graft

import org.apache.spark.sql.functions._

import graft.text.Corpus

/** Corpus-assembly operators: decontamination, splits, quota sampling,
  * budget packing — each checked against a locally computed model of the
  * exact semantics, plus the stability properties the scaladocs promise
  * (repartition-invariance, append-stability).
  */
class CorpusSpec extends SparkSpecBase {
  import spark.implicits._

  private val words = Vector("alpha", "beta", "gamma", "delta", "rho", "sigma")

  /** deterministic doc corpus with planted benchmark overlaps */
  private lazy val corpus: Seq[(Long, String, String)] = {
    val rnd = new scala.util.Random(7)
    (0L until 120L).map { id =>
      val body = Seq.fill(20)(words(rnd.nextInt(words.length))).mkString(" ")
      // docs 0,10,20,... carry a long unique marker; docs 5,15,25,... copy
      // the PREVIOUS marker doc's marker → true contamination when the
      // marker doc is in the benchmark set
      val text =
        if (id % 10 == 0) s"$body unique-marker-fragment-number-${id / 10} tail"
        else if (id % 10 == 5) s"$body unique-marker-fragment-number-${id / 10} tail"
        else body
      (id, text, s"dom${(id % 7)}")
    }
  }

  private def mix(id: Long): Long =
    ((id % Corpus.MixP) * Corpus.MixA) % Corpus.MixP

  test("mixHash: overflow-free and equal to the local model for extreme ids") {
    val ids = Seq(0L, 1L, 97L, Long.MaxValue, Long.MaxValue - 1, 3400000000L)
    val got = ids.toDF("id").select(col("id"), Corpus.mixHash(col("id")).as("h"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    ids.foreach { id =>
      val expected = ((id % Corpus.MixP) * Corpus.MixA) % Corpus.MixP
      assert(got(id) === expected, s"id=$id")
      assert(got(id) >= 0 && got(id) < Corpus.MixP)
    }
  }

  test("contaminationFlags equals a brute-force n-gram overlap model") {
    val df = corpus.toDF("doc_id", "text", "source")
    val bench = df.filter(col("doc_id") % 20 === 0) // the marker docs 0,20,40,...
    val train = df.filter(col("doc_id") % 20 =!= 0)
    val n = 25
    val got = Corpus.contaminationFlags(train, bench, "doc_id", "text", n)
      .select("doc_id", "contaminated")
      .collect().map(r => (r.getLong(0), r.getBoolean(1))).toMap
    val benchSh = corpus.filter(_._1 % 20 == 0)
      .flatMap(_._2.sliding(n)).toSet
    val exp = corpus.filter(_._1 % 20 != 0).map { case (id, text, _) =>
      id -> text.sliding(n).exists(benchSh.contains)
    }.toMap
    assert(got === exp)
    assert(exp.values.count(identity) >= 3, "fixture must plant contaminated docs")
    assert(exp.values.count(!_) >= 3, "fixture must keep clean docs")
    // decontaminate = exactly the clean rows
    val clean = Corpus.decontaminate(train, bench, "doc_id", "text", n)
      .select("doc_id").as[Long].collect().toSet
    assert(clean === exp.filter(!_._2).keySet)
  }

  test("splitAssign: exact thresholds, repartition- and append-stable") {
    val df = corpus.toDF("doc_id", "text", "source")
    val splits = Seq("train" -> 9000, "val" -> 500, "test" -> 500)
    val got = Corpus.splitAssign(df, "doc_id", splits)
      .select("doc_id", "split").collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    corpus.foreach { case (id, _, _) =>
      val b = mix(id) % 10000
      val exp = if (b < 9000) "train" else if (b < 9500) "val" else "test"
      assert(got(id) === exp, s"id=$id bucket=$b")
    }
    // append-stability: the same ids in a different (subset) frame get the
    // same split — assignment is a pure per-row function
    val subset = Corpus.splitAssign(df.filter(col("doc_id") < 30).repartition(5),
        "doc_id", splits)
      .select("doc_id", "split").collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    subset.foreach { case (id, s) => assert(s === got(id)) }
  }

  test("splitAssign rejects weights not summing to 10000") {
    val df = corpus.toDF("doc_id", "text", "source")
    intercept[IllegalArgumentException] {
      Corpus.splitAssign(df, "doc_id", Seq("a" -> 1, "b" -> 2))
    }
  }

  test("quotaSample: exactly-k per domain, deterministic under repartitioning") {
    val df = corpus.toDF("doc_id", "text", "source")
    val k = 4
    val got = Corpus.quotaSample(df.repartition(7), "source", "doc_id", k)
      .select("doc_id", "source").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val byDom = got.groupBy(_._2)
    corpus.groupBy(_._3).foreach { case (dom, rows) =>
      val expected = rows.map(_._1).sortBy(id => (mix(id), id)).take(k).toSet
      assert(byDom(dom).map(_._1).toSet === expected, s"domain $dom")
    }
    // and stable across a different partitioning
    val again = Corpus.quotaSample(df.repartition(2), "source", "doc_id", k)
      .select("doc_id").as[Long].collect().toSet
    assert(again === got.map(_._1).toSet)
  }

  test("quotaSampleSkewSafe equals quotaSample on a skewed corpus; prefilter bounds the exchange") {
    // one giant domain (5k rows) + small ones — the shape the skew cap
    // exists for
    val skewed = (0L until 5000L).map(id => (id, s"t$id", "whale")) ++
      (5000L until 5200L).map(id => (id, s"t$id", s"dom${id % 11}"))
    val df = skewed.toDF("doc_id", "text", "source")
    val k = 7
    val exact = Corpus.quotaSample(df, "source", "doc_id", k)
      .select("doc_id").as[Long].collect().toSet
    for (parts <- Seq(1, 4, 13)) {
      val got = Corpus.quotaSampleSkewSafe(df.repartition(parts), "source", "doc_id", k)
        .select("doc_id").as[Long].collect().toSet
      assert(got === exact, s"parts=$parts")
      // the prefilter's survivor frame is what reaches the window's
      // exchange: at most k rows per (domain, input partition)
      val surv = Corpus.quotaPrefilter(df.repartition(parts), "source", "doc_id", k)
        .groupBy("source").count().collect()
        .map(r => (r.getString(0), r.getLong(1))).toMap
      assert(surv("whale") <= parts.toLong * k,
        s"whale survivors ${surv("whale")} > $parts*$k")
      surv.values.foreach(c => assert(c <= parts.toLong * k))
    }
  }

  test("quotaPrefilter safety valves: null keys pass through; domain-cap degrades to pass-through") {
    // null domain / null id rows must reach the exact window untouched
    // (the window owns null semantics; getLong on a null id would misrank
    // it as 0) — skew-safe must equal plain on a frame with nulls
    val rows = Seq[(java.lang.Long, String, String)](
      (1L, "a", "d1"), (2L, "b", "d1"), (3L, "c", null),
      (4L, "d", "d1"), (null, "e", "d1"), (5L, "f", "d2"))
    val df = rows.toDF("doc_id", "text", "source")
    def collect(frame: org.apache.spark.sql.DataFrame) =
      frame.select("text").as[String].collect().toSet
    val plain = collect(Corpus.quotaSample(df, "source", "doc_id", 2))
    val safe = collect(Corpus.quotaSampleSkewSafe(df.repartition(3), "source", "doc_id", 2))
    assert(safe === plain)
    // maxDomains=1: most domains degrade to pass-through mid-partition —
    // output must STILL equal the plain window (superset contract)
    val many = (0L until 400L).map(id => (id, s"t$id", s"dom${id % 37}"))
    val mdf = many.toDF("doc_id", "text", "source")
    val exactM = Corpus.quotaSample(mdf, "source", "doc_id", 3)
      .select("doc_id").as[Long].collect().toSet
    val capped = Corpus.quotaSample(
        Corpus.quotaPrefilter(mdf.repartition(5), "source", "doc_id", 3, maxDomains = 1),
        "source", "doc_id", 3)
      .select("doc_id").as[Long].collect().toSet
    assert(capped === exactM)
  }

  test("mixtureExpand: fractional epochs match the per-id model; zero-weight drops") {
    val df = corpus.toDF("doc_id", "text", "source")
    val weights = Map("dom0" -> 25000, "dom1" -> 10000, "dom2" -> 2500, "dom3" -> 0)
    val got = Corpus.mixtureExpand(df, "doc_id", "source", weights)
      .select("doc_id", "epoch").collect()
      .map(r => (r.getLong(0), r.getInt(1))).toList
    val exp = corpus.flatMap { case (id, _, dom) =>
      val bp = weights.getOrElse(dom, 10000)
      val reps = bp / 10000 + (if (mix(id) % 10000 < bp % 10000) 1 else 0)
      (1 to reps).map(e => (id, e))
    }.toList
    assert(got.sorted === exp.sorted)
    // the fixture exercises every branch: whole copies, fractional extra,
    // fractional drop, zero-weight drop, and the one-epoch default
    val byDom = corpus.groupBy(_._3).view.mapValues(_.map(_._1)).toMap
    val gotIds = got.map(_._1).toSet
    assert(byDom("dom3").forall(id => !gotIds.contains(id)), "dom3 must drop")
    assert(byDom("dom0").forall(id => got.count(_._1 == id) >= 2), "dom0 >= 2 copies")
    assert(byDom("dom0").exists(id => got.count(_._1 == id) == 3), "dom0 plants a 3-copy doc")
    assert(byDom("dom2").exists(id => gotIds.contains(id)), "dom2 keeps some")
    assert(byDom("dom2").exists(id => !gotIds.contains(id)), "dom2 drops some")
  }

  test("assemble: end-to-end pipeline invariants hold on a planted corpus") {
    // plant: duplicate texts (dedup must collapse), benchmark overlaps
    // (decontamination must drop), and a whale domain (quota must cap)
    val all = corpus.map { case (id, text, dom) =>
      (id, if (id % 13 == 0) "the exact same duplicated text body" else text,
        if (id < 60) "whale" else dom)
    }
    val df = all.toDF("doc_id", "text", "source")
      .withColumn("n_chars", length(col("text")).cast("long"))
    val bench = df.filter(col("doc_id") % 20 === 0)
    val base = df.filter(col("doc_id") % 20 =!= 0)
    val quota = 9
    val out = Corpus.assemble(base, bench, "doc_id", "text", "source",
        "n_chars", shingleN = 25, quota = quota,
        splits = Seq("train" -> 8000, "val" -> 1000, "test" -> 1000),
        budget = 200L, buckets = 3)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3), r.getLong(4)))
    val ids = out.map(_._1).toSet
    val textOf = all.map(t => t._1 -> t._2).toMap
    // 1. dedup: no two survivors share a normalized text
    val norms = out.map(o => textOf(o._1).toLowerCase.replaceAll("[^a-z]", ""))
    assert(norms.distinct.length === norms.length)
    // 2. decontamination: no survivor shares a 25-gram with the benchmark
    val benchSh = all.filter(_._1 % 20 == 0).flatMap(_._2.sliding(25)).toSet
    ids.foreach { id =>
      assert(!textOf(id).sliding(25).exists(benchSh.contains), s"doc $id contaminated")
    }
    // 3. quota: at most `quota` per domain, and the whale domain is capped
    val byDom = out.groupBy(_._2).view.mapValues(_.length).toMap
    byDom.foreach { case (dom, n) => assert(n <= quota, s"$dom over quota: $n") }
    assert(byDom("whale") === quota, "whale domain must bind the quota")
    // 4. split matches the pure per-id function
    out.foreach { case (id, _, split, _, _) =>
      val b = mix(id) % 10000
      val exp = if (b < 8000) "train" else if (b < 9000) "val" else "test"
      assert(split === exp, s"doc $id")
    }
    // 5. shards are split-scoped: (split, bucket, pack) groups never mix
    //    splits by construction; packs dense from 0 within each scope
    out.groupBy(o => (o._3, o._4)).foreach { case ((split, bucket), rows) =>
      val packs = rows.map(_._5).toSet
      assert(packs.min === 0L, s"($split,$bucket)")
      assert(packs === (0L until packs.size.toLong).toSet, s"($split,$bucket) packs not dense")
    }
    // the pipeline is repartition-stable end to end
    val again = Corpus.assemble(base.repartition(7), bench, "doc_id", "text",
        "source", "n_chars", shingleN = 25, quota = quota,
        splits = Seq("train" -> 8000, "val" -> 1000, "test" -> 1000),
        budget = 200L, buckets = 3)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3), r.getLong(4)))
    assert(again.sortBy(_._1).toSeq === out.sortBy(_._1).toSeq)
  }

  test("packBudget: concat-and-chunk model within buckets; no pack exceeds budget+maxCost") {
    val df = corpus.toDF("doc_id", "text", "source")
      .withColumn("cost", length(col("text")).cast("long"))
    val budget = 300L
    val buckets = 4
    val got = Corpus.packBudget(df, "doc_id", "cost", budget, buckets)
      .select("doc_id", "bucket", "pack").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toList
    // local model
    val costs = corpus.map { case (id, text, _) => id -> text.length.toLong }.toMap
    val exp = corpus.map(_._1).groupBy(id => mix(id) % buckets).flatMap {
      case (bucket, ids) =>
        var cum = 0L
        ids.sortBy(id => (mix(id), id)).map { id =>
          val pack = cum / budget
          cum += costs(id)
          (id, bucket, pack)
        }
    }.toSet
    assert(got.toSet === exp)
    // every bucket uses >0 packs and pack ids are dense from 0
    got.groupBy(_._2).foreach { case (b, rows) =>
      val packs = rows.map(_._3).toSet
      assert(packs.min === 0L, s"bucket $b")
      assert(packs === (0L until packs.size.toLong).toSet, s"bucket $b packs not dense")
    }
    // chunk invariant: the summed cost of a pack's docs, minus its last
    // doc, stays under the budget (a doc may straddle the boundary)
    got.groupBy(r => (r._2, r._3)).foreach { case ((b, p), rows) =>
      val ordered = rows.map(_._1).sortBy(id => (mix(id), id))
      val withoutLast = ordered.dropRight(1).map(costs).sum
      assert(withoutLast < budget, s"bucket $b pack $p overfilled before its last doc")
    }
  }
}
