package graft

import org.apache.spark.sql.functions._
import graft.geo.GeoFixtures
import graft.media.Media

/** Image payload integrity — the input_hint acceptance invariant (G8):
  * decoded pixels exact for lossless, PSNR ≥ 40 dB for lossy-sim, caption
  * byte-equality through a full write/read pipeline, phash as a
  * decode-correctness probe.
  */
class MediaSpec extends SparkSpecBase {

  test("png encode/decode roundtrip is pixel-exact") {
    (Seq((1L, 16, 16), (2L, 32, 64), (3L, 64, 32))).foreach { case (id, w, h) =>
      val px = Media.synthPixels(id, w, h)
      val (dec, dw, dh) = Media.decodePng(Media.encodePng(px, w, h))
      assert(dw === w && dh === h)
      assert(java.util.Arrays.equals(dec, px))
    }
  }

  test("sampleFrames keeps every k-th frame with still-image-exact features") {
    import spark.implicits._
    // three 8-frame "videos"; frame payloads are the deterministic PNGs
    val videos = (0 until 3).map { v =>
      val frames = (0 until 8).map { f =>
        Media.encodePng(Media.synthPixels(v * 100L + f, 16, 16), 16, 16)
      }
      (s"vid$v", frames)
    }
    val df = videos.toDF("video_id", "frames")
    val sampled = Media.sampleFrames(df, "video_id", "frames", everyK = 3)
      .collect().map(r => (r.getString(0), r.getInt(1)) -> r.getLong(4)).toMap
    assert(sampled.keySet ===
      (for (v <- 0 until 3; f <- Seq(0, 3, 6)) yield (s"vid$v", f)).toSet)
    // phash of each sampled frame equals the still-image path's phash
    val stills = Media.imageFeatures(
      videos.flatMap { case (vid, frames) =>
        Seq(0, 3, 6).map(f => (s"$vid/$f", frames(f)))
      }.toDF("image_id", "bytes"))
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    sampled.foreach { case ((vid, f), ph) =>
      assert(ph === stills(s"$vid/$f"), s"phash mismatch for $vid frame $f")
    }
  }

  test("quantized payload PSNR >= 40 dB and < infinity") {
    val px = Media.synthPixels(99L, 64, 64)
    val q = Media.quantize(px)
    val p = Media.psnr(px, q)
    assert(p >= 40.0, s"psnr $p")
    assert(p < Double.PositiveInfinity)
    assert(Media.psnr(px, px).isPosInfinity)
  }

  test("fixture phash is reproduced by decode->aHash (decode-correctness probe)") {
    val imgs = GeoFixtures.images(spark, 200)
    val recomputed = Media.imageFeatures(imgs.select(col("image_id"), col("bytes")))
    val joined = imgs.select(col("image_id"), col("phash").as("expected"),
        col("w").as("ew"), col("h").as("eh"))
      .join(recomputed, "image_id")
    val bad = joined.filter(col("phash") =!= col("expected") ||
      col("w") =!= col("ew") || col("h") =!= col("eh")).count()
    assert(bad === 0)
    assert(joined.count() === 200)
  }

  test("captions survive a full parquet write/read round trip byte-equal") {
    val imgs = GeoFixtures.images(spark, 300)
    val dir = java.nio.file.Files.createTempDirectory("graft_media").toString
    imgs.write.mode("overwrite").parquet(s"$dir/images")
    val back = spark.read.parquet(s"$dir/images")
    val diff = imgs.select(col("image_id"), col("caption"))
      .except(back.select(col("image_id"), col("caption"))).count()
    assert(diff === 0)
    assert(back.count() === 300)
  }

  test("pixelCompare: lossless exact, lossy within PSNR bound") {
    import spark.implicits._
    val rows = (1L to 50L).map { id =>
      val px = Media.synthPixels(id, 32, 32)
      (s"img$id", Media.encodePng(px, 32, 32),
        Media.encodePng(Media.quantize(px), 32, 32))
    }
    val df = rows.toDF("image_id", "bytes_a", "bytes_b")
    val cmp = Media.pixelCompare(df).cache()
    assert(cmp.filter(col("psnr") < 40.0).count() === 0)
    // identical payloads are exact
    val same = Media.pixelCompare(
      rows.map(r => (r._1, r._2, r._2)).toDF("image_id", "bytes_a", "bytes_b"))
    assert(same.filter(!col("exact")).count() === 0)
  }

  test("imageNearDupPairs: banded plan equals brute force over decoded hashes") {
    import spark.implicits._
    // 40 base images, each with a quantized (lossy) copy — small
    // luminance shifts flip only the aHash bits whose block average sits
    // near the global mean — plus unrelated images as distractors
    val rows = (0 until 40).flatMap { i =>
      val px = Media.synthPixels(i.toLong, 32, 32)
      Seq((f"img$i%03d", Media.encodePng(px, 32, 32)),
        (f"lossy$i%03d", Media.encodePng(Media.quantize(px), 32, 32)))
    }
    val maxDist = 6
    val got = Media.imageNearDupPairs(rows.toDF("image_id", "bytes"), maxDist)
      .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2))).toSet
    val hashes = rows.map { case (id, bytes) =>
      val (px, w, h) = Media.decodePng(bytes)
      (id, Media.aHash(px, w, h))
    }
    val exp = (for {
      (a, ha) <- hashes; (b, hb) <- hashes
      if a < b
      dist = java.lang.Long.bitCount(ha ^ hb)
      if dist <= maxDist
    } yield (a, b, dist)).toSet
    assert(got === exp)
    // the planted lossy copies make the test bite: most land within the bar
    val hmap = hashes.toMap
    val planted = (0 until 40).count(i =>
      java.lang.Long.bitCount(hmap(f"img$i%03d") ^ hmap(f"lossy$i%03d")) <= maxDist)
    assert(planted >= 30, s"only $planted of 40 lossy copies within $maxDist bits")
  }

  test("dctFeatures: hash/embedding survive affine pixel maps; aHash-style near-dups hold") {
    // exact-integer affine map a=2, b=10 over values ≤ 100: DC absorbs b,
    // median threshold + L2 normalization absorb a — frequency-domain
    // features must be (near-)invariant where raw-pixel features are not
    val w = 40; val h = 24
    val px = Array.tabulate(w * h)(i => ((i * 37) % 101).toByte)
    val mapped = px.map(v => (2 * (v & 0xff) + 10).toByte)
    val (h1, e1) = Media.dctFeatures(px, w, h)
    val (h2, e2) = Media.dctFeatures(mapped, w, h)
    assert(java.lang.Long.bitCount(h1 ^ h2) <= 2,
      s"affine map moved the DCT hash by ${java.lang.Long.bitCount(h1 ^ h2)} bits")
    val cos = e1.zip(e2).map { case (a, b) => a.toDouble * b }.sum
    assert(cos >= 0.9999, s"affine map broke the unit embedding: cos=$cos")
    // embeddings are unit-norm (non-flat image)
    val n1 = e1.map(x => x.toDouble * x).sum
    assert(math.abs(n1 - 1.0) < 1e-6, s"embedding not unit-norm: $n1")
    // flat image: all-zero embedding, zero hash (no AC energy)
    val (hFlat, eFlat) = Media.dctFeatures(Array.fill(w * h)(77.toByte), w, h)
    assert(hFlat === 0L)
    assert(eFlat.forall(_ == 0.0f))
  }

  test("truncated DCT (dctFeaturesInto) equals the full dct2 corner bit-exactly") {
    val w = 48; val h = 32
    val px = Media.synthPixels(123L, w, h)
    val full = Media.dct2(Media.downsampleGrid(px, w, h, 32))
    val s = new Media.DctScratch
    val hash = Media.dctFeaturesInto(px, w, h, s)
    // same summation order → identical doubles, not just close
    val low = new Array[Double](64)
    for (v <- 0 until 8; u <- 0 until 8) low(v * 8 + u) = full(v * 32 + u)
    val (hashPure, embPure) = Media.dctFeatures(px, w, h)
    assert(hash === hashPure)
    assert(s.emb.toSeq === embPure.toSeq)
    // reconstruct hash/embedding from the full-transform corner
    val norm = (1 until 64).map(i => low(i) * low(i)).sum
    val ac = (1 until 64).map(low).sorted
    val median = ac(31)
    var expHash = 0L
    (1 until 64).foreach(i => if (low(i) > median) expHash |= 1L << i)
    assert(hash === expHash)
    val inv = 1.0 / math.sqrt(norm)
    (1 until 64).foreach(i => assert(s.emb(i) === (low(i) * inv).toFloat, s"i=$i"))
  }

  test("imageNearDupPairsDct: banded plan equals brute force; lossy copies within bar") {
    import spark.implicits._
    val rows = (0 until 30).flatMap { i =>
      val px = Media.synthPixels(i.toLong, 32, 32)
      Seq((f"img$i%03d", Media.encodePng(px, 32, 32)),
        (f"lossy$i%03d", Media.encodePng(Media.quantize(px), 32, 32)))
    }
    val maxDist = 8
    val got = Media.imageNearDupPairsDct(rows.toDF("image_id", "bytes"), maxDist)
      .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2))).toSet
    val hashes = rows.map { case (id, bytes) =>
      val (px, w, h) = Media.decodePng(bytes)
      (id, Media.dctFeatures(px, w, h)._1)
    }
    val exp = (for {
      (a, ha) <- hashes; (b, hb) <- hashes
      if a < b
      dist = java.lang.Long.bitCount(ha ^ hb)
      if dist <= maxDist
    } yield (a, b, dist)).toSet
    assert(got === exp)
    val hmap = hashes.toMap
    val planted = (0 until 30).count(i =>
      java.lang.Long.bitCount(hmap(f"img$i%03d") ^ hmap(f"lossy$i%03d")) <= maxDist)
    assert(planted >= 24, s"only $planted of 30 lossy copies within $maxDist bits")
  }

  test("imageDedupeDecision: keep flags equal brute-force Hamming-graph CC") {
    import spark.implicits._
    val rows = (0 until 30).flatMap { i =>
      val px = Media.synthPixels(i.toLong, 32, 32)
      Seq((f"img$i%03d", Media.encodePng(px, 32, 32)),
        (f"lossy$i%03d", Media.encodePng(Media.quantize(px), 32, 32)))
    }
    val maxDist = 8
    val got = Media.imageDedupeDecision(rows.toDF("image_id", "bytes"), maxDist)
      .collect().map(r => (r.getString(0), r.getString(1), r.getBoolean(2))).toSet
    // local model: brute-force pairs -> union-find -> min label
    val hashes = rows.map { case (id, bytes) =>
      val (px, w, h) = Media.decodePng(bytes)
      (id, Media.dctFeatures(px, w, h)._1)
    }
    val parent = scala.collection.mutable.Map(hashes.map(h => h._1 -> h._1): _*)
    def find(x: String): String =
      if (parent(x) == x) x else { val r = find(parent(x)); parent(x) = r; r }
    for {
      (a, ha) <- hashes; (b, hb) <- hashes
      if a < b && java.lang.Long.bitCount(ha ^ hb) <= maxDist
    } {
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) { val (lo, hi) = if (ra < rb) (ra, rb) else (rb, ra); parent(hi) = lo }
    }
    val exp = hashes.map { case (id, _) =>
      val c = find(id)
      (id, c, id == c)
    }.toSet
    assert(got === exp)
    // the fixture must exercise real clusters: most lossy copies collapse
    assert(exp.count(!_._3) >= 20, s"only ${exp.count(!_._3)} dropped")
  }

  test("assembleImages: dedup -> split -> pack invariants and repartition stability") {
    import spark.implicits._
    val rows = (0 until 25).flatMap { i =>
      val px = Media.synthPixels(i.toLong, 32, 32)
      Seq((f"img$i%03d", Media.encodePng(px, 32, 32)),
        (f"lossy$i%03d", Media.encodePng(Media.quantize(px), 32, 32)))
    }
    val splits = Seq("train" -> 8000, "val" -> 1000, "test" -> 1000)
    def run(parts: Int) =
      Media.assembleImages(rows.toDF("image_id", "bytes").repartition(parts),
          maxDist = 8, splits, budget = 1500L, buckets = 2)
        .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val out = run(1)
    // 1. survivors = exactly the dedup decision's keepers
    val keepers = Media.imageDedupeDecision(rows.toDF("image_id", "bytes"), 8)
      .filter(org.apache.spark.sql.functions.col("keep"))
      .select("id").as[String].collect().toSet
    assert(out.map(_._1).toSet === keepers)
    assert(out.length < rows.length, "dedup must drop some lossy copies")
    // 2. packs dense from 0 within each (split, bucket) scope
    out.groupBy(o => (o._2, o._3)).foreach { case (scope, rs) =>
      val packs = rs.map(_._4).toSet
      assert(packs === (0L until packs.size.toLong).toSet, s"$scope")
    }
    // 3. the whole assignment is partitioning-invariant
    assert(run(7).sortBy(_._1).toSeq === out.sortBy(_._1).toSeq)
  }

  test("imageCosineNearDupPairs: payload-to-pairs equals quantized brute force") {
    import spark.implicits._
    val rows = (0 until 25).flatMap { i =>
      val px = Media.synthPixels(i.toLong, 32, 32)
      Seq((f"img$i%03d", Media.encodePng(px, 32, 32)),
        (f"lossy$i%03d", Media.encodePng(Media.quantize(px), 32, 32)))
    }
    val (tn, td) = (9, 10)
    val got = Media.imageCosineNearDupPairs(rows.toDF("image_id", "bytes"), tn, td)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    // mirror the factor-100 quantized kernel math on locally decoded pixels
    val quant = rows.map { case (id, bytes) =>
      val (px, w, h) = Media.decodePng(bytes)
      val emb = Media.dctFeatures(px, w, h)._2
      (id, emb.map(x => math.floor(x.toDouble * 100 + 0.5).toLong))
    }
    val tn2 = tn.toLong * tn; val td2 = td.toLong * td
    val exp = (for {
      (a, qa) <- quant; (b, qb) <- quant
      if a < b
      dot = qa.zip(qb).map { case (x, y) => x * y }.sum
      na = qa.map(x => x * x).sum; nb = qb.map(x => x * x).sum
      if dot > 0 && dot * dot * td2 >= tn2 * na * nb
    } yield (a, b, dot)).toSet
    assert(exp.nonEmpty, "fixture must plant cosine pairs above the bar")
    assert(got === exp)
    val planted = exp.count { case (a, b, _) =>
      a.startsWith("img") && b == "lossy" + a.stripPrefix("img") }
    assert(planted >= 20, s"only $planted of 25 lossy copies above cosine $tn/$td")
  }

  test("imageEmbeddings is partition-count independent (determinism)") {
    import spark.implicits._
    val rows = (0 until 20).map { i =>
      (f"img$i%03d", Media.encodePng(Media.synthPixels(i.toLong, 24, 24), 24, 24))
    }
    def run(parts: Int) =
      Media.imageEmbeddings(rows.toDF("image_id", "bytes").repartition(parts))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getSeq[Float](2))).toSet
    assert(run(1) === run(7))
  }

  test("fixture generation is partition-count independent (determinism)") {
    val a = GeoFixtures.images(spark, 150).repartition(1)
      .select("image_id", "phash", "lon", "lat", "caption")
      .collect().map(_.toSeq).toSet
    val b = GeoFixtures.images(spark, 150).repartition(7)
      .select("image_id", "phash", "lon", "lat", "caption")
      .collect().map(_.toSeq).toSet
    assert(a === b)
  }

  test("columnar decode path equals the row path and engages on parquet scans") {
    val dir = java.nio.file.Files.createTempDirectory("media_columnar").toString
    GeoFixtures.images(spark, 250).write.mode("overwrite").parquet(s"$dir/imgs")
    val scan = spark.read.parquet(s"$dir/imgs")
    // the pure pruned scan must actually take the columnar fast path
    assert(org.apache.spark.sql.graftbridge.Bridge
      .columnarScan(scan.select("image_id", "bytes")).isDefined)
    val rowPath = Media.imageFeatures(scan).collect().map(_.toSeq).toSet
    val colPath = Media.imageFeaturesColumnar(scan).collect().map(_.toSeq).toSet
    assert(colPath === rowPath)
    assert(colPath.size === 250)
    // a filtered frame must NOT take the leaf-only shortcut (falls back)
    val filtered = scan.filter(org.apache.spark.sql.functions.length(
      org.apache.spark.sql.functions.col("caption")) > 0)
    assert(org.apache.spark.sql.graftbridge.Bridge
      .columnarScan(filtered.select("image_id", "bytes")).isEmpty)
    assert(Media.imageFeaturesColumnar(filtered).count() === 250)
    // whitelist, not blacklist: ANY row-changing node disqualifies, not just
    // Project/Filter — a sample must never decode 100% of the rows
    assert(org.apache.spark.sql.graftbridge.Bridge
      .columnarScan(scan.sample(0.5, 42L).select("image_id", "bytes")).isEmpty)
    assert(org.apache.spark.sql.graftbridge.Bridge
      .columnarScan(scan.limit(10).select("image_id", "bytes")).isEmpty)
  }

  test("columnar staging survives dictionary-encoded payload pages") {
    import spark.implicits._
    // repeated payloads make parquet KEEP the dictionary encoding (unique
    // values trip its compression-fallback to plain) — the layout where
    // WritableColumnVector.getArray returns 0-length views (offsets are
    // never populated for dict pages) while getBinary decodes via the
    // dictionary; stagePayload must route around it
    val dir = java.nio.file.Files.createTempDirectory("media_dict").toString
    val five = (0 until 5).map(i =>
      Media.encodePng(Media.synthPixels(i.toLong, 32, 32), 32, 32))
    val rows = (0 until 200).map(i => (f"img$i%03d", five(i % 5)))
    rows.toDF("image_id", "bytes").coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/imgs")
    val scan = spark.read.parquet(s"$dir/imgs")
    assert(org.apache.spark.sql.graftbridge.Bridge
      .columnarScan(scan.select("image_id", "bytes")).isDefined)
    val rowPath = Media.imageFeatures(scan).collect().map(_.toSeq).toSet
    val colPath = Media.imageFeaturesColumnar(scan).collect().map(_.toSeq).toSet
    assert(colPath === rowPath)
    assert(colPath.size === 200)
    // the embedding stage rides the same staging
    val embRow = Media.imageEmbeddings(scan.repartition(3))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getSeq[Float](2))).toSet
    val embCol = Media.imageEmbeddings(scan)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getSeq[Float](2))).toSet
    assert(embCol === embRow)
    assert(embCol.size === 200)
  }

  test("decode fuzz: corrupt payloads are rejected, never thrown on") {
    // at 10^12 rows the payload column WILL contain junk; the fast-path
    // decoder must return None (-> ImageIO fallback decides) rather than
    // throw or overrun, for random bytes and for valid PNGs mutated at
    // every byte-flip position class
    val rnd = new scala.util.Random(2026)
    val scratch = new Media.PngScratch
    (0 until 300).foreach { i =>
      val len = rnd.nextInt(600)
      val junk = new Array[Byte](len)
      rnd.nextBytes(junk)
      // must not throw; None or a (very unlikely) well-formed decode both fine
      Media.decodePngGrayInto(junk, len, scratch)
    }
    val png = Media.encodePng(Media.synthPixels(3L, 24, 16), 24, 16)
    (0 until png.length).foreach { pos =>
      val mut = png.clone()
      mut(pos) = (mut(pos) ^ 0xff).toByte
      // no throw allowed — corrupt DEFLATE streams included (the decoder
      // converts DataFormatException to a None rejection)
      try Media.decodePngGrayInto(mut, mut.length, scratch)
      catch {
        case e: Throwable => fail(s"byte $pos: ${e.getClass.getName}: ${e.getMessage}")
      }
    }
    // truncations at every prefix length
    (0 to png.length).foreach { n =>
      try Media.decodePngGrayInto(png, n, scratch)
      catch {
        case e: Throwable => fail(s"truncation $n: ${e.getClass.getName}")
      }
    }
    // and the full image still decodes after all that scratch reuse
    assert(Media.decodePngGrayInto(png, png.length, scratch) === Some((24, 16)))
  }

  test("decode bounds-checks chunk lengths against the payload limit") {
    val px = Media.synthPixels(7L, 64, 48)
    val png = Media.encodePng(px, 64, 48)
    val scratch = new Media.PngScratch
    // stage a valid image first so the reused buffer holds stale bytes...
    assert(Media.decodePngGrayInto(png, png.length, scratch).isDefined)
    val staged = scratch.ensurePayload(png.length + 64)
    System.arraycopy(png, 0, staged, 0, png.length)
    // ...then truncate the DECLARED limit mid-IDAT: decode must refuse
    // rather than read stale bytes past the limit
    assert(Media.decodePngGrayInto(staged, png.length - 20, scratch).isEmpty)
    // full limit still decodes
    assert(Media.decodePngGrayInto(staged, png.length, scratch) === Some((64, 48)))
  }
}
