package graft.media

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Image payload plumbing for the geotagged image+caption table
  * (BASELINE.json `input_hint`: image_id, bytes, w, h, fmt, caption, phash).
  *
  * Formats:
  *  - "png"  — lossless grayscale PNG via JDK ImageIO (deterministic decode;
  *    JPEG is avoided because encoders are platform-variant, SURVEY §7.5.5)
  *  - "qnt"  — lossy-simulation: pixels quantized to step 4 before PNG
  *    encode; exercises the PSNR ≥ 40 dB acceptance path (step-4 uniform
  *    quantization ⇒ MSE ≤ 4/3 ⇒ PSNR ≈ 46.9 dB)
  *
  * Decode is the CPU hog at 10^12 scale: [[imageFeatures]] decodes each
  * payload exactly once inside one `mapPartitions` stage and fuses phash +
  * luminance + footprint extraction there (no per-feature re-decode).
  */
object Media {

  // ---- codec ------------------------------------------------------------------

  /** Deterministic synthetic grayscale raster for an id: a product of
    * sinusoid-free integer arithmetic (no float, no RNG state) so any
    * engine/worker reproduces it bit-exactly.
    */
  def synthPixels(id: Long, w: Int, h: Int): Array[Byte] = {
    val px = new Array[Byte](w * h)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val v = (id * 31 + x * 7 + y * 13 + ((x * y) % 29) * 5) % 256
        px(y * w + x) = v.toByte
        x += 1
      }
      y += 1
    }
    px
  }

  def quantize(px: Array[Byte], step: Int = 4): Array[Byte] = {
    val out = new Array[Byte](px.length)
    var i = 0
    while (i < px.length) {
      val v = px(i) & 0xff
      out(i) = ((v / step) * step + step / 2).min(255).toByte
      i += 1
    }
    out
  }

  def encodePng(px: Array[Byte], w: Int, h: Int): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY)
    img.getRaster.setDataElements(0, 0, w, h, px)
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  def decodePng(bytes: Array[Byte]): (Array[Byte], Int, Int) = {
    val img = ImageIO.read(new ByteArrayInputStream(bytes))
    val w = img.getWidth; val h = img.getHeight
    val gray =
      if (img.getType == BufferedImage.TYPE_BYTE_GRAY) img
      else {
        val g = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY)
        g.getGraphics.drawImage(img, 0, 0, null)
        g
      }
    val px = new Array[Byte](w * h)
    gray.getRaster.getDataElements(0, 0, w, h, px)
    (px, w, h)
  }

  // ---- features ------------------------------------------------------------------

  /** 8x8 average-downsample then 64-bit aHash. */
  def aHash(px: Array[Byte], w: Int, h: Int): Long = {
    val grid = new Array[Int](64)
    var gy = 0
    while (gy < 8) {
      var gx = 0
      while (gx < 8) {
        val x0 = gx * w / 8; val x1 = ((gx + 1) * w / 8).max(x0 + 1)
        val y0 = gy * h / 8; val y1 = ((gy + 1) * h / 8).max(y0 + 1)
        var s = 0L; var n = 0
        var y = y0
        while (y < y1) {
          var x = x0
          while (x < x1) { s += (px(y * w + x) & 0xff); n += 1; x += 1 }
          y += 1
        }
        grid(gy * 8 + gx) = (s / n).toInt
        gx += 1
      }
      gy += 1
    }
    graft.expr.GeoMath.aHash64(grid)
  }

  /** Peak signal-to-noise ratio between two equal-size rasters (dB). */
  def psnr(a: Array[Byte], b: Array[Byte]): Double = {
    require(a.length == b.length, "psnr: size mismatch")
    var se = 0.0
    var i = 0
    while (i < a.length) {
      val d = ((a(i) & 0xff) - (b(i) & 0xff)).toDouble
      se += d * d
      i += 1
    }
    if (se == 0.0) Double.PositiveInfinity
    else 20.0 * math.log10(255.0 / math.sqrt(se / a.length))
  }

  val featureSchema: StructType = StructType(Seq(
    StructField("image_id", StringType, nullable = false),
    StructField("w", IntegerType, nullable = false),
    StructField("h", IntegerType, nullable = false),
    StructField("phash", LongType, nullable = false),
    StructField("mean_lum", DoubleType, nullable = false)))

  /** Fused decode → (dims, phash, mean luminance) in ONE mapPartitions pass.
    * Input df must have (image_id string, bytes binary). At scale this is
    * the only stage that touches pixels; everything downstream works on the
    * extracted features.
    */
  def imageFeatures(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val rdd = df.select(col("image_id"), col("bytes")).rdd.mapPartitions { it =>
      it.map { r =>
        val id = r.getString(0)
        val bytes = r.getAs[Array[Byte]](1)
        val (px, w, h) = decodePng(bytes)
        var s = 0L; var i = 0
        while (i < px.length) { s += (px(i) & 0xff); i += 1 }
        Row(id, w, h, aHash(px, w, h), s.toDouble / px.length)
      }
    }
    spark.createDataFrame(rdd, featureSchema)
  }

  /** Per-row decoded-pixel comparison of two payload columns: exact match
    * count and PSNR (the input_hint acceptance invariant). Input:
    * (image_id, bytes_a, bytes_b). Output adds exact:boolean, psnr:double.
    */
  def pixelCompare(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val schema = StructType(Seq(
      StructField("image_id", StringType, nullable = false),
      StructField("exact", BooleanType, nullable = false),
      StructField("psnr", DoubleType, nullable = false)))
    val rdd = df.select(col("image_id"), col("bytes_a"), col("bytes_b")).rdd.mapPartitions { it =>
      it.map { r =>
        val (pa, _, _) = decodePng(r.getAs[Array[Byte]](1))
        val (pb, _, _) = decodePng(r.getAs[Array[Byte]](2))
        val p = psnr(pa, pb)
        Row(r.getString(0), java.util.Arrays.equals(pa, pb), p)
      }
    }
    spark.createDataFrame(rdd, schema)
  }
}
