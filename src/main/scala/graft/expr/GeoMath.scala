package graft.expr

import org.apache.spark.sql.catalyst.util.ArrayData

/** Static geometry kernels referenced from both interpreted `eval` and
  * whole-stage-codegen'd Java (via Scala object static forwarders).
  *
  * Ring layout: `array<struct<lon:double, lat:double>>`, closed
  * (first == last vertex) per the reference's closure intent
  * (`/root/reference/osm/Planet.go:67` — the reference indexes one past the
  * end; we implement the documented intent `first == last`).
  */
object GeoMath {

  /** Even-odd ray-cast point-in-polygon over a closed ring, boundary
    * inclusive. O(n) per probe; vertices read straight out of Tungsten
    * `ArrayData` (no deserialization).
    */
  def pointInRing(lon: Double, lat: Double, ring: ArrayData): Boolean = {
    val n = ring.numElements()
    if (n < 4) return false
    var inside = false
    var i = 0
    var j = n - 1
    while (i < n) {
      val pi = ring.getStruct(i, 2)
      val pj = ring.getStruct(j, 2)
      val xi = pi.getDouble(0); val yi = pi.getDouble(1)
      val xj = pj.getDouble(0); val yj = pj.getDouble(1)
      // boundary-inclusive: point exactly on edge (i,j)?
      if (onSegment(lon, lat, xi, yi, xj, yj)) return true
      if ((yi > lat) != (yj > lat)) {
        val xCross = (xj - xi) * (lat - yi) / (yj - yi) + xi
        if (lon < xCross) inside = !inside
      }
      j = i
      i += 1
    }
    inside
  }

  private def onSegment(px: Double, py: Double, ax: Double, ay: Double,
                        bx: Double, by: Double): Boolean = {
    val len2 = (bx - ax) * (bx - ax) + (by - ay) * (by - ay)
    // zero-length edge (e.g. the ring's duplicated closing vertex): the
    // "segment" is a single point — contains only that exact point
    if (len2 == 0.0) return px == ax && py == ay
    val cross = (bx - ax) * (py - ay) - (by - ay) * (px - ax)
    if (cross != 0.0) return false
    val dot = (px - ax) * (bx - ax) + (py - ay) * (by - ay)
    dot >= 0.0 && dot <= len2
  }

  /** Ray-cast over a flat [x0,y0,x1,y1,…] closed-ring array — same
    * semantics as the ArrayData variant; pure function (thread-safe, no
    * allocation), used by the broadcast R-tree probe.
    */
  def pointInFlatRing(lon: Double, lat: Double, ring: Array[Double]): Boolean = {
    val n = ring.length / 2
    if (n < 4) return false
    var inside = false
    var i = 0
    var j = n - 1
    while (i < n) {
      val xi = ring(2 * i); val yi = ring(2 * i + 1)
      val xj = ring(2 * j); val yj = ring(2 * j + 1)
      if (onSegment(lon, lat, xi, yi, xj, yj)) return true
      if ((yi > lat) != (yj > lat)) {
        val xCross = (xj - xi) * (lat - yi) / (yj - yi) + xi
        if (lon < xCross) inside = !inside
      }
      j = i
      i += 1
    }
    inside
  }

  /** Offset/length variant over one concatenated ring buffer — the probe
    * kernel of [[graft.index.FlatRtree]] (no per-ring array objects).
    */
  def pointInFlatRing(lon: Double, lat: Double, data: Array[Double],
                      off: Int, len: Int): Boolean = {
    val n = len / 2
    if (n < 4) return false
    var inside = false
    var i = 0
    var j = n - 1
    while (i < n) {
      val xi = data(off + 2 * i); val yi = data(off + 2 * i + 1)
      val xj = data(off + 2 * j); val yj = data(off + 2 * j + 1)
      if (onSegment(lon, lat, xi, yi, xj, yj)) return true
      if ((yi > lat) != (yj > lat)) {
        val xCross = (xj - xi) * (lat - yi) / (yj - yi) + xi
        if (lon < xCross) inside = !inside
      }
      j = i
      i += 1
    }
    inside
  }

  /** Squared euclidean distance in degree space (the engine's kNN metric —
    * monotone in true distance at fixture scale; documented semantic).
    */
  def sqDistDeg(lon1: Double, lat1: Double, lon2: Double, lat2: Double): Double = {
    val dx = lon1 - lon2; val dy = lat1 - lat2
    dx * dx + dy * dy
  }

  /** 64-bit average-hash of an 8x8 grayscale downsample, operating on the
    * engine's deterministic raw-raster payload (see graft.media.Media).
    */
  def aHash64(gray8x8: Array[Int]): Long = {
    var sum = 0L
    var i = 0
    while (i < 64) { sum += gray8x8(i); i += 1 }
    val avg = sum / 64
    var h = 0L
    i = 0
    while (i < 64) { if (gray8x8(i) > avg) h |= 1L << i; i += 1 }
    h
  }

  /** Hamming distance between two 64-bit hashes (phash/simhash distance). */
  def hamming64(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)
}
