package graft.index

/** Pure-JVM hierarchical cell index over Web-Mercator slippy-map tiles.
  *
  * The math generalizes the reference's latent tiling primitive
  * (`/root/reference/osm/Node.go:26-33`, `Node.Tile(z)`):
  *   x = floor((180 + lon) / 360 * 2^z)
  *   y = floor((1 - ln(tan(latRad) + sec(latRad)) / pi) / 2 * 2^z)
  *
  * A *cell id* packs the z-order (Morton) interleave of (x, y) together with
  * the zoom level into one Long:
  *
  *   cellId = (morton(x, y) << 5) | z          (z in [0, 29])
  *
  * Morton interleave makes the id prefix-hierarchical: a parent's bit string
  * is a strict prefix of all of its children's, so
  *   - range predicates on cellId prune by spatial containment
  *     (bbox -> cell-prefix partition pruning), and
  *   - `repartitionByRange` on cellId co-locates spatially adjacent data.
  *
  * This replaces H3/S2 (no such jar exists in this environment) with the
  * quadtree scheme the reference itself encodes.
  */
object CellIndex {

  val MaxZ = 29
  /** Width of the zoom field in a packed cell id (cellId = morton << ZoomBits | z). */
  val ZoomBits = 5
  val MinLat: Double = -85.05112878
  val MaxLat: Double = 85.05112878

  /** Slippy-map tile x at zoom z. Result clamped to [0, 2^z - 1]. */
  def tileX(lon: Double, z: Int): Long = {
    val n = 1L << z
    val x = math.floor((lon + 180.0) / 360.0 * n).toLong
    clamp(x, n)
  }

  /** Slippy-map tile y at zoom z (Web-Mercator). Clamped to [0, 2^z - 1]. */
  def tileY(lat: Double, z: Int): Long = {
    val n = 1L << z
    val latR = math.toRadians(clampLat(lat))
    val y = math.floor((1.0 - math.log(math.tan(latR) + 1.0 / math.cos(latR)) / math.Pi) / 2.0 * n).toLong
    clamp(y, n)
  }

  private def clamp(v: Long, n: Long): Long = if (v < 0) 0L else if (v >= n) n - 1 else v
  private def clampLat(lat: Double): Double =
    if (lat < MinLat) MinLat else if (lat > MaxLat) MaxLat else lat

  /** Morton (z-order) interleave of x (even bits) and y (odd bits). */
  def morton(x: Long, y: Long, z: Int): Long = {
    var m = 0L
    var i = 0
    while (i < z) {
      m |= ((x >> i) & 1L) << (2 * i)
      m |= ((y >> i) & 1L) << (2 * i + 1)
      i += 1
    }
    m
  }

  def mortonX(m: Long, z: Int): Long = {
    var x = 0L; var i = 0
    while (i < z) { x |= ((m >> (2 * i)) & 1L) << i; i += 1 }
    x
  }

  def mortonY(m: Long, z: Int): Long = {
    var y = 0L; var i = 0
    while (i < z) { y |= ((m >> (2 * i + 1)) & 1L) << i; i += 1 }
    y
  }

  /** Pack (x, y, z) into a cell id. */
  def pack(x: Long, y: Long, z: Int): Long = (morton(x, y, z) << 5) | z.toLong

  /** Cell id of the point (lon, lat) at zoom z. */
  def cellId(lon: Double, lat: Double, z: Int): Long =
    pack(tileX(lon, z), tileY(lat, z), z)

  def zOf(cell: Long): Int = (cell & 31L).toInt
  def xOf(cell: Long): Long = mortonX(cell >>> 5, zOf(cell))
  def yOf(cell: Long): Long = mortonY(cell >>> 5, zOf(cell))

  /** Parent cell one level up (identity at z = 0). */
  def parent(cell: Long): Long = {
    val z = zOf(cell)
    if (z == 0) cell else (((cell >>> 5) >>> 2) << 5) | (z - 1).toLong
  }

  /** Column form of [[parent]] for cells whose zoom is known statically to
    * be `childZ` (> 0). Packed ids are non-negative, so dropping the zoom
    * field plus one Morton quad is a single shiftright by ZoomBits + 2.
    * Shares the bit layout with [[pack]]/[[parent]] — do not re-encode it
    * inline at call sites.
    */
  def parentCol(cell: org.apache.spark.sql.Column, childZ: Int): org.apache.spark.sql.Column =
    ancestorCol(cell, childZ, childZ - 1)

  /** Column form of [[ancestor]] for cells whose zoom is known statically
    * to be `fromZ`: drop `fromZ - toZ` Morton quads, re-tag the zoom.
    * Packed ids are non-negative, so this is a single shiftright. Shares
    * the bit layout with [[pack]] — do not re-encode it inline at call
    * sites.
    */
  def ancestorCol(cell: org.apache.spark.sql.Column, fromZ: Int, toZ: Int): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions.{lit, shiftright}
    require(toZ >= 0 && toZ <= fromZ && fromZ <= MaxZ,
      s"ancestorCol: need 0 <= toZ <= fromZ <= $MaxZ, got fromZ=$fromZ toZ=$toZ")
    shiftright(cell, ZoomBits + 2 * (fromZ - toZ)) * lit(1L << ZoomBits) + lit(toZ.toLong)
  }

  /** Ancestor at the given zoom (must be <= cell's zoom). */
  def ancestor(cell: Long, z: Int): Long = {
    val cz = zOf(cell)
    require(z <= cz, s"ancestor zoom $z > cell zoom $cz")
    (((cell >>> 5) >>> (2 * (cz - z))) << 5) | z.toLong
  }

  /** The four children one level down. Guarded like [[ancestor]]: at MaxZ
    * the shifted Morton code would overflow past bit 63 and pack corrupt
    * ids that silently match wrong cells. */
  def children(cell: Long): Array[Long] = {
    val z = zOf(cell)
    require(z < MaxZ, s"children: cell already at max zoom $MaxZ")
    val base = (cell >>> 5) << 2
    Array.tabulate(4)(d => ((base | d.toLong) << 5) | (z + 1).toLong)
  }

  /** Lon/lat bounds of a cell: (minLon, minLat, maxLon, maxLat). */
  def bounds(cell: Long): (Double, Double, Double, Double) = {
    val z = zOf(cell); val x = xOf(cell); val y = yOf(cell)
    val n = (1L << z).toDouble
    val minLon = x / n * 360.0 - 180.0
    val maxLon = (x + 1) / n * 360.0 - 180.0
    val maxLat = yToLat(y.toDouble, n)
    val minLat = yToLat((y + 1).toDouble, n)
    (minLon, minLat, maxLon, maxLat)
  }

  private def yToLat(y: Double, n: Double): Double = {
    val t = math.Pi * (1.0 - 2.0 * y / n)
    math.toDegrees(math.atan(math.sinh(t)))
  }

  /** Cells at Chebyshev tile distance exactly k from the center cell
    * (k = 0 is the cell itself). X wraps around the antimeridian; Y is
    * clamped (out-of-range rows skipped). Used by kNN ring expansion.
    */
  def ring(cell: Long, k: Int): Array[Long] = {
    val z = zOf(cell); val cx = xOf(cell); val cy = yOf(cell)
    val n = 1L << z
    if (k == 0) return Array(cell)
    val out = Array.newBuilder[Long]
    var dx = -k
    while (dx <= k) {
      var dy = -k
      while (dy <= k) {
        if (math.max(math.abs(dx), math.abs(dy)) == k) {
          val y = cy + dy
          if (y >= 0 && y < n) {
            val x = java.lang.Math.floorMod(cx + dx, n)
            out += pack(x, y, z)
          }
        }
        dy += 1
      }
      dx += 1
    }
    // wrap-around can alias cells when 2k+1 > 2^z; dedupe so ring joins
    // never double-count a candidate
    out.result().distinct
  }

  /** Lower bound on squared degree-distance from (lon, lat) to ANY cell of
    * ring(cell, k). +Infinity when the ring is empty (fully clipped) —
    * which correctly terminates kNN expansion.
    *
    * When 2k+1 > 2^z the x-wrap aliases ring cells back onto interior
    * cells (k a multiple of 2^z even onto the center), dragging the bound
    * toward 0 — always CONSERVATIVE (a lower bound stays a lower bound),
    * so kNN never terminates early; it just stops proving queries past the
    * wrap radius, which is why cellRing hands persistent stragglers to the
    * exact scan finisher instead of looping on this bound.
    */
  def minSqDistToRing(lon: Double, lat: Double, cell: Long, k: Int): Double = {
    val cells = ring(cell, k)
    var m = Double.PositiveInfinity
    var i = 0
    while (i < cells.length) {
      val d = minSqDistDeg(lon, lat, cells(i))
      if (d < m) m = d
      i += 1
    }
    m
  }

  /** All cells at zoom z covering the given lon/lat bbox (inclusive).
    * Handles bboxes that straddle the antimeridian when minLon > maxLon.
    */
  def cover(minLon: Double, minLat: Double, maxLon: Double, maxLat: Double, z: Int): Array[Long] = {
    val y0 = tileY(maxLat, z) // north edge -> smaller y
    val y1 = tileY(minLat, z)
    val n = 1L << z
    val xs: Array[Long] = {
      val raw =
        if (minLon <= maxLon) (tileX(minLon, z) to tileX(maxLon, z)).toArray
        else ((tileX(minLon, z) until n) ++ (0L to tileX(maxLon, z))).toArray
      // a wrap bbox whose two lon segments overlap (edges in the same or
      // crossing tiles, or any wrap at z=0) enumerates tiles on both
      // sides — dedupe, or an explode+equi-join over the covering
      // double-counts its matches (ring() dedupes for the same reason)
      if (minLon > maxLon) raw.distinct else raw
    }
    val cells = xs.length.toLong * (y1 - y0 + 1)
    require(cells <= (1L << 26),
      s"cover: $cells cells at z=$z — enumeration would not fit; use coverRanges")
    val out = new Array[Long](cells.toInt)
    var i = 0
    var yi = y0
    while (yi <= y1) {
      var xi = 0
      while (xi < xs.length) { out(i) = pack(xs(xi), yi, z); i += 1; xi += 1 }
      yi += 1
    }
    out
  }

  /** Inclusive cellId RANGES at zoom z covering the bbox — the quadtree
    * decomposition of the tile rectangle into maximal aligned squares. A
    * square at level l contains exactly the zoom-z cells whose Morton codes
    * form one contiguous block (`[m << 2(z-l), (m+1) << 2(z-l))`), and with
    * the zoom fixed per column the packed cellIds of that block form one
    * contiguous BETWEEN — so a bbox over a fine-zoom cell column becomes a
    * handful of range predicates where the flat [[cover]] enumeration would
    * explode (2^2z cells).
    *
    * `budget` bounds explored quadtree nodes: on exhaustion a partially
    * covered square emits its FULL range — an over-approximation, so the
    * result is always a superset covering (safe for pruning). Output is
    * sorted and adjacent-merged; `maxRanges` caps the count by greedily
    * merging the smallest gaps (again a safe superset).
    */
  def coverRanges(minLon: Double, minLat: Double, maxLon: Double, maxLat: Double,
                  z: Int, budget: Int = 1024, maxRanges: Int = 64): Array[(Long, Long)] = {
    val y0 = tileY(maxLat, z) // north edge -> smaller y
    val y1 = tileY(minLat, z)
    val n = 1L << z
    val xRects: Seq[(Long, Long)] =
      if (minLon <= maxLon) Seq((tileX(minLon, z), tileX(maxLon, z)))
      else Seq((tileX(minLon, z), n - 1), (0L, tileX(maxLon, z)))
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    var nodes = 0
    def emit(sx: Long, sy: Long, l: Int): Unit = {
      val s = z - l
      val mLo = morton(sx, sy, l) << (2 * s)
      val mHi = mLo + (1L << (2 * s)) - 1
      out += (((mLo << 5) | z.toLong, (mHi << 5) | z.toLong))
    }
    def rec(sx: Long, sy: Long, l: Int, x0: Long, x1: Long): Unit = {
      val s = z - l
      val tx0 = sx << s; val tx1 = ((sx + 1) << s) - 1
      val ty0 = sy << s; val ty1 = ((sy + 1) << s) - 1
      if (tx1 < x0 || tx0 > x1 || ty1 < y0 || ty0 > y1) return // disjoint
      if ((tx0 >= x0 && tx1 <= x1 && ty0 >= y0 && ty1 <= y1) || l == z) {
        emit(sx, sy, l) // fully contained, or a leaf cell touching the rect
        return
      }
      nodes += 1
      if (nodes > budget) { emit(sx, sy, l); return } // over-approximate
      // children in ascending Morton order: (dx, dy) = (0,0) (1,0) (0,1) (1,1)
      rec(2 * sx, 2 * sy, l + 1, x0, x1)
      rec(2 * sx + 1, 2 * sy, l + 1, x0, x1)
      rec(2 * sx, 2 * sy + 1, l + 1, x0, x1)
      rec(2 * sx + 1, 2 * sy + 1, l + 1, x0, x1)
    }
    xRects.foreach { case (x0, x1) => rec(0, 0, 0, x0, x1) }
    val sorted = out.sortBy(_._1).toArray
    // merge adjacent blocks: consecutive Morton codes differ by 32 in cellId
    val merged = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    sorted.foreach { r =>
      if (merged.nonEmpty && r._1 <= merged.last._2 + 32)
        merged(merged.length - 1) = (merged.last._1, math.max(merged.last._2, r._2))
      else merged += r
    }
    if (merged.length <= maxRanges) merged.toArray
    else {
      // keep the (maxRanges - 1) largest gaps as boundaries; bridge the rest
      val keep = (1 until merged.length)
        .sortBy(i => -(merged(i)._1 - merged(i - 1)._2)).take(maxRanges - 1).toSet
      val capped = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
      merged.zipWithIndex.foreach { case (r, i) =>
        if (i == 0 || keep(i)) capped += r
        else capped(capped.length - 1) = (capped.last._1, r._2)
      }
      capped.toArray
    }
  }

  /** Lower bound on squared euclidean degree-distance from a point to any
    * point inside the cell (0 if the point is inside). The kNN ring
    * expansion terminates when this bound for the next ring exceeds the
    * current kth-best distance.
    */
  def minSqDistDeg(lon: Double, lat: Double, cell: Long): Double = {
    val (minLon, minLat, maxLon, maxLat) = bounds(cell)
    val dLon = if (lon < minLon) minLon - lon else if (lon > maxLon) lon - maxLon else 0.0
    val dLat = if (lat < minLat) minLat - lat else if (lat > maxLat) lat - maxLat else 0.0
    dLon * dLon + dLat * dLat
  }

  /** Quadkey digit string ("0123…") — interoperable debug form. */
  def quadKeyString(cell: Long): String = {
    val z = zOf(cell); val m = cell >>> 5
    val sb = new StringBuilder
    var i = z - 1
    while (i >= 0) { sb.append(((m >> (2 * i)) & 3L).toString); i -= 1 }
    sb.toString
  }
}
