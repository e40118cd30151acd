package graft.index

import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.catalyst.util.ArrayData

import graft.expr.GeoMath

/** Packed R-tree over polygon rings in primitive arrays — the broadcast
  * side of [[graft.join.SpatialJoin.broadcastRtreeJoin]].
  *
  * Realizes the reference's latent R-tree field
  * (`/root/reference/osm/Planet.go:36,50` — constructed, never queried) in
  * a layout built for concurrent probing from whole-stage-codegen'd code:
  *
  *  - entries sorted by Morton code of their bbox center, packed bottom-up
  *    into implicit-fanout levels (node k's children are the contiguous
  *    range [k·F, (k+1)·F) one level down), so there are no child pointers
  *    and traversal is pure index arithmetic over flat double[] bboxes;
  *  - ring vertices live in ONE concatenated double[] with offsets, so a
  *    probe touches no object graph and allocates nothing until the final
  *    exact-size result copy;
  *  - the bbox test and the exact even-odd point-in-ring refinement are
  *    fused in the probe, one thread-local scratch buffer per thread.
  *
  * Unlike JTS STRtree (object nodes, ArrayList query results, per-query
  * Envelope allocation), a probe here is allocation-free, which is what the
  * 32-thread scaling of the broadcast join is bound by.
  */
final class FlatRtree private (
    val fanout: Int,
    val ids: Array[Long],
    entMinX: Array[Double], entMinY: Array[Double],
    entMaxX: Array[Double], entMaxY: Array[Double],
    ringData: Array[Double], ringStart: Array[Int],
    levelSizes: Array[Int], levelOffsets: Array[Int],
    nodeMinX: Array[Double], nodeMinY: Array[Double],
    nodeMaxX: Array[Double], nodeMaxY: Array[Double]) extends Serializable {

  def size: Int = ids.length

  @transient private lazy val tlOut: ThreadLocal[Array[Long]] =
    ThreadLocal.withInitial(() => new Array[Long](64))
  @transient private lazy val tlStack: ThreadLocal[Array[Long]] =
    ThreadLocal.withInitial(() => new Array[Long](64 * 64))

  /** Ids of all rings containing the point, into `out` (grown copy returned). */
  private def probeInto(lon: Double, lat: Double): (Array[Long], Int) = {
    var out = tlOut.get()
    var n = 0
    def emit(id: Long): Unit = {
      if (n == out.length) {
        out = java.util.Arrays.copyOf(out, out.length * 2)
        tlOut.set(out)
      }
      out(n) = id
      n += 1
    }
    def scanEntries(from: Int, until: Int): Unit = {
      var e = from
      while (e < until) {
        if (lon >= entMinX(e) && lon <= entMaxX(e) &&
            lat >= entMinY(e) && lat <= entMaxY(e) &&
            GeoMath.pointInFlatRing(lon, lat, ringData, ringStart(e),
              ringStart(e + 1) - ringStart(e))) {
          emit(ids(e))
        }
        e += 1
      }
    }
    if (ids.length == 0) return (out, 0)
    if (levelSizes.length == 0) { scanEntries(0, ids.length); return (out, n) }

    val stack = tlStack.get()
    var sp = 0
    val top = levelSizes.length - 1
    stack(sp) = top.toLong << 40; sp += 1 // root (level sizes build to 1)
    while (sp > 0) {
      sp -= 1
      val packed = stack(sp)
      val lvl = (packed >>> 40).toInt
      val idx = (packed & 0xffffffffffL).toInt
      val off = levelOffsets(lvl)
      if (lon >= nodeMinX(off + idx) && lon <= nodeMaxX(off + idx) &&
          lat >= nodeMinY(off + idx) && lat <= nodeMaxY(off + idx)) {
        val childFrom = idx * fanout
        if (lvl == 0) {
          scanEntries(childFrom, math.min(childFrom + fanout, ids.length))
        } else {
          val childUntil = math.min(childFrom + fanout, levelSizes(lvl - 1))
          var c = childFrom
          while (c < childUntil) {
            stack(sp) = ((lvl - 1).toLong << 40) | c.toLong; sp += 1
            c += 1
          }
        }
      }
    }
    (out, n)
  }

  /** Probe returning ids as a Catalyst array — the codegen entry point. */
  def probeArray(lon: Double, lat: Double): ArrayData = {
    val (buf, n) = probeInto(lon, lat)
    UnsafeArrayData.fromPrimitiveArray(java.util.Arrays.copyOf(buf, n))
  }

  /** Probe as a plain array (tests / non-Catalyst callers). */
  def probeIds(lon: Double, lat: Double): Array[Long] = {
    val (buf, n) = probeInto(lon, lat)
    java.util.Arrays.copyOf(buf, n)
  }
}

object FlatRtree {

  /** Interleave two 16-bit ints (Morton) for center-order packing. Long
    * result — truncating to Int would wrap the upper half of the y range
    * negative and scramble the packing order.
    */
  private def morton16(x: Int, y: Int): Long = {
    def spread(v0: Int): Long = {
      var v = v0.toLong & 0xffffL
      v = (v | (v << 8)) & 0x00ff00ffL
      v = (v | (v << 4)) & 0x0f0f0f0fL
      v = (v | (v << 2)) & 0x33333333L
      v = (v | (v << 1)) & 0x55555555L
      v
    }
    spread(x) | (spread(y) << 1)
  }

  /** Build from (id, flat closed ring [x0,y0,x1,y1,…]) pairs. */
  def build(polys: Array[(Long, Array[Double])], fanout: Int = 16): FlatRtree = {
    // the probe's thread-local node stack is a fixed 4096 slots; keep the
    // worst push depth (levels x (fanout - 1) + fanout) comfortably inside
    // it instead of risking an AIOOBE deep in an executor task
    require(fanout >= 2 && fanout <= 256, s"rtree fanout $fanout out of [2, 256]")
    val n = polys.length
    val minX = new Array[Double](n); val minY = new Array[Double](n)
    val maxX = new Array[Double](n); val maxY = new Array[Double](n)
    var gMinX = Double.MaxValue; var gMinY = Double.MaxValue
    var gMaxX = -Double.MaxValue; var gMaxY = -Double.MaxValue
    var i = 0
    while (i < n) {
      val flat = polys(i)._2
      var mnx = Double.MaxValue; var mny = Double.MaxValue
      var mxx = -Double.MaxValue; var mxy = -Double.MaxValue
      var j = 0
      while (j < flat.length) {
        if (flat(j) < mnx) mnx = flat(j)
        if (flat(j) > mxx) mxx = flat(j)
        if (flat(j + 1) < mny) mny = flat(j + 1)
        if (flat(j + 1) > mxy) mxy = flat(j + 1)
        j += 2
      }
      minX(i) = mnx; minY(i) = mny; maxX(i) = mxx; maxY(i) = mxy
      if (mnx < gMinX) gMinX = mnx
      if (mny < gMinY) gMinY = mny
      if (mxx > gMaxX) gMaxX = mxx
      if (mxy > gMaxY) gMaxY = mxy
      i += 1
    }

    // pack in Morton order of bbox centers for spatially-coherent nodes
    val sx = if (gMaxX > gMinX) 65535.0 / (gMaxX - gMinX) else 0.0
    val sy = if (gMaxY > gMinY) 65535.0 / (gMaxY - gMinY) else 0.0
    val order = (0 until n).sortBy { e =>
      val cx = (((minX(e) + maxX(e)) / 2 - gMinX) * sx).toInt
      val cy = (((minY(e) + maxY(e)) / 2 - gMinY) * sy).toInt
      morton16(cx, cy)
    }.toArray

    val ids = new Array[Long](n)
    val eMinX = new Array[Double](n); val eMinY = new Array[Double](n)
    val eMaxX = new Array[Double](n); val eMaxY = new Array[Double](n)
    val ringStart = new Array[Int](n + 1)
    var total = 0
    i = 0
    while (i < n) {
      total += polys(order(i))._2.length; i += 1
    }
    val ringData = new Array[Double](total)
    var pos = 0
    i = 0
    while (i < n) {
      val src = order(i)
      ids(i) = polys(src)._1
      eMinX(i) = minX(src); eMinY(i) = minY(src)
      eMaxX(i) = maxX(src); eMaxY(i) = maxY(src)
      ringStart(i) = pos
      System.arraycopy(polys(src)._2, 0, ringData, pos, polys(src)._2.length)
      pos += polys(src)._2.length
      i += 1
    }
    ringStart(n) = pos

    // implicit-fanout levels bottom-up until a single root
    val sizes = scala.collection.mutable.ArrayBuffer.empty[Int]
    val nMinX = scala.collection.mutable.ArrayBuffer.empty[Double]
    val nMinY = scala.collection.mutable.ArrayBuffer.empty[Double]
    val nMaxX = scala.collection.mutable.ArrayBuffer.empty[Double]
    val nMaxY = scala.collection.mutable.ArrayBuffer.empty[Double]
    val offsets = scala.collection.mutable.ArrayBuffer.empty[Int]

    var childSize = n
    var childIsEntries = true
    var childOffset = 0
    while (childSize > 1 || (childIsEntries && n > 0 && sizes.isEmpty)) {
      val parentSize = (childSize + fanout - 1) / fanout
      offsets += nMinX.length
      var p = 0
      while (p < parentSize) {
        var mnx = Double.MaxValue; var mny = Double.MaxValue
        var mxx = -Double.MaxValue; var mxy = -Double.MaxValue
        val from = p * fanout
        val until = math.min(from + fanout, childSize)
        var c = from
        while (c < until) {
          val (cmnx, cmny, cmxx, cmxy) =
            if (childIsEntries) (eMinX(c), eMinY(c), eMaxX(c), eMaxY(c))
            else (nMinX(childOffset + c), nMinY(childOffset + c),
              nMaxX(childOffset + c), nMaxY(childOffset + c))
          if (cmnx < mnx) mnx = cmnx
          if (cmny < mny) mny = cmny
          if (cmxx > mxx) mxx = cmxx
          if (cmxy > mxy) mxy = cmxy
          c += 1
        }
        nMinX += mnx; nMinY += mny; nMaxX += mxx; nMaxY += mxy
        p += 1
      }
      sizes += parentSize
      childOffset = offsets.last
      childSize = parentSize
      childIsEntries = false
      if (parentSize == 1) childSize = 1 // loop exits
    }

    new FlatRtree(fanout, ids, eMinX, eMinY, eMaxX, eMaxY, ringData, ringStart,
      sizes.toArray, offsets.toArray,
      nMinX.toArray, nMinY.toArray, nMaxX.toArray, nMaxY.toArray)
  }
}
