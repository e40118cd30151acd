package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.index.CellIndex

class CellIndexSpec extends AnyFunSuite {

  // Oracle: the reference's Node.Tile formulas (/root/reference/osm/Node.go:27-30)
  private def refTile(lon: Double, lat: Double, z: Int): (Long, Long) = {
    val n = math.pow(2.0, z)
    val x = math.floor((lon + 180.0) / 360.0 * n).toLong
    val latR = math.toRadians(lat)
    val y = math.floor((1.0 - math.log(math.tan(latR) + 1.0 / math.cos(latR)) / math.Pi) / 2.0 * n).toLong
    (x, y)
  }

  /** Deterministic property sampling (seed fixed; no scalatest-scalacheck
    * bridge exists in the offline cache).
    */
  private def samples(n: Int = 500)(body: (Double, Double, Int) => Unit): Unit = {
    val rnd = new scala.util.Random(42)
    (1 to n).foreach { _ =>
      val lon = rnd.nextDouble() * 359.98 - 179.99
      val lat = rnd.nextDouble() * 169.8 - 84.9
      val z = 1 + rnd.nextInt(18)
      body(lon, lat, z)
    }
  }

  test("tile math matches reference formula on known points") {
    assert(CellIndex.tileX(0.0, 1) === 1L)
    assert(CellIndex.tileY(0.0, 1) === 1L)
    assert(CellIndex.tileX(-180.0, 1) === 0L)
    // Washington DC (reference golden dataset center) at z=10
    val (x, y) = refTile(-77.03, 38.89, 10)
    assert(CellIndex.tileX(-77.03, 10) === x)
    assert(CellIndex.tileY(38.89, 10) === y)
  }

  test("tile x/y match reference formula (sampled property)") {
    samples() { (lon, lat, z) =>
      val (x, y) = refTile(lon, lat, z)
      assert(CellIndex.tileX(lon, z) === x, s"x @($lon,$z)")
      assert(CellIndex.tileY(lat, z) === y, s"y @($lat,$z)")
    }
  }

  test("morton roundtrip") {
    val rnd = new scala.util.Random(7)
    (1 to 500).foreach { _ =>
      val x = rnd.nextLong() & ((1L << 20) - 1)
      val y = rnd.nextLong() & ((1L << 20) - 1)
      val m = CellIndex.morton(x, y, 20)
      assert(CellIndex.mortonX(m, 20) === x)
      assert(CellIndex.mortonY(m, 20) === y)
    }
  }

  test("cell id roundtrips z/x/y") {
    samples() { (lon, lat, z) =>
      val c = CellIndex.cellId(lon, lat, z)
      assert(CellIndex.zOf(c) === z)
      assert(CellIndex.xOf(c) === CellIndex.tileX(lon, z))
      assert(CellIndex.yOf(c) === CellIndex.tileY(lat, z))
    }
  }

  test("parent is prefix: point's cell at z is a child of its cell at z-1") {
    samples() { (lon, lat, z) =>
      val child = CellIndex.cellId(lon, lat, z)
      val par = CellIndex.cellId(lon, lat, z - 1)
      assert(CellIndex.parent(child) === par)
      assert(CellIndex.ancestor(child, z - 1) === par)
      assert(CellIndex.children(par).contains(child))
    }
  }

  test("bounds contain the generating point") {
    samples() { (lon, lat, z) =>
      val (minLon, minLat, maxLon, maxLat) = CellIndex.bounds(CellIndex.cellId(lon, lat, z))
      assert(lon >= minLon - 1e-9 && lon <= maxLon + 1e-9)
      assert(lat >= minLat - 1e-7 && lat <= maxLat + 1e-7)
    }
  }

  test("ring(k) sizes and distances") {
    val c = CellIndex.cellId(-77.0, 38.9, 10)
    assert(CellIndex.ring(c, 0).toSeq === Seq(c))
    assert(CellIndex.ring(c, 1).length === 8)
    assert(CellIndex.ring(c, 2).length === 16)
    val cx = CellIndex.xOf(c); val cy = CellIndex.yOf(c)
    CellIndex.ring(c, 3).foreach { r =>
      val d = math.max(math.abs(CellIndex.xOf(r) - cx), math.abs(CellIndex.yOf(r) - cy))
      assert(d === 3)
    }
  }

  test("ring wraps x at the antimeridian and clamps y at poles") {
    val nearDateline = CellIndex.cellId(179.9, 0.0, 5)
    assert(CellIndex.ring(nearDateline, 1).length === 8) // x wrapped, not dropped
    val nearPole = CellIndex.pack(3, 0, 5)
    assert(CellIndex.ring(nearPole, 1).length === 5) // top row clipped
  }

  test("cover of a cell's own bounds includes the cell") {
    samples(200) { (lon, lat, zRaw) =>
      val z = math.min(zRaw, 12)
      val c = CellIndex.cellId(lon, lat, z)
      assert(CellIndex.cover(lon, lat, lon, lat, z).contains(c))
    }
  }

  test("cover straddling the antimeridian") {
    val cells = CellIndex.cover(179.0, -1.0, -179.0, 1.0, 6)
    assert(cells.nonEmpty)
    assert(cells.contains(CellIndex.cellId(179.5, 0.5, 6)))
    assert(cells.contains(CellIndex.cellId(-179.5, 0.5, 6)))
  }

  test("coverRanges equals cover exactly when unconstrained (sampled bboxes)") {
    val rnd = new scala.util.Random(7)
    (1 to 100).foreach { _ =>
      val z = 3 + rnd.nextInt(7)
      val lon0 = rnd.nextDouble() * 300 - 170
      val lat0 = rnd.nextDouble() * 140 - 80
      val lon1 = math.min(179.9, lon0 + rnd.nextDouble() * 40)
      val lat1 = math.min(84.9, lat0 + rnd.nextDouble() * 30)
      val cells = CellIndex.cover(lon0, lat0, lon1, lat1, z).toSet
      val ranges = CellIndex.coverRanges(lon0, lat0, lon1, lat1, z,
        budget = Int.MaxValue, maxRanges = Int.MaxValue)
      // exactness: the union of the ranges is exactly the covered cell set
      val inRanges = (c: Long) => ranges.exists(r => c >= r._1 && c <= r._2)
      assert(cells.forall(inRanges), s"range covering lost cells at z=$z")
      val enumerated = ranges.flatMap { case (lo, hi) => lo.to(hi, 32) }.toSet
      assert(enumerated === cells, s"ranges over/under-cover at z=$z")
      // sorted, disjoint, merged
      ranges.sliding(2).foreach {
        case Array(a, b) => assert(b._1 > a._2 + 32)
        case _ =>
      }
    }
  }

  test("coverRanges under budget/cap pressure stays a superset covering") {
    val (lon0, lat0, lon1, lat1, z) = (-170.0, -60.0, -10.0, 60.0, 12)
    val full = CellIndex.coverRanges(lon0, lat0, lon1, lat1, z,
      budget = Int.MaxValue, maxRanges = Int.MaxValue)
    val capped = CellIndex.coverRanges(lon0, lat0, lon1, lat1, z,
      budget = 512, maxRanges = 16)
    assert(capped.length <= 16)
    // every exact range is inside some capped range (superset covering)
    assert(full.forall(f => capped.exists(c => c._1 <= f._1 && f._2 <= c._2)))
  }

  test("coverRanges straddles the antimeridian") {
    val ranges = CellIndex.coverRanges(179.0, -1.0, -179.0, 1.0, 6)
    def in(c: Long) = ranges.exists(r => c >= r._1 && c <= r._2)
    assert(in(CellIndex.cellId(179.5, 0.5, 6)))
    assert(in(CellIndex.cellId(-179.5, 0.5, 6)))
    assert(!in(CellIndex.cellId(0.0, 0.5, 6)))
  }

  test("minSqDistDeg is 0 inside, positive outside") {
    val c = CellIndex.cellId(10.0, 10.0, 8)
    assert(CellIndex.minSqDistDeg(10.0, 10.0, c) === 0.0)
    assert(CellIndex.minSqDistDeg(50.0, 50.0, c) > 0.0)
  }

  test("quadkey string length equals z, digits 0-3") {
    val c = CellIndex.cellId(-77.0, 38.9, 12)
    assert(CellIndex.quadKeyString(c).length === 12)
    assert(CellIndex.quadKeyString(c).forall("0123".contains(_)))
  }
}
