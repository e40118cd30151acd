package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.catalyst.InternalRow
import org.locationtech.jts.geom.{Coordinate, GeometryFactory}
import graft.expr.GeoMath

/** Point-in-ring kernel vs the JTS oracle (boundary-inclusive `covers`). */
class GeoMathSpec extends AnyFunSuite {

  private val gf = new GeometryFactory()

  private def toArrayData(ring: Seq[(Double, Double)]): GenericArrayData =
    new GenericArrayData(ring.map { case (x, y) => InternalRow(x, y) }.toArray)

  private def jtsCovers(ring: Seq[(Double, Double)], px: Double, py: Double): Boolean = {
    val poly = gf.createPolygon(ring.map { case (x, y) => new Coordinate(x, y) }.toArray)
    poly.covers(gf.createPoint(new Coordinate(px, py)))
  }

  private val square = Seq((0.0, 0.0), (10.0, 0.0), (10.0, 10.0), (0.0, 10.0), (0.0, 0.0))

  test("square: inside / outside / edges / vertices (boundary-inclusive)") {
    val ad = toArrayData(square)
    assert(GeoMath.pointInRing(5.0, 5.0, ad))
    assert(!GeoMath.pointInRing(-1.0, 5.0, ad))
    assert(!GeoMath.pointInRing(11.0, 5.0, ad))
    assert(GeoMath.pointInRing(0.0, 5.0, ad), "left edge")
    assert(GeoMath.pointInRing(10.0, 5.0, ad), "right edge")
    assert(GeoMath.pointInRing(5.0, 0.0, ad), "bottom edge")
    assert(GeoMath.pointInRing(5.0, 10.0, ad), "top edge")
    assert(GeoMath.pointInRing(0.0, 0.0, ad), "vertex (also the closing dup)")
    assert(GeoMath.pointInRing(10.0, 10.0, ad), "vertex")
  }

  test("degenerate rings are rejected") {
    assert(!GeoMath.pointInRing(0.0, 0.0, toArrayData(Seq((0.0, 0.0), (1.0, 1.0), (0.0, 0.0)))))
  }

  test("concave polygon") {
    // U-shape: notch at the top
    val u = Seq((0.0, 0.0), (10.0, 0.0), (10.0, 10.0), (6.0, 10.0), (6.0, 4.0),
      (4.0, 4.0), (4.0, 10.0), (0.0, 10.0), (0.0, 0.0))
    val ad = toArrayData(u)
    assert(GeoMath.pointInRing(2.0, 8.0, ad), "left arm")
    assert(GeoMath.pointInRing(8.0, 8.0, ad), "right arm")
    assert(!GeoMath.pointInRing(5.0, 8.0, ad), "inside the notch")
    assert(GeoMath.pointInRing(5.0, 2.0, ad), "base")
  }

  test("matches JTS covers on seeded random star polygons (interior/exterior)") {
    val rnd = new scala.util.Random(42)
    (1 to 60).foreach { _ =>
      val cx = rnd.nextDouble() * 100 - 50
      val cy = rnd.nextDouble() * 80 - 40
      val m = 5 + rnd.nextInt(8)
      val verts = (0 until m).map { k =>
        val ang = 2 * math.Pi * k / m
        val r = 1.0 + rnd.nextDouble() * 4.0
        (cx + r * math.cos(ang), cy + r * math.sin(ang))
      }
      val ring = verts :+ verts.head
      val ad = toArrayData(ring)
      (1 to 50).foreach { _ =>
        val px = cx + (rnd.nextDouble() - 0.5) * 14
        val py = cy + (rnd.nextDouble() - 0.5) * 14
        // skip near-boundary points: JTS uses exact predicates, our ray-cast
        // uses doubles — equality holds except within float-noise of edges
        val poly = gf.createPolygon(ring.map { case (x, y) => new Coordinate(x, y) }.toArray)
        val d = poly.getBoundary.distance(gf.createPoint(new Coordinate(px, py)))
        if (d > 1e-9) {
          assert(GeoMath.pointInRing(px, py, ad) === jtsCovers(ring, px, py),
            s"disagree at ($px,$py) ring=$ring")
        }
      }
    }
  }

  test("hamming64") {
    assert(GeoMath.hamming64(0L, 0L) === 0)
    assert(GeoMath.hamming64(-1L, 0L) === 64)
    assert(GeoMath.hamming64(0xf0L, 0x0fL) === 8)
  }
}
