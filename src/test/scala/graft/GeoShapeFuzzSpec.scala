package graft

import org.scalacheck.{Gen, Prop, Test => ScTest}
import org.scalacheck.Prop.forAll
import org.apache.spark.sql.functions._

import graft.operators.Geo

/** Property fuzz for the geo_shape relation classifier: the Column
  * compiler vs an independent naive Scala computational-geometry
  * reference (point-in-polygon ray cast, segment-vs-rect SAT, the
  * within/contains/intersects/disjoint decision tree transcribed
  * directly from the documented semantics). Random envelopes on the
  * exact quarter grid vs the shared concave hexagon and a convex
  * triangle. */
class GeoShapeFuzzSpec extends SparkSpec {
  import spark.implicits._

  private val hex = Seq((0.0, -50.0), (40.0, -10.0), (5.0, 5.0),
    (10.0, 60.0), (-30.0, 40.0), (-45.0, -25.0))
  private val tri = Seq((10.0, 20.0), (10.5, 20.25), (10.25, 20.5))

  // ---- naive reference (same algebra, independent code) ----------------

  private def rayCast(lat: Double, lon: Double, poly: Seq[(Double, Double)]): Boolean = {
    val n = poly.length
    var crossings = 0
    for (i <- 0 until n) {
      val (y1, x1) = poly(i); val (y2, x2) = poly((i + 1) % n)
      if ((y1 > lat) != (y2 > lat) &&
          lon < (x2 - x1) * (lat - y1) / (y2 - y1) + x1) crossings += 1
    }
    crossings % 2 == 1
  }

  private def edgeCutsRect(y1: Double, x1: Double, y2: Double, x2: Double,
      laMin: Double, laMax: Double, loMin: Double, loMax: Double): Boolean = {
    val bbox = math.max(y1, y2) >= laMin && math.min(y1, y2) <= laMax &&
      math.max(x1, x2) >= loMin && math.min(x1, x2) <= loMax
    if (!bbox) return false
    def cross(cy: Double, cx: Double) = (x2 - x1) * (cy - y1) - (y2 - y1) * (cx - x1)
    val cs = Seq((laMin, loMin), (laMin, loMax), (laMax, loMin), (laMax, loMax))
      .map { case (cy, cx) => cross(cy, cx) }
    !(cs.forall(_ > 0) || cs.forall(_ < 0))
  }

  private def naiveRelation(poly: Seq[(Double, Double)],
      laMin: Double, laMax: Double, loMin: Double, loMax: Double): String = {
    val corners = Seq((laMin, loMin), (laMin, loMax), (laMax, loMin), (laMax, loMax))
    val cornerIn = corners.map { case (cy, cx) => rayCast(cy, cx, poly) }
    val anyEdgeCut = poly.indices.exists { i =>
      val (y1, x1) = poly(i); val (y2, x2) = poly((i + 1) % poly.length)
      edgeCutsRect(y1, x1, y2, x2, laMin, laMax, loMin, loMax)
    }
    val vertexIn = poly.map { case (vy, vx) =>
      vy >= laMin && vy <= laMax && vx >= loMin && vx <= loMax }
    if (cornerIn.forall(identity) && !anyEdgeCut) "within"
    else if (vertexIn.forall(identity)) "contains"
    else if (cornerIn.exists(identity) || vertexIn.exists(identity) || anyEdgeCut) "intersects"
    else "disjoint"
  }

  // exact quarters near and far from both shapes
  private val q: Gen[Double] = Gen.choose(-260, 260).map(_ * 0.25)
  private val envGen: Gen[(Double, Double, Double, Double)] = for {
    la <- q; lo <- q
    hl <- Gen.choose(1, 20).map(_ * 0.25)
    ho <- Gen.choose(1, 20).map(_ * 0.25)
  } yield (la - hl, la + hl, lo - ho, lo + ho)

  test("random envelopes vs hexagon and triangle: compiler == naive geometry") {
    val prop: Prop = forAll(Gen.listOfN(24, envGen), Gen.oneOf(hex, tri)) { (envs, poly) =>
      val df = envs.zipWithIndex
        .map { case ((a, b, c, d), i) => (i.toLong, a, b, c, d) }
        .toDF("id", "lat_min", "lat_max", "lon_min", "lon_max")
        .withColumn("relation", Geo.envelopeRelation(poly))
      val got = df.collect().map(r => r.getLong(0) -> r.getString(5)).toMap
      val want = envs.zipWithIndex.map { case ((a, b, c, d), i) =>
        i.toLong -> naiveRelation(poly, a, b, c, d) }.toMap
      if (got != want)
        println(s"MISMATCH poly=${poly.take(2)}...\n got=$got\n want=$want")
      got == want
    }
    val res = ScTest.check(ScTest.Parameters.default.withMinSuccessfulTests(30), prop)
    assert(res.passed, res.status.toString)
  }
}
