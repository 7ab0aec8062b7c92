package graft

import org.apache.spark.sql.functions._

import graft.operators.Geo

class GeoSpec extends SparkSpec {

  /** Independent reference: the standard iterative bisection geohash
    * (textbook form), to pin the closed-form bit-interleave encoder. */
  private def refGeohash(lat: Double, lon: Double, precision: Int): String = {
    val base32 = "0123456789bcdefghjkmnpqrstuvwxyz"
    var latLo = -90.0; var latHi = 90.0; var lonLo = -180.0; var lonHi = 180.0
    var even = true; var bit = 0; var ch = 0
    val sb = new StringBuilder
    while (sb.length < precision) {
      if (even) {
        val mid = (lonLo + lonHi) / 2
        if (lon >= mid) { ch = ch * 2 + 1; lonLo = mid } else { ch = ch * 2; lonHi = mid }
      } else {
        val mid = (latLo + latHi) / 2
        if (lat >= mid) { ch = ch * 2 + 1; latLo = mid } else { ch = ch * 2; latHi = mid }
      }
      even = !even; bit += 1
      if (bit == 5) { sb.append(base32(ch)); bit = 0; ch = 0 }
    }
    sb.toString
  }

  test("geohash matches the canonical example and the bisection reference") {
    import spark.implicits._
    // classic canonical point: geohash(57.64911, 10.40744) = u4pruydqqvj
    val probes = Seq(
      (57.64911, 10.40744), (0.0, 0.0), (-33.8688, 151.2093),
      (40.7128, -74.006), (-85.0, -180.0), (84.99, 179.99))
    val df = probes.toDF("lat", "lon")
    for (p <- Seq(2, 4, 6)) {
      val got = df.withColumn("gh", Geo.geohash(col("lat"), col("lon"), p))
        .collect().map(r => (r.getDouble(0), r.getDouble(1)) -> r.getString(2)).toMap
      for ((la, lo) <- probes)
        assert(got((la, lo)) == refGeohash(la, lo, p), s"($la,$lo) p=$p")
    }
    assert(refGeohash(57.64911, 10.40744, 6) == "u4pruy") // self-check vs published value
  }

  test("geohash encodes the exact domain maxima into the maximal cell") {
    import spark.implicits._
    // at lat=90 / lon=180 the unclamped floor lands on cell 2^bits whose
    // low bits are all zero — i.e. the MINIMUM cell. The clamp must pin
    // these to the maximal cell ("zzz…"), matching the bisection form
    // (which never exits the top half-interval for the maximum input).
    val extremes = Seq((90.0, 180.0), (90.0, 0.0), (0.0, 180.0), (90.0, -180.0))
    for (p <- Seq(1, 3, 5)) {
      val got = extremes.toDF("lat", "lon")
        .withColumn("gh", Geo.geohash(col("lat"), col("lon"), p))
        .collect().map(r => (r.getDouble(0), r.getDouble(1)) -> r.getString(2)).toMap
      for ((la, lo) <- extremes)
        assert(got((la, lo)) == refGeohash(la, lo, p), s"($la,$lo) p=$p")
    }
    assert(refGeohash(90.0, 180.0, 4) == "zzzz") // the maximal cell, not "0000"
  }

  test("polygon facet equals a driver-side ray-casting recompute") {
    // same concave hexagon family as the wired query (notch exercises
    // the even-odd rule: 2 crossings = outside again)
    val poly = Seq((0.0, -50.0), (40.0, -10.0), (5.0, 5.0),
      (10.0, 60.0), (-30.0, 40.0), (-45.0, -25.0))
    def inPoly(la: Double, lo: Double): Boolean = {
      var c = 0
      for (i <- poly.indices) {
        val (y1, x1) = poly(i); val (y2, x2) = poly((i + 1) % poly.length)
        if (((y1 > la) != (y2 > la)) && lo < (x2 - x1) * (la - y1) / (y2 - y1) + x1)
          c += 1
      }
      c % 2 == 1
    }
    val pts = Geo.withCoords(Tables.events(spark, sfDir))
    val got = Geo.polygonFacet(pts, poly)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val naive = pts.select("event_type", "lat", "lon").collect()
      .filter(r => inPoly(r.getDouble(1), r.getDouble(2)))
      .groupBy(_.getString(0)).view.mapValues(_.length.toLong).toMap
    assert(got == naive && got.values.sum > 0)
    // membership sanity on the notch: deep inside vs inside the concave cut
    import spark.implicits._
    val probes = Seq((-10.0, 0.0), (20.0, 10.0), (80.0, 0.0))
    val sparkSide = probes.toDF("lat", "lon")
      .withColumn("in", Geo.pointInPolygon(col("lat"), col("lon"), poly))
      .collect().map(r => (r.getDouble(0), r.getDouble(1)) -> r.getBoolean(2)).toMap
    for ((la, lo) <- probes) assert(sparkSide((la, lo)) == inPoly(la, lo), s"($la,$lo)")
    assert(inPoly(-10.0, 0.0) && !inPoly(80.0, 0.0))
  }

  test("geotile_grid: exhaustive boundary-margin proof + naive recompute") {
    val zoom = 3
    val n = (1L << zoom).toDouble
    // the synthetic coordinate domain is FINITE: lat = k/100 - 85 for
    // k in [0, 17000), lon = k/100 - 180 for k in [0, 36000). Enumerate
    // ALL of it — every SF draws from this grid — and measure each tile
    // coordinate's distance to the nearest integer (= floor boundary).
    def frac(t: Double): Double = { val f = t - math.floor(t); math.min(f, 1 - f) }
    val margins = (0 until 17000).map { k =>
      val lat = k / 100.0 - 85.0
      val r = math.toRadians(lat)
      k -> frac((1.0 - math.log(math.tan(r) + 1.0 / math.cos(r)) / math.Pi) / 2.0 * n)
    }
    // only the Mercator y path involves libm (ln/tan/cos); the x path
    // is +,/,× — exactly-rounded IEEE ops both engines share, so x is
    // bit-identical by construction and needs no margin. Cross-libm
    // drift on y is last-ulp scale (~1e-13 in tile units here); 1e-6
    // leaves ~7 orders of safety over the WHOLE input domain. The one
    // zero-margin input is lat = 0 (k = 8500), where the whole chain is
    // IEEE-exact in EVERY libm (tan(0) = 0, cos(0) = 1, ln(1) = 0 are
    // mandated special values), so both engines produce exactly 4.0 and
    // floor identically — exact-integral results need no margin.
    val zeroKs = margins.filter(_._2 == 0.0).map(_._1)
    assert(zeroKs == Seq(8500), s"unexpected exact-edge inputs: $zeroKs")
    val latMargin = margins.filter(_._2 > 0).map(_._2).min
    assert(latMargin > 1e-6, s"lat margin $latMargin")

    // naive recompute of the wired query
    val pts = Geo.withCoords(Tables.events(spark, sfDir))
    val got = Geo.geotileGrid(pts, zoom, 20)
      .collect().map(r => r.getString(0) -> r.getLong(1))
    val naive = pts.select("lat", "lon").collect().map { r =>
      val (la, lo) = (r.getDouble(0), r.getDouble(1))
      val rr = math.toRadians(la)
      val x = math.floor((lo + 180.0) / 360.0 * n).toLong
      val y = math.floor((1.0 - math.log(math.tan(rr) + 1.0 / math.cos(rr)) / math.Pi) / 2.0 * n).toLong
      s"$zoom/$x/$y"
    }.groupBy(identity).view.mapValues(_.length.toLong).toSeq
      .sortBy { case (t, c) => (-c, t) }.take(20)
    assert(got.toSeq == naive && got.nonEmpty)
  }

  test("geo_line equals the plain rank-truncating window form") {
    import org.apache.spark.sql.expressions.Window
    val pts = Geo.withCoords(Tables.events(spark, sfDir))
    val got = Geo.geoLine(pts, 20)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getDouble(2), r.getDouble(3))).toSet
    // reference: the direct window rank (correct, but sorts every
    // group's full history — the shape geoLine's TopKPairs prefilter avoids)
    val w = Window.partitionBy("event_type")
      .orderBy(col("ts_us"), col("event_id"))
    val naive = pts.select(col("event_type"), col("event_id"),
        graft.util.Det.tsMicrosOf(pts, "ts").as("ts_us"), col("lat"), col("lon"))
      .withColumn("seq", row_number().over(w))
      .filter(col("seq") <= 20)
      .select("event_type", "seq", "lat", "lon")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getDouble(2), r.getDouble(3))).toSet
    assert(got == naive && got.nonEmpty)
    // every family contributes a full page (sf0.001 has > 20 events/family)
    val perGroup = got.groupBy(_._1).view.mapValues(_.size).toMap
    assert(perGroup.values.forall(_ == 20), perGroup.toString)
  }

  test("bounding box facet equals a naive filter") {
    val pts = Geo.withCoords(Tables.events(spark, sfDir))
    val got = Geo.boundingBox(pts, -20.0, 40.0, -90.0, 30.0)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val naive = pts.filter(col("lat").between(-20.0, 40.0) &&
        col("lon").between(-90.0, 30.0))
      .groupBy("event_type").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == naive && got.values.sum > 0)
  }

  test("distance top-k equals a driver-side recompute") {
    val pts = Geo.withCoords(Tables.events(spark, sfDir))
    val got = Geo.distanceTopK(pts, 10.0, -30.0, 400.0, 25)
      .collect().map(r => (r.getLong(0), r.getDouble(3)))
    val naive = pts.select("event_id", "lat", "lon").collect()
      .map(r => (r.getLong(0),
        (r.getDouble(1) - 10.0) * (r.getDouble(1) - 10.0) +
          (r.getDouble(2) - -30.0) * (r.getDouble(2) - -30.0)))
      .filter(_._2 <= 400.0).sortBy(p => (p._2, p._1)).take(25)
    assert(got.toSeq == naive.toSeq && got.nonEmpty)
  }

  test("distance rings partition all points and match a naive recompute") {
    val pts = Geo.withCoords(Tables.events(spark, sfDir))
    val edges = Seq(25.0, 100.0, 400.0, 1600.0)
    val got = Geo.distanceRings(pts, 10.0, -30.0, edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.keySet == (0L to edges.size.toLong).toSet, "every ring emitted")
    assert(got.values.sum == pts.count(), "rings partition the points")
    val naive = pts.select("lat", "lon").collect()
      .map { r =>
        val d2 = (r.getDouble(0) - 10.0) * (r.getDouble(0) - 10.0) +
          (r.getDouble(1) - -30.0) * (r.getDouble(1) - -30.0)
        edges.indexWhere(d2 < _) match { case -1 => edges.size.toLong; case i => i.toLong }
      }
      .groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    assert((0L to edges.size.toLong).forall(r => got(r) == naive.getOrElse(r, 0L)))
  }

  test("centroids match a naive exact-decimal recompute") {
    val pts = Geo.withCoords(Tables.events(spark, sfDir))
    val got = Geo.centroids(pts, "event_type")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    val naive = pts.select("event_type", "lat", "lon").collect()
      .groupBy(_.getString(0)).map { case (k, rows) =>
        def exactMean(get: org.apache.spark.sql.Row => Double): Double =
          (rows.map(r => BigDecimal(get(r)).setScale(2, BigDecimal.RoundingMode.HALF_EVEN))
            .sum.toDouble / rows.length)
        k -> (rows.length.toLong, exactMean(_.getDouble(1)), exactMean(_.getDouble(2)))
      }
    assert(got == naive && got.nonEmpty)
  }

  test("geohex grid: naive replay, and the two-candidate shortcut picks " +
      "the TRUE nearest lattice center (Voronoi correctness) (r18)") {
    val spark2 = spark; import spark2.implicits._
    val (wc, hc) = (300, 260)
    // crafted events: ids chosen to spread px/py over several cells
    val ev = (1L to 400L).map(i => (i * 13L, i * 7L, (i % 10).toDouble))
      .toDF("event_id", "user_id", "value")
    val got = Geo.geohexGrid(ev, wc, hc, topN = 10000).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(4), BigDecimal(r.getDouble(5)))).toMap
    // naive replay: per point, both candidate centers, nearest wins
    def center(px: Long, py: Long): (Long, Long) = {
      val ax = wc * ((px + wc / 2) / wc); val ay = hc * ((py + hc / 2) / hc)
      val ox = wc * (px / wc) + wc / 2;   val oy = hc * (py / hc) + hc / 2
      val dA = (px - ax) * (px - ax) + (py - ay) * (py - ay)
      val dB = (px - ox) * (px - ox) + (py - oy) * (py - oy)
      if (dA <= dB) (ax, ay) else (ox, oy)
    }
    val pts = (1L to 400L).map { i =>
      val (eid, uid, v) = (i * 13L, i * 7L, (i % 10).toDouble)
      (eid * 104729L % 36000L, uid * 7919L % 17000L, v)
    }
    val expect = pts.groupBy(p => center(p._1, p._2)).map { case (c, ps) =>
      c -> (ps.size.toLong, BigDecimal(ps.map(p => BigDecimal(p._3)).sum.toDouble))
    }
    assert(got == expect)
    // Voronoi correctness of the shortcut: the chosen center must be
    // the nearest among ALL lattice centers in a surrounding window
    // (grid A at (iW, jH), grid B at ((i+½)W, (j+½)H))
    pts.take(120).foreach { case (px, py, _) =>
      val chosen = center(px, py)
      val dChosen = (px - chosen._1) * (px - chosen._1) +
        (py - chosen._2) * (py - chosen._2)
      val all = for {
        i <- (px / wc - 2) to (px / wc + 2)
        j <- (py / hc - 2) to (py / hc + 2)
        c <- Seq((i * wc, j * hc), (i * wc + wc / 2, j * hc + hc / 2))
      } yield (px - c._1) * (px - c._1) + (py - c._2) * (py - c._2)
      assert(all.min >= dChosen,
        s"($px,$py): shortcut chose d2=$dChosen but lattice has ${all.min}")
    }
    // real-table smoke: the page is full and count-ordered
    val real = Geo.geohexGrid(Tables.events(spark, sfDir)).collect()
    assert(real.length == 20)
    val ns = real.map(_.getLong(4))
    assert(ns.zip(ns.tail).forall { case (a, b) => a >= b })
  }

  test("geohash grid cells cover every point exactly once") {
    val pts = Geo.withCoords(Tables.events(spark, sfDir))
    val grid = pts.withColumn("gh", Geo.geohash(col("lat"), col("lon"), 2))
      .groupBy("gh").count()
    assert(grid.agg(sum("count")).head().getLong(0) == pts.count())
    // every cell id is 2 chars of the base32 alphabet
    assert(grid.filter(!col("gh").rlike("^[0-9b-hjkmnp-z]{2}$")).count() == 0)
  }

  test("geo_shape envelope relations: containment, crossing, touching, " +
      "concave-notch cut, polygon-inside-envelope") {
    import spark.implicits._
    // unit square polygon (0,0)-(10,10) in (lat, lon), plus the shared
    // concave hexagon for the notch case
    val square = Seq((0.0, 0.0), (0.0, 10.0), (10.0, 10.0), (10.0, 0.0))
    def rel(poly: Seq[(Double, Double)],
        boxes: (Long, Double, Double, Double, Double)*): Map[Long, String] =
      boxes.toSeq
        .toDF("event_id", "lat_min", "lat_max", "lon_min", "lon_max")
        .withColumn("relation", Geo.envelopeRelation(poly))
        .collect().map(r => r.getLong(0) -> r.getString(5)).toMap
    val got = rel(square,
      (1L, 2.0, 8.0, 2.0, 8.0),       // strictly inside → within
      (2L, -5.0, 5.0, 2.0, 8.0),      // crosses the bottom edge
      (3L, -5.0, -1.0, 2.0, 8.0),     // fully outside → disjoint
      (4L, -5.0, 0.0, 2.0, 8.0),      // touches the bottom edge exactly
      (5L, -5.0, 15.0, -5.0, 15.0),   // polygon entirely inside envelope
      (6L, 10.0, 12.0, 10.0, 12.0))   // corner-touch at (10,10)
    assert(got(1L) == "within")
    assert(got(2L) == "intersects")
    assert(got(3L) == "disjoint")
    assert(got(4L) == "intersects", "edge touch counts as intersecting")
    assert(got(5L) == "contains", "envelope holding the whole polygon is the ES CONTAINS relation")
    assert(got(6L) == "intersects", "corner touch counts as intersecting")
    // concave notch: above the shared hexagon's (5,5) notch vertex the
    // edges (40,-10)→(5,5) and (5,5)→(10,60) carve a wedge out of the
    // interior; envelope lat∈[6,9] × lon∈[0,50] has ALL FOUR corners
    // inside the polygon (self-validated below), contains no polygon
    // vertex, yet both notch edges cut through it — corners-inside
    // alone would misreport 'within'
    val hex = Seq((0.0, -50.0), (40.0, -10.0), (5.0, 5.0),
      (10.0, 60.0), (-30.0, 40.0), (-45.0, -25.0))
    val corners = Seq((6.0, 0.0), (6.0, 50.0), (9.0, 0.0), (9.0, 50.0))
      .toDF("lat", "lon")
      .withColumn("in", Geo.pointInPolygon(col("lat"), col("lon"), hex))
      .collect().map(_.getBoolean(2))
    assert(corners.forall(identity), "fixture invariant: all 4 corners inside")
    val notch = rel(hex, (7L, 6.0, 9.0, 0.0, 50.0))
    assert(notch(7L) == "intersects", "notch-spanning envelope is NOT within")
    // and the classified facet over real events covers all three classes
    val facet = Geo.geoShapeFacet(
      Geo.withCoords(Tables.events(spark, sfDir)), hex)
      .collect().map(_.getString(0)).toSet
    assert(facet == Set("within", "intersects", "disjoint"))
    // generated-oracle hygiene: the corner ray-casts are re-targeted from
    // the point columns onto the envelope columns by identifier
    // substitution — no bare lat/lon reference may survive
    val sql = Geo.envelopeRelationSql(hex)
    assert(!sql.matches("(?s).*\\blat\\b.*"), "bare lat leaked into the oracle")
    assert(!sql.matches("(?s).*\\blon\\b.*"), "bare lon leaked into the oracle")
    Seq("lat_min", "lat_max", "lon_min", "lon_max", "within", "disjoint")
      .foreach(tkn => assert(sql.contains(tkn), s"oracle SQL missing $tkn"))
  }
}
