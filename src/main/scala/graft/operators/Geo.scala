package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TopKPairs
import graft.util.Det

/** ES geo query surface (reference context: the river feeds an ES index
  * whose query side serves filters + facets; geo_distance /
  * geo_bounding_box filters and the geohash_grid bucket agg are the
  * largest facet family — SURVEY §2 round-11 addition).
  *
  * Determinism discipline (the reason every formula here is
  * transcendental-free): the DuckDB oracle must reproduce results
  * BIT-IDENTICALLY. +, −, ×, / and floor on doubles are exact IEEE-754
  * ops both engines share; sin/cos/atan2 (haversine) are libm calls
  * whose last-ulp behavior differs across implementations. So:
  *  - coordinates derive from integer columns by exact modulo, then one
  *    double division — same value in both engines;
  *  - geo_distance uses the squared-degree planar form (ES supports
  *    `distance_type: plane`; at query radii the ordering matches arc
  *    distance near the equator band the synthetic data covers);
  *  - geohash_grid computes TRUE base-32 geohash cells via integer
  *    bisection counts + bit interleaving — floor((lat+90)/180·2^10) IS
  *    the 10-step binary-subdivision path, no iteration needed.
  *
  * Scale: everything is a narrow projection + filter + hash aggregate —
  * map-side combinable, no shuffle beyond the one the aggregate needs,
  * no UDFs (whole-stage codegen keeps the bit math in-line).
  */
object Geo {

  /** Deterministic synthetic coordinates: user_id spreads latitude,
    * event_id spreads longitude (primes decorrelate them from the id
    * sequences). lat ∈ [−85, 84.99], lon ∈ [−180, 179.99], 0.01°
    * cells — every value exactly representable in double (k/100 with
    * |k| ≤ 36000 rounds identically in both engines' parsers/dividers). */
  def withCoords(events: DataFrame): DataFrame = events
    .withColumn("lat",
      (col("user_id") * lit(7919L) % lit(17000L)).cast("double") / lit(100.0) - lit(85.0))
    .withColumn("lon",
      (col("event_id") * lit(104729L) % lit(36000L)).cast("double") / lit(100.0) - lit(180.0))

  /** The identical derivation as DuckDB SQL (kept textually adjacent so
    * the two can't drift). */
  val coordsSql: String =
    "(CAST(user_id * 7919 % 17000 AS DOUBLE) / 100.0 - 85.0) AS lat, " +
      "(CAST(event_id * 104729 % 36000 AS DOUBLE) / 100.0 - 180.0) AS lon"

  /** ES geo_bounding_box filter + per-family facet: count and exact
    * value sum per event_type inside the box. Plain range predicates —
    * at scale these sit directly on (clustered) point columns. */
  def boundingBox(pts: DataFrame, latMin: Double, latMax: Double,
                  lonMin: Double, lonMax: Double): DataFrame =
    pts.filter(col("lat") >= latMin && col("lat") <= latMax &&
        col("lon") >= lonMin && col("lon") <= lonMax)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), Det.moneySum(col("value")).as("sum_value"))

  /** ES geo_polygon membership via even-odd ray casting (planar, like
    * the rest of the geo surface): a horizontal ray from the point
    * crosses edge (p1,p2) iff the edge straddles the point's latitude
    * and the edge's longitude at that latitude lies east of the point.
    * Transcendental-free — per edge one multiply, one divide, three
    * compares, all exact-rounded IEEE ops DuckDB replays bit-identically
    * (the masked 0/0→NaN and x/0→±inf cases only arise when the
    * straddle test is already false, so they never decide membership).
    * Parity is an integer crossing count mod 2 — no boolean-fold drift.
    * Codegen-friendly: the whole polygon compiles to one flat scalar
    * expression, no UDF, no join; cost O(vertices) per row. */
  def pointInPolygon(lat: Column, lon: Column, poly: Seq[(Double, Double)]): Column = {
    require(poly.length >= 3, "polygon needs >= 3 vertices")
    val crossings = poly.indices.map { i =>
      val (y1, x1) = poly(i)
      val (y2, x2) = poly((i + 1) % poly.length)
      val straddles = (lit(y1) > lat) =!= (lit(y2) > lat)
      val eastOf = lon < (lit(x2) - lit(x1)) * (lat - lit(y1)) / (lit(y2) - lit(y1)) + lit(x1)
      when(straddles && eastOf, lit(1)).otherwise(lit(0))
    }.reduce(_ + _)
    crossings % 2 === 1
  }

  /** The identical ray-casting test as DuckDB SQL over the named
    * lat/lon columns (generated from the same vertex list so the
    * engines cannot drift). The column names are parameters — not
    * post-hoc string substitution — so callers like
    * [[envelopeRelationSql]] can retarget the test at envelope
    * corners without any risk of corrupting other identifiers
    * (r13 ADVICE). */
  def pointInPolygonSql(poly: Seq[(Double, Double)], latCol: String = "lat",
      lonCol: String = "lon"): String = {
    val terms = poly.indices.map { i =>
      val (y1, x1) = poly(i)
      val (y2, x2) = poly((i + 1) % poly.length)
      s"(CASE WHEN (($y1 > $latCol) <> ($y2 > $latCol)) AND " +
        s"($lonCol < ($x2 - $x1) * ($latCol - $y1) / ($y2 - $y1) + $x1) THEN 1 ELSE 0 END)"
    }.mkString(" + ")
    s"(($terms) % 2 = 1)"
  }

  /** ES geo_polygon filter + per-family facet (count + exact value sum
    * per event_type inside the polygon) — the geo_bounding_box facet
    * shape with the ray-casting predicate. Same scale story: narrow
    * projection, one codegen'd predicate, one map-side-combinable agg. */
  def polygonFacet(pts: DataFrame, poly: Seq[(Double, Double)]): DataFrame =
    pts.filter(pointInPolygon(col("lat"), col("lon"), poly))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), Det.moneySum(col("value")).as("sum_value"))

  /** ES geo_distance (distance_type: plane) as top-k nearest: squared
    * planar degree distance, k nearest with id tie-break. The k-row
    * result is a TakeOrdered (bounded per-partition heaps) — no global
    * sort at 100 TB. */
  def distanceTopK(pts: DataFrame, lat0: Double, lon0: Double,
                   maxD2: Double, k: Int): DataFrame = {
    val d2 = (col("lat") - lit(lat0)) * (col("lat") - lit(lat0)) +
      (col("lon") - lit(lon0)) * (col("lon") - lit(lon0))
    pts.withColumn("d2", d2)
      .filter(col("d2") <= lit(maxD2))
      .select(col("event_id"), col("lat"), col("lon"), col("d2"))
      .orderBy(col("d2"), col("event_id"))
      .limit(k)
  }

  /** ES geo_line aggregation (round 12): per group, the track of points
    * in event-time order, truncated at `maxPoints` (ES's `size`) —
    * emitted EXPLODED as (event_type, seq, lat, lon) so hash gates can
    * compare (an array-of-points column is opaque to them).
    *
    * Scale shape: the truncation happens FIRST, via the bounded
    * [[TopKPairs]] aggregate (score = −ts_µs, exact in double since
    * |epoch µs| ≪ 2^53; its (score desc, id asc) contract IS
    * (ts asc, id asc)) — map-side combine ships ≤ maxPoints pairs per
    * group per partition, where a rank-truncating window would sort
    * every group's full history. The final row_number runs on the
    * ≤ groups × maxPoints survivors joined back for their coordinates. */
  def geoLine(pts: DataFrame, maxPoints: Int): DataFrame = {
    val base = pts.select(col("event_type"), col("event_id"),
      Det.tsMicrosOf(pts, "ts").as("ts_us"), col("lat"), col("lon"))
    val picked = base
      .groupBy("event_type")
      .agg(TopKPairs.topK((-col("ts_us")).cast("double"), col("event_id"),
        maxPoints).as("top"))
      .select(col("event_type"), explode(col("top.id")).as("event_id"))
    val w = Window.partitionBy("event_type").orderBy(col("ts_us"), col("event_id"))
    base.join(broadcast(picked), Seq("event_type", "event_id"))
      .withColumn("seq", row_number().over(w))
      .select("event_type", "seq", "lat", "lon")
  }

  private val base32 = "0123456789bcdefghjkmnpqrstuvwxyz"

  /** True geohash cell id at `precision` characters (5 bits each,
    * lon-first interleave — the standard encoding). Bisection-free:
    * with b = ceil(5·precision/2) lon bits and floor(5·precision/2) lat
    * bits, the cell index along each axis is one floor of a scaled
    * double, and the base-32 string is bit-interleave + table lookup —
    * all codegen'd integer ops. */
  def geohash(lat: Column, lon: Column, precision: Int): Column = {
    val totalBits = 5 * precision
    val lonBits = (totalBits + 1) / 2
    val latBits = totalBits / 2
    // clamp to 2^bits - 1: at the exact domain maximum (lat=90, lon=180)
    // the floor yields cell index 2^bits, whose low bits are all zero —
    // without the clamp the extreme point would encode as the MINIMUM
    // cell (-90/-180) instead of the maximal one (ADVICE r11)
    val latI = least(
      floor((lat + lit(90.0)) / lit(180.0) * lit((1L << latBits).toDouble)).cast("long"),
      lit((1L << latBits) - 1))
    val lonI = least(
      floor((lon + lit(180.0)) / lit(360.0) * lit((1L << lonBits).toDouble)).cast("long"),
      lit((1L << lonBits) - 1))
    // interleave, lon taking the even (high-first) positions
    val inter = (0 until totalBits).foldLeft(lit(0L)) { (acc, pos) =>
      val fromLon = pos % 2 == 0
      val srcIdx = pos / 2 // 0-based from the MSB of that axis
      val src = if (fromLon) lonI else latI
      val nBits = if (fromLon) lonBits else latBits
      acc + shiftright(src, nBits - 1 - srcIdx).bitwiseAND(lit(1L)) *
        lit(1L << (totalBits - 1 - pos))
    }
    val alphabet = typedLit(base32.map(_.toString): Seq[String])
    concat((0 until precision).map { k =>
      element_at(alphabet,
        (shiftright(inter, totalBits - 5 * (k + 1)).bitwiseAND(lit(31L)) + lit(1L))
          .cast("int"))
    }: _*)
  }

  /** The identical geohash as a DuckDB SQL expression over columns
    * lat/lon (generated from the same parameters so the engines cannot
    * drift). */
  def geohashSql(precision: Int): String = {
    val totalBits = 5 * precision
    val lonBits = (totalBits + 1) / 2
    val latBits = totalBits / 2
    // same boundary clamp as the Spark form (lat=90 / lon=180)
    val latI = s"least(CAST(floor((lat + 90.0) / 180.0 * ${(1L << latBits).toDouble}) AS BIGINT), ${(1L << latBits) - 1})"
    val lonI = s"least(CAST(floor((lon + 180.0) / 360.0 * ${(1L << lonBits).toDouble}) AS BIGINT), ${(1L << lonBits) - 1})"
    val inter = (0 until totalBits).map { pos =>
      val fromLon = pos % 2 == 0
      val srcIdx = pos / 2
      val src = if (fromLon) lonI else latI
      val nBits = if (fromLon) lonBits else latBits
      s"((($src >> ${nBits - 1 - srcIdx}) & 1) * ${1L << (totalBits - 1 - pos)})"
    }.mkString(" + ")
    (0 until precision).map { k =>
      s"substr('$base32', CAST(((($inter) >> ${totalBits - 5 * (k + 1)}) & 31) AS INTEGER) + 1, 1)"
    }.mkString("(", " || ", ")")
  }

  /** ES geotile_grid aggregation (round 12): doc count per slippy-map
    * z/x/y web-mercator tile, top buckets by (count desc, tile).
    *
    * The Mercator y needs ln/tan/cos — a deliberate, DOCUMENTED
    * exception to this file's transcendental-free rule, sound for this
    * data by an exhaustive boundary-margin argument instead: engines'
    * libm results can differ in the last ulps, but a differing floor
    * needs a point within that divergence of a tile edge, and the
    * synthetic coordinate domain is FINITE (lat = k/100 − 85 for
    * k ∈ [0, 17000) — 17k values total, every SF draws from the same
    * grid). `GeoSpec` enumerates the whole domain and asserts every
    * tile coordinate sits ≥ 1e-6 tile-units from the nearest edge —
    * ~7 orders above cross-libm drift, so Spark and DuckDB floor
    * identically on every possible input, not just the sampled ones. */
  def geotileGrid(pts: DataFrame, zoom: Int, topN: Int): DataFrame = {
    val n = lit((1L << zoom).toDouble)
    val x = floor((col("lon") + lit(180.0)) / lit(360.0) * n).cast("long")
    val latRad = radians(col("lat"))
    val y = floor((lit(1.0) - log(tan(latRad) + lit(1.0) / cos(latRad)) / lit(math.Pi))
      / lit(2.0) * n).cast("long")
    pts.withColumn("tile", concat_ws("/", lit(zoom), x, y))
      .groupBy("tile")
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("tile"))
      .limit(topN)
  }

  /** The identical tile derivation as DuckDB SQL (generated from the
    * same zoom so the engines cannot drift structurally; see the
    * margin argument above for the libm question). */
  def geotileSql(zoom: Int): String = {
    val n = (1L << zoom).toDouble
    s"('$zoom/' || CAST(floor((lon + 180.0) / 360.0 * $n) AS BIGINT) || '/' || " +
      s"CAST(floor((1.0 - ln(tan(radians(lat)) + 1.0 / cos(radians(lat))) / pi()) / 2.0 * $n) AS BIGINT))"
  }

  /** ES geohash_grid aggregation: doc count per geohash cell, top
    * buckets by (count desc, cell) — one map-side-combinable hash agg
    * over a computed grouping key, then a bounded TakeOrdered. */
  def geohashGrid(pts: DataFrame, precision: Int, topN: Int): DataFrame =
    pts.withColumn("geohash", geohash(col("lat"), col("lon"), precision))
      .groupBy("geohash")
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("geohash"))
      .limit(topN)

  /** ES geohex_grid aggregation, re-expressed (completes the grid
    * family next to geohash_grid and geotile_grid): per-hex-cell doc
    * count + exact value sum, top-N page by count. H3's icosahedral
    * cell INDEXING is a geodesy library, not an aggregation semantic —
    * the re-expression keeps the agg (hexagonal cells, metrics per
    * cell, count-ordered page) on an equirectangular hex lattice
    * computed EXACTLY in integer centi-degree space: the classic
    * two-offset-grid nearest-center hexbin algorithm (matplotlib's),
    * where the plane is covered by grid A at (i·W, j·H) and grid B at
    * ((i+½)W, (j+½)H) and each point joins its nearer center — the
    * Voronoi cells of that centered-rectangular lattice are hexagons.
    * Every step (the two candidate centers via floor-div, the two
    * squared distances, the ≤ tie-break to grid A) is BIGINT
    * arithmetic on the raw id-derived coordinates, so cell membership
    * is bit-exact cross-engine; the display centers become doubles
    * once, after aggregation. One map-side-combinable hash agg +
    * bucket-bounded TakeOrdered — the geohash_grid scale shape. */
  def geohexGrid(events: DataFrame, wCenti: Int = 300, hCenti: Int = 260,
      topN: Int = 20): DataFrame = {
    require(wCenti % 2 == 0 && hCenti % 2 == 0 && wCenti > 0 && hCenti > 0)
    val (w2, h2) = (wCenti / 2, hCenti / 2)
    // integer centi-degree coordinates — the SAME derivation as
    // withCoords, pre-division (px ∈ [0, 36000), py ∈ [0, 17000))
    val cand = events.select(
      expr("user_id * 7919 % 17000").as("py"),
      expr("event_id * 104729 % 36000").as("px"),
      col("value"))
      .select(col("px"), col("py"), col("value"),
        expr(s"$wCenti * ((px + $w2) div $wCenti)").as("ax"),
        expr(s"$hCenti * ((py + $h2) div $hCenti)").as("ay"),
        expr(s"$wCenti * (px div $wCenti) + $w2").as("ox"),
        expr(s"$hCenti * (py div $hCenti) + $h2").as("oy"))
    val dA = (col("px") - col("ax")) * (col("px") - col("ax")) +
      (col("py") - col("ay")) * (col("py") - col("ay"))
    val dB = (col("px") - col("ox")) * (col("px") - col("ox")) +
      (col("py") - col("oy")) * (col("py") - col("oy"))
    cand.select(
        when(dA <= dB, col("ax")).otherwise(col("ox")).as("hex_x"),
        when(dA <= dB, col("ay")).otherwise(col("oy")).as("hex_y"),
        col("value"))
      .groupBy("hex_x", "hex_y")
      .agg(count(lit(1)).as("n"), Det.moneySum(col("value")).as("sum_value"))
      .orderBy(col("n").desc, col("hex_x"), col("hex_y"))
      .limit(topN)
      .select(col("hex_x"), col("hex_y"),
        (col("hex_x").cast("double") / lit(100.0) - lit(180.0)).as("lon_c"),
        (col("hex_y").cast("double") / lit(100.0) - lit(85.0)).as("lat_c"),
        col("n"), col("sum_value"))
  }

  /** The DuckDB twin of [[geohexGrid]] — generated from the same
    * constants so the two integer programs cannot drift. */
  def geohexGridSql(wCenti: Int = 300, hCenti: Int = 260,
      topN: Int = 20): String = {
    val (w2, h2) = (wCenti / 2, hCenti / 2)
    s"""WITH p AS (SELECT user_id * 7919 % 17000 AS py,
       |                  event_id * 104729 % 36000 AS px, value FROM events),
       |c AS (SELECT px, py, value,
       |        $wCenti * ((px + $w2) // $wCenti) AS ax,
       |        $hCenti * ((py + $h2) // $hCenti) AS ay,
       |        $wCenti * (px // $wCenti) + $w2 AS ox,
       |        $hCenti * (py // $hCenti) + $h2 AS oy
       |      FROM p),
       |h AS (SELECT CASE WHEN (px-ax)*(px-ax) + (py-ay)*(py-ay)
       |                    <= (px-ox)*(px-ox) + (py-oy)*(py-oy)
       |             THEN ax ELSE ox END AS hex_x,
       |             CASE WHEN (px-ax)*(px-ax) + (py-ay)*(py-ay)
       |                    <= (px-ox)*(px-ox) + (py-oy)*(py-oy)
       |             THEN ay ELSE oy END AS hex_y,
       |             value
       |      FROM c)
       |SELECT CAST(hex_x AS BIGINT) AS hex_x, CAST(hex_y AS BIGINT) AS hex_y,
       |       CAST(hex_x AS DOUBLE) / 100.0 - 180.0 AS lon_c,
       |       CAST(hex_y AS DOUBLE) / 100.0 - 85.0 AS lat_c,
       |       count(*) AS n,
       |       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
       |FROM h GROUP BY h.hex_x, h.hex_y
       |ORDER BY n DESC, hex_x, hex_y LIMIT $topN""".stripMargin
  }

  /** ES geo_distance AGGREGATION (distance range rings around an
    * origin): doc count + exact value sum per ring. Rings are defined
    * on the squared planar distance (edges supplied pre-squared), so
    * bucketing needs no sqrt — exact comparisons only; one conditional
    * projection + hash agg, no shuffle beyond the agg's. Every ring is
    * emitted (zero-count rings included) the way ES returns its full
    * range list; ring key = index into `edgesD2`. */
  def distanceRings(pts: DataFrame, lat0: Double, lon0: Double,
                    edgesD2: Seq[Double]): DataFrame = {
    val d2 = (col("lat") - lit(lat0)) * (col("lat") - lit(lat0)) +
      (col("lon") - lit(lon0)) * (col("lon") - lit(lon0))
    // ring i covers [edge(i-1), edge(i)); the last is [edge(last), ∞)
    val ring = edgesD2.zipWithIndex.foldRight(lit(edgesD2.size): Column) {
      case ((e, i), acc) => when(d2 < lit(e), lit(i)).otherwise(acc)
    }
    val spark = pts.sparkSession
    import spark.implicits._
    val allRings = (0 to edgesD2.size).toDF("ring")
    pts.select(ring.cast("int").as("ring"), col("value"))
      .groupBy("ring")
      .agg(count(lit(1)).as("n"), Det.moneySum(col("value")).as("sum_value"))
      .join(allRings, Seq("ring"), "right")
      .select(col("ring").cast("long").as("ring"),
        coalesce(col("n"), lit(0L)).as("n"),
        coalesce(col("sum_value"), lit(0.0)).as("sum_value"))
  }

  /** ES geo_bounds per bucket: the tight bounding box of the bucket's
    * points (ES returns it as top_left/bottom_right; min/max per axis
    * is the same box). Pure min/max — exact on any engine, map-side
    * combinable, one hash agg. */
  def bounds(pts: DataFrame, keyCol: String): DataFrame =
    pts.groupBy(keyCol).agg(
      min(col("lat")).as("min_lat"), max(col("lat")).as("max_lat"),
      min(col("lon")).as("min_lon"), max(col("lon")).as("max_lon"))

  /** ES geo_centroid per bucket: mean lat/lon. The synthetic
    * coordinates are exact multiples of 0.01, so the mean is computed
    * on the EXACT decimal domain (sum at DECIMAL, one double division
    * at the end — the Det.moneyAvg discipline): merge-order
    * independent, bit-identical to the oracle. */
  def centroids(pts: DataFrame, keyCol: String): DataFrame =
    pts.groupBy(keyCol)
      .agg(count(lit(1)).as("n"),
        Det.moneyAvg(col("lat")).as("centroid_lat"),
        Det.moneyAvg(col("lon")).as("centroid_lon"))

  // ---- geo_shape relations (r13) ---------------------------------------

  /** Deterministic synthetic ENVELOPE per event (the ES geo_shape
    * `envelope` type): the point grows into an axis-aligned box with
    * half-sizes 0.5–4.25° in steps of 0.25° (quarters are exact binary
    * doubles, so min/max arithmetic is bit-identical across engines).
    * Primes decorrelate the two half-sizes from the coordinate
    * derivation in [[withCoords]]. */
  def withEnvelope(pts: DataFrame): DataFrame = {
    val halfLat = (col("user_id") * 13L % 16L + 2L).cast("double") * lit(0.25)
    val halfLon = (col("event_id") * 29L % 16L + 2L).cast("double") * lit(0.25)
    pts
      .withColumn("lat_min", col("lat") - halfLat)
      .withColumn("lat_max", col("lat") + halfLat)
      .withColumn("lon_min", col("lon") - halfLon)
      .withColumn("lon_max", col("lon") + halfLon)
  }

  /** The identical envelope derivation as DuckDB SQL (textually
    * adjacent, same constants — the [[coordsSql]] discipline). */
  val envelopeSql: String =
    "lat - CAST(user_id * 13 % 16 + 2 AS DOUBLE) * 0.25 AS lat_min, " +
      "lat + CAST(user_id * 13 % 16 + 2 AS DOUBLE) * 0.25 AS lat_max, " +
      "lon - CAST(event_id * 29 % 16 + 2 AS DOUBLE) * 0.25 AS lon_min, " +
      "lon + CAST(event_id * 29 % 16 + 2 AS DOUBLE) * 0.25 AS lon_max"

  /** Does polygon edge (p1,p2) intersect the envelope rectangle?
    * Exact separating-axis test for a segment vs an AABB —
    * transcendental-free AND division-free (unlike the ray cast, no
    * masked 0/0 corners at all): the only separating axes are the two
    * rect axes (segment-bbox overlap, endpoint constants folded
    * scala-side) and the segment's own normal (all four rect corners
    * strictly on one side of the segment's line, sign via cross
    * product). Boundary touches count as intersecting (DE-9IM
    * `intersects` includes boundary contact). */
  private def edgeIntersectsRect(y1: Double, x1: Double, y2: Double, x2: Double): Column = {
    val bboxOverlap =
      lit(math.max(y1, y2)) >= col("lat_min") && lit(math.min(y1, y2)) <= col("lat_max") &&
        lit(math.max(x1, x2)) >= col("lon_min") && lit(math.min(x1, x2)) <= col("lon_max")
    def cross(cy: Column, cx: Column): Column =
      lit(x2 - x1) * (cy - lit(y1)) - lit(y2 - y1) * (cx - lit(x1))
    val corners = Seq(
      (col("lat_min"), col("lon_min")), (col("lat_min"), col("lon_max")),
      (col("lat_max"), col("lon_min")), (col("lat_max"), col("lon_max")))
    val allPos = corners.map { case (cy, cx) => cross(cy, cx) > 0 }.reduce(_ && _)
    val allNeg = corners.map { case (cy, cx) => cross(cy, cx) < 0 }.reduce(_ && _)
    bboxOverlap && !(allPos || allNeg)
  }

  /** ES geo_shape relation of each row's envelope vs a query polygon
    * (planar, no holes): 'within' (envelope entirely inside), else
    * 'intersects' (any common point incl. boundary touch), else
    * 'disjoint'. Built from three exact primitives:
    *
    *  - corner-in-polygon: the [[pointInPolygon]] even-odd ray cast on
    *    all four envelope corners (boundary semantics raycast-decided,
    *    identically on both engines — the geo_polygon convention);
    *  - polygon-vertex-in-envelope: four range compares per vertex;
    *  - edge-vs-rect: [[edgeIntersectsRect]] per polygon edge.
    *
    * within   = all corners in P AND no edge of P cuts the envelope
    * (corners-inside alone is NOT enough for a CONCAVE polygon — an
    * edge at a notch can cut through; spec-pinned);
    * contains = every vertex of P inside the envelope (the rectangle
    * is convex, so vertex containment implies edge containment — the
    * ES CONTAINS relation, r13);
    * intersects = any corner in P OR any vertex of P in the envelope
    * OR any edge cut (covers envelope⊂P, P⊂envelope, and crossings).
    * One flat codegen'd expression, O(vertices) per row, no join. */
  def envelopeRelation(poly: Seq[(Double, Double)]): Column = {
    require(poly.length >= 3, "polygon needs >= 3 vertices")
    val edges = poly.indices.map { i =>
      val (y1, x1) = poly(i)
      val (y2, x2) = poly((i + 1) % poly.length)
      (y1, x1, y2, x2)
    }
    val anyEdgeCut = edges.map { case (y1, x1, y2, x2) =>
      edgeIntersectsRect(y1, x1, y2, x2) }.reduce(_ || _)
    val cornerIn = Seq(
      (col("lat_min"), col("lon_min")), (col("lat_min"), col("lon_max")),
      (col("lat_max"), col("lon_min")), (col("lat_max"), col("lon_max")))
      .map { case (cy, cx) => pointInPolygon(cy, cx, poly) }
    val vertexIn = poly.map { case (vy, vx) =>
      lit(vy) >= col("lat_min") && lit(vy) <= col("lat_max") &&
        lit(vx) >= col("lon_min") && lit(vx) <= col("lon_max") }
    val anyVertexIn = vertexIn.reduce(_ || _)
    val within = cornerIn.reduce(_ && _) && !anyEdgeCut
    val contains = vertexIn.reduce(_ && _)
    val intersects = cornerIn.reduce(_ || _) || anyVertexIn || anyEdgeCut
    when(within, lit("within"))
      .when(contains, lit("contains"))
      .when(intersects, lit("intersects"))
      .otherwise(lit("disjoint"))
  }

  /** The identical relation classifier as DuckDB SQL over columns
    * lat_min/lat_max/lon_min/lon_max (generated from the same vertex
    * list so the engines cannot drift). */
  def envelopeRelationSql(poly: Seq[(Double, Double)]): String = {
    val edges = poly.indices.map { i =>
      val (y1, x1) = poly(i)
      val (y2, x2) = poly((i + 1) % poly.length)
      (y1, x1, y2, x2)
    }
    def edgeCut(y1: Double, x1: Double, y2: Double, x2: Double): String = {
      val bbox = s"(${math.max(y1, y2)} >= lat_min AND ${math.min(y1, y2)} <= lat_max " +
        s"AND ${math.max(x1, x2)} >= lon_min AND ${math.min(x1, x2)} <= lon_max)"
      def cross(cy: String, cx: String) =
        s"((${x2 - x1}) * ($cy - ($y1)) - (${y2 - y1}) * ($cx - ($x1)))"
      val corners = Seq(("lat_min", "lon_min"), ("lat_min", "lon_max"),
        ("lat_max", "lon_min"), ("lat_max", "lon_max"))
      val allPos = corners.map { case (cy, cx) => s"${cross(cy, cx)} > 0" }.mkString(" AND ")
      val allNeg = corners.map { case (cy, cx) => s"${cross(cy, cx)} < 0" }.mkString(" AND ")
      s"($bbox AND NOT (($allPos) OR ($allNeg)))"
    }
    val anyEdgeCut = edges.map { case (y1, x1, y2, x2) => edgeCut(y1, x1, y2, x2) }
      .mkString("(", " OR ", ")")
    def cornerIn(cy: String, cx: String): String =
      pointInPolygonSql(poly, latCol = cy, lonCol = cx)
    val corners = Seq(("lat_min", "lon_min"), ("lat_min", "lon_max"),
      ("lat_max", "lon_min"), ("lat_max", "lon_max"))
    val allCornersIn = corners.map { case (cy, cx) => s"(${cornerIn(cy, cx)})" }.mkString(" AND ")
    val anyCornerIn = corners.map { case (cy, cx) => s"(${cornerIn(cy, cx)})" }.mkString(" OR ")
    val vertexIn = poly.map { case (vy, vx) =>
      s"($vy >= lat_min AND $vy <= lat_max AND $vx >= lon_min AND $vx <= lon_max)" }
    val anyVertexIn = vertexIn.mkString("(", " OR ", ")")
    val allVerticesIn = vertexIn.mkString("(", " AND ", ")")
    s"(CASE WHEN ($allCornersIn) AND NOT $anyEdgeCut THEN 'within' " +
      s"WHEN $allVerticesIn THEN 'contains' " +
      s"WHEN ($anyCornerIn) OR $anyVertexIn OR $anyEdgeCut THEN 'intersects' " +
      "ELSE 'disjoint' END)"
  }

  /** ES geo_shape query surfaced as a relation facet: count + exact
    * value sum per (relation, event_type) — all three relations
    * graded by one query. A filter form is `.filter(relation === …)`,
    * which Catalyst folds into the same scan. */
  def geoShapeFacet(pts: DataFrame, poly: Seq[(Double, Double)]): DataFrame =
    withEnvelope(pts)
      .withColumn("relation", envelopeRelation(poly))
      .groupBy("relation", "event_type")
      .agg(count(lit(1)).as("n"), Det.moneySum(col("value")).as("sum_value"))
}
