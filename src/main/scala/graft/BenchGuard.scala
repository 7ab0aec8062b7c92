package graft

/** Pure decision logic for [[Bench]]'s host-noise guard, factored out
  * so the guard itself is spec-testable (v4 — r16 verdict #3: two
  * consecutive driver artifacts shipped >2× phantom movers past the
  * v3 bracket guard because a host stall SHORTER than one calibration
  * segment inflates mid-segment queries while both bracketing
  * calibrations read clean).
  *
  * Two independent detectors:
  *
  *  - [[dirtyQueries]]: the v3 bracket rule — a query is clean iff at
  *    least one of its recorded (calib-before, calib-after) brackets
  *    has both calibrations ≤ 2× the final idle-floor estimate. Run
  *    against the FINAL ref so a later pass lowering ref retroactively
  *    dirties earlier segments. Catches stalls LONGER than a segment.
  *  - [[refOutliers]]: the v4 cross-round rule — compare each reading
  *    against its committed cross-round reference (tools/bench_ref
  *    .json, floor-normalized to this host via the calibration ratio);
  *    readings past `factor`× the scaled reference re-time ISOLATED
  *    before the artifact stamps. Catches the sub-segment stalls the
  *    brackets cannot see — exactly the four r16 phantoms
  *    (hbase_source_scan ×6.6 … q_geohash_grid ×2.2, all judge-re-timed
  *    clean). A reading still past the factor AFTER re-timing is
  *    reported in the JSON (`ref_outliers`) — a candidate real
  *    regression for the movers table, not silent garbage.
  *
  * BenchGuardSpec replays a synthetic mid-segment stall through both
  * detectors: the bracket rule misses it, the reference rule flags it.
  */
object BenchGuard {

  /** One recorded calibration bracket: the segment's query names plus
    * the calibration readings taken immediately before and after. */
  final case class Bracket(queries: Seq[String], calibBefore: Double,
      calibAfter: Double)

  /** Absolute slack added to the 2× ratio gate. The bracket floor is
    * now the HOST PROBE (a ~0.04 s fixed-size range sum — r18 ADVICE
    * fix: the final verdict previously compared probe readings against
    * the much larger q6 floor and whitewashed everything), and a
    * measurement that small has idle-host spread far past 2×: the r18
    * clean-box distribution read min 0.040 / p50 0.060 / p90 0.110 /
    * max 0.221 over 78 probes — a pure-ratio gate on it stamps probe
    * NOISE as host dirt (80 phantom-dirty queries in the first r18
    * full run). A reading is dirty only when it exceeds the floor by
    * BOTH the ratio and this margin; genuine contention still trips it
    * easily (the r18 leaked-JVM incident held the probe at ×3–10).
    *
    * r19 (ADVICE r18): this constant is the FLOOR, calibrated to the
    * r18 reference box's probe distribution (min 0.040 / p90 0.110 /
    * max 0.221 over 78 probes → 3·(p90−min) = 0.21). [[absMargin]]
    * re-derives the margin from THIS run's own probe spread by the
    * same estimator, so a host class with a wider idle distribution
    * widens its gate instead of minting phantom dirt — the margin only
    * ever grows past the floor, never loosens below it. */
  val AbsMargin = 0.2

  /** Margin derived from the observed host-probe spread: 3 × (median −
    * min) of this run's calibrations, floored at [[AbsMargin]]. Under
    * 8 observations the quantile is noise — keep the floor.
    *
    * r20 (ADVICE r19): the r19 estimator used 3·(p90 − min), which is
    * NOT contention-robust — intermittent contention (the r18
    * leaked-JVM class) inflates the upper tail while min stays clean,
    * so the gate widened exactly when contention occurred (min 0.04 /
    * p90 0.4 gave a 1.2 s margin that stamped the dirt it should
    * catch as clean). The median needs MOST probes contended before
    * it moves, and a majority-contended run is caught by the bracket
    * rule and the ref guard anyway; a genuinely-wide idle host class
    * (median well off its min) still widens its gate. Spec-pinned
    * both ways in `BenchGuardSpec`. */
  def absMargin(calibs: Seq[Double]): Double = {
    val clean = calibs.filter(_ >= 0)
    if (clean.size < 8) AbsMargin
    else {
      val sorted = clean.sorted
      val p50 = sorted(math.round(0.5 * (sorted.size - 1)).toInt)
      math.max(AbsMargin, 3.0 * (p50 - sorted.head))
    }
  }

  def dirtyCalib(c: Double, ref: Option[Double],
      margin: Double = AbsMargin): Boolean =
    c >= 0 && ref.exists(r => c > math.max(2 * r, r + margin))

  /** Names with NO clean bracket under the final ref (v3 rule). */
  def dirtyQueries(all: Seq[Bracket], names: Seq[String],
      ref: Option[Double], margin: Double = AbsMargin): Seq[String] = {
    val clean = all
      .filter(b => !dirtyCalib(b.calibBefore, ref, margin) &&
        !dirtyCalib(b.calibAfter, ref, margin))
      .flatMap(_.queries).toSet
    names.filterNot(clean).sorted
  }

  /** Queries whose reading exceeds `factor` × their committed
    * cross-round reference, after normalizing the reference to this
    * host by the calibration-floor ratio (the SCALING.md estimator's
    * same-host discipline, applied cross-host via the floor). Queries
    * absent from the reference (new this round) are skipped — they
    * join the file next refresh. */
  def refOutliers(best: Map[String, Double],
      refTimes: Map[String, Double], refFloor: Double,
      currentFloor: Double, factor: Double = 1.8): Seq[String] = {
    require(refFloor > 0 && currentFloor > 0)
    val scale = currentFloor / refFloor
    best.toSeq.collect {
      case (n, t) if t >= 0 && refTimes.get(n).exists(r => t > factor * r * scale) => n
    }.sorted
  }

  /** Parse the committed reference file: {"calib_ref":f,"queries":{..}}.
    * Minimal flat-JSON field extraction — the file is machine-written
    * by Bench itself (`SPARK_GRAFT_WRITE_REF`), not hand-edited. */
  def parseRef(json: String): Option[(Double, Map[String, Double])] = {
    val floorRe = """"calib_ref"\s*:\s*([0-9.eE+-]+)""".r
    val qRe = """"([A-Za-z0-9_]+)"\s*:\s*([0-9.eE+-]+)""".r
    floorRe.findFirstMatchIn(json).map { m =>
      val floor = m.group(1).toDouble
      val qs = json.indexOf("\"queries\"") match {
        case -1 => Map.empty[String, Double]
        case i => qRe.findAllMatchIn(json.substring(i + 9))
          .map(q => q.group(1) -> q.group(2).toDouble).toMap
      }
      (floor, qs)
    }
  }
}
