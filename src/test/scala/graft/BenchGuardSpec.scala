package graft

import org.scalatest.funsuite.AnyFunSuite
import BenchGuard.Bracket

/** Bench host-noise guard v4 (r16 verdict #3): the documented failure
  * mode of two consecutive driver artifacts was a host stall SHORTER
  * than one calibration segment — mid-segment queries inflate >2×
  * while both bracketing calibrations read clean, so the v3 bracket
  * rule passes the phantoms. This spec replays exactly that synthetic
  * stall through both detectors: the bracket rule (correctly, by
  * design) misses it; the cross-round reference rule flags it; and a
  * clean re-time clears the flag — the Bench re-time loop's contract. */
class BenchGuardSpec extends AnyFunSuite {

  private val refFloor = 0.135
  // committed cross-round reference (the r16 shapes)
  private val refTimes = Map(
    "hbase_source_scan" -> 0.143, "mm_feature_stub" -> 0.107,
    "dedup_exact" -> 0.140, "q_geohash_grid" -> 0.157,
    "pipe_decontaminate" -> 1.782)

  test("a sub-segment stall passes the bracket rule but is flagged " +
      "by the cross-round reference rule") {
    // one segment, clean calibrations either side (the stall started
    // and ended inside the segment), but hbase_source_scan absorbed it
    val brackets = Seq(Bracket(
      Seq("hbase_source_scan", "mm_feature_stub", "dedup_exact"),
      0.140, 0.138))
    val best = Map(
      "hbase_source_scan" -> 0.925, // the r16 phantom, ×6.6
      "mm_feature_stub" -> 0.110,
      "dedup_exact" -> 0.139)
    val ref = Some(0.132)
    // v3 bracket rule: both calibs clean → nothing dirty (the hole)
    assert(BenchGuard.dirtyQueries(brackets, best.keys.toSeq, ref).isEmpty)
    // v4 reference rule: the phantom is 6.6× its committed value
    val out = BenchGuard.refOutliers(best, refTimes, refFloor,
      currentFloor = 0.132)
    assert(out == Seq("hbase_source_scan"), out)
  }

  test("a clean isolated re-time clears the flag (min-of-timings " +
      "estimator)") {
    val best = Map("hbase_source_scan" -> math.min(0.925, 0.129))
    assert(BenchGuard.refOutliers(best, refTimes, refFloor, 0.132).isEmpty)
  }

  test("floor normalization: a uniformly 2x-slower host is not a sea " +
      "of false outliers, and a real regression still flags there") {
    val slowHost = refTimes.map { case (k, v) => k -> v * 2.0 }
    assert(BenchGuard.refOutliers(slowHost, refTimes, refFloor,
      currentFloor = refFloor * 2.0).isEmpty)
    val withReg = slowHost + ("dedup_exact" -> refTimes("dedup_exact") * 2.0 * 2.5)
    assert(BenchGuard.refOutliers(withReg, refTimes, refFloor,
      refFloor * 2.0) == Seq("dedup_exact"))
  }

  test("queries absent from the committed reference are skipped, " +
      "errored readings are skipped") {
    val best = Map("brand_new_query" -> 99.0, "dedup_exact" -> -1.0)
    assert(BenchGuard.refOutliers(best, refTimes, refFloor, refFloor).isEmpty)
  }

  test("a stall LONGER than a segment still lands on the bracket rule") {
    val brackets = Seq(
      Bracket(Seq("a", "b"), 0.140, 0.900), // stall spans the boundary
      Bracket(Seq("c"), 0.900, 0.141))
    val got = BenchGuard.dirtyQueries(brackets, Seq("a", "b", "c"), Some(0.135))
    assert(got == Seq("a", "b", "c"))
    // a later clean bracket for b rescues it
    val rescued = brackets :+ Bracket(Seq("b"), 0.140, 0.139)
    assert(BenchGuard.dirtyQueries(rescued, Seq("a", "b", "c"),
      Some(0.135)) == Seq("a", "c"))
  }

  test("host-probe idle spread stays inside the bracket gate; genuine " +
      "contention still trips it (r18 absolute margin)") {
    val hostFloor = Some(0.040)
    // the measured r18 clean-box probe distribution (max 0.221) must
    // read CLEAN — a pure 2x ratio on a 0.04 s floor stamped 80
    // phantom-dirty queries
    Seq(0.040, 0.060, 0.110, 0.221).foreach(c =>
      assert(!BenchGuard.dirtyCalib(c, hostFloor), s"idle probe $c flagged"))
    // the leaked-JVM incident class (x3-10 the floor, > floor+margin)
    Seq(0.30, 0.55, 2.0).foreach(c =>
      assert(BenchGuard.dirtyCalib(c, hostFloor), s"stall $c missed"))
    // the margin never LOOSENS a large-floor gate below its ratio:
    // q6-class floors keep the 2x rule as the binding term
    assert(BenchGuard.dirtyCalib(0.90, Some(0.30)))
    assert(!BenchGuard.dirtyCalib(0.55, Some(0.30)))
  }

  test("absMargin derives from the run's own probe spread (r20, ADVICE " +
      "r19): median-based so intermittent contention cannot widen its " +
      "own gate; wide idle hosts still widen, small samples keep the floor") {
    // the ADVICE r19 scenario: min clean, upper tail contaminated by
    // intermittent contention (min 0.04 / p90 0.4). The r19 p90
    // estimator gave margin 3*(0.4-0.04) = 1.08 — looser exactly when
    // contention occurred; the median estimator keeps the floor.
    val contended = Seq(0.040, 0.045, 0.050, 0.055, 0.060, 0.065, 0.070,
      0.300, 0.400, 0.450)
    assert(BenchGuard.absMargin(contended) == BenchGuard.AbsMargin)
    assert(BenchGuard.dirtyCalib(0.40, Some(0.045),
      BenchGuard.absMargin(contended)),
      "a contended probe must stamp dirty under the contaminated run's own gate")
    // the r18 reference distribution (median 0.070) keeps the floor too
    // (its own 3*(p90-min)=0.21 calibrated the floor in the first place)
    val r18ish = Seq(0.040, 0.045, 0.050, 0.055, 0.060, 0.070, 0.080,
      0.090, 0.110, 0.221)
    assert(BenchGuard.absMargin(r18ish) == BenchGuard.AbsMargin)
    // a host class whose BULK is wide (median far off min — genuinely
    // slow-and-noisy idle, not a contaminated tail) widens its gate
    val wide = Seq(0.10, 0.12, 0.14, 0.16, 0.18, 0.20, 0.22, 0.24, 0.26, 0.30)
    assert(math.abs(BenchGuard.absMargin(wide) - 0.30) < 1e-9)
    assert(!BenchGuard.dirtyCalib(0.38, Some(0.10), BenchGuard.absMargin(wide)),
      "idle reading inside the wide host's own bulk spread must stamp clean")
    // tight distributions never LOOSEN the gate below the floor
    val tight = Seq.fill(20)(0.040) ++ Seq(0.041, 0.042)
    assert(BenchGuard.absMargin(tight) == BenchGuard.AbsMargin)
    // under 8 observations the quantile is noise — floor
    assert(BenchGuard.absMargin(Seq(0.04, 9.9)) == BenchGuard.AbsMargin)
    // errored sentinels are excluded from the estimator
    assert(BenchGuard.absMargin(Seq.fill(10)(-1.0)) == BenchGuard.AbsMargin)
  }

  test("parseRef round-trips the machine-written reference file") {
    val json = """{"calib_ref":0.135,"sf":"/x/sf0.1","queries":{"q1":0.5,"dedup_exact":0.140}}"""
    val Some((floor, qs)) = BenchGuard.parseRef(json)
    assert(floor == 0.135)
    assert(qs == Map("q1" -> 0.5, "dedup_exact" -> 0.140))
    assert(BenchGuard.parseRef("not json").isEmpty)
  }
}
