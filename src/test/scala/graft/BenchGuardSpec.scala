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

  test("absMargin derives from the run's own probe spread (r19, ADVICE " +
      "r18): wide idle distributions widen the gate, narrow ones keep " +
      "the floor, small samples keep the floor") {
    // the r18 reference distribution reproduces its own constant:
    // 3 * (p90 - min) = 3 * (0.110 - 0.040) = 0.21 ~ the 0.2 floor
    val r18ish = Seq(0.040, 0.045, 0.050, 0.055, 0.060, 0.070, 0.080,
      0.090, 0.110, 0.221)
    assert(math.abs(BenchGuard.absMargin(r18ish) - 0.21) < 1e-9)
    // a host class with double the spread doubles its margin instead of
    // minting phantom dirt
    val wide = r18ish.map(_ * 2)
    assert(math.abs(BenchGuard.absMargin(wide) - 0.42) < 1e-9)
    assert(!BenchGuard.dirtyCalib(0.44, Some(0.08), BenchGuard.absMargin(wide)),
      "idle reading inside the wide host's own spread must stamp clean")
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
