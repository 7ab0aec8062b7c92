package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: times every SparkEntry query end-to-end at
  * SPARK_GRAFT_SF_DIR, writing each result to the `noop` sink so the
  * full plan executes (a bare count() would let Catalyst prune the
  * projections under test). Prints one JSON line for the driver. */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // JVM + parquet-footer warm-up so per-query times measure the query
    Tables.names.foreach(t => Tables.load(spark, sfDir, t).count())
    // optional args: run only the named queries (diagnostics; the driver
    // invokes with no args → full suite)
    val only = args.toSet
    val results = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.isEmpty || only(name) }
      .map { case (name, fn) =>
      def once(): Double = {
        val t0 = System.nanoTime()
        val ok =
          try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); true }
          catch { case e: Throwable =>
            System.err.println(s"[bench] $name failed: ${e.getMessage}"); false
          }
        // operators persist intermediates (and the clustering loop
        // localCheckpoints, which clearCache does NOT reclaim); drop every
        // persisted block so 130+ back-to-back executions don't accumulate
        // heap pressure that bleeds into later queries' times
        spark.catalog.clearCache()
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
        if (ok) (System.nanoTime() - t0) / 1e9 else -1.0
      }
      // best of 2 (single runs are dominated by JIT/GC noise), plus a
      // tie-break third run when the two disagree > 2x — a transient
      // host stall spanning both runs would otherwise stand as the
      // measurement
      val base = Seq(once(), once())
      val times =
        if (base.exists(_ < 0) || base.max <= 2 * base.min) base
        else base :+ once()
      System.err.println(s"[bench] $name runs: ${times.map(t => f"$t%.2f").mkString(", ")}")
      name -> (if (times.exists(_ < 0)) -1.0 else times.min)
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
