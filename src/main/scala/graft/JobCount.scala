package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageSubmitted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession
import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

/** Deterministic execution-shape diagnostic (r21): runs each named
  * query to the noop sink and reports how many Spark JOBS, STAGES and
  * TASKS it launched plus the shuffle bytes written — the
  * host-noise-independent counterpart of Bench's wall clocks (a
  * hypervisor-stolen second moves every wall reading; it cannot move a
  * job count). `runMain graft.JobCount <sfDir> <query>...` — the
  * OPTIMIZATION_r21.md before/after job-shape claims are this tool's
  * output.
  *
  * Job count includes index/training construction actions a query's
  * thunk performs before its final plan (exactly what Bench times),
  * so a "m separate Lloyd jobs fused into one" change is visible here
  * as a job-count drop even when the final query plan is unchanged.
  *
  * Known limitation (r21 ADVICE, acceptable for a diagnostic): the
  * fixed 600 ms sleeps drain the async listener bus by delay, not by
  * handshake — a straggler task can leak an event or two across a
  * counter reset. Treat ±1-job deltas as noise; the before/after
  * claims in the OPTIMIZATION notes all ride 5+-job drops, and
  * repeated runs reproduce the counts. */
object JobCount {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names = if (args.length > 1) args.drop(1).toSeq
      else SparkEntry.queries.keys.toSeq.sorted
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", 1 << 20)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val jobs = new AtomicInteger
    val stages = new AtomicInteger
    val tasks = new AtomicInteger
    val shuffleWrite = new AtomicLong
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit =
        jobs.incrementAndGet(): Unit
      override def onStageSubmitted(e: SparkListenerStageSubmitted): Unit =
        stages.incrementAndGet(): Unit
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
        tasks.incrementAndGet()
        Option(e.taskMetrics).foreach(m =>
          shuffleWrite.addAndGet(m.shuffleWriteMetrics.bytesWritten): Unit)
      }
    })
    Tables.names.foreach(t => Tables.load(spark, sfDir, t).count())
    names.foreach { n =>
      // settle the (async) listener bus, then zero the counters
      Thread.sleep(600)
      jobs.set(0); stages.set(0); tasks.set(0); shuffleWrite.set(0)
      val t0 = System.nanoTime()
      try {
        SparkEntry.queries(n)(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
        Thread.sleep(600) // drain the async listener bus
        val secs = (System.nanoTime() - t0) / 1e9 - 0.6
        println(f"$n%-36s jobs=${jobs.get}%4d stages=${stages.get}%4d " +
          f"tasks=${tasks.get}%6d shuffleMB=${shuffleWrite.get / 1e6}%9.2f " +
          f"wall=$secs%7.2f")
      } catch {
        case e: Throwable => println(s"$n FAILED: ${e.getMessage}")
      }
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
    }
    spark.stop()
  }
}
