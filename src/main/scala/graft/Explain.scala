package graft
import org.apache.spark.sql.SparkSession

/** Plan-audit main: prints the formatted physical plan of the named
  * queries (or all) at the given SF — the `.explain`-and-iterate loop
  * SURVEY §5 prescribes (PushedFilters reaching the scan, broadcast on
  * dim joins, WholeStageCodegen spans, no unexpected shuffles). */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val only = args.toSet
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.isEmpty || only(n) }
      .foreach { case (name, fn) =>
        println(s"\n===== $name =====")
        try fn(spark, sfDir).explain("formatted")
        catch { case e: Throwable => println(s"[explain] failed: ${e.getMessage}") }
      }
    spark.stop()
  }
}
