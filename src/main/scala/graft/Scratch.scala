package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions","32")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val emb = spark.read.parquet("/tmp/sfx1/embeddings.parquet")
    def time[T](lbl: String)(f: => T): T = { val t0=System.nanoTime; val r=f; System.err.println(f"[prof] $lbl: ${(System.nanoTime-t0)/1e9}%.2f s"); r }
    val n = emb.count()
    val nCent = math.min(256, math.max(8, (n/128).toInt))
    val cents = emb.filter(col("vec_id") < nCent).select(col("vec_id"), col("embedding"))
        .orderBy("vec_id").collect()
        .map(r => (r.getLong(0).toInt, r.get(1).asInstanceOf[scala.collection.Seq[Float]].map(_.toDouble).toSeq)).toSeq
    val centDf = cents.toDF("cid", "centroid")
    val assigned = emb.select(col("vec_id"), col("embedding").cast("array<double>").as("e"))
      .join(broadcast(centDf))
      .groupBy("vec_id")
      .agg(max_by(col("cid"), struct(
          GraftFunctions.cosineSim(col("e"), col("centroid")).as("cos"),
          (-col("cid")).as("negid"))).as("cent_id"))
    time("means via slim argmax + id join") {
      assigned.join(emb.select(col("vec_id"),
          col("embedding").cast("array<double>").as("e")), "vec_id")
        .select(col("cent_id"), posexplode(col("e")).as(Seq("dim", "v")))
        .groupBy("cent_id", "dim").agg(avg(col("v")).as("m")).collect()
    }
  }
}
