package graft
import org.apache.spark.sql.SparkSession
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    spark.range(1000).selectExpr("sum(id)").collect()
    def time(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"$label%-10s ${(System.nanoTime()-t0)/1e9}%8.2f s")
    }
    for (q <- Seq("q17_dedup_exact", "q05_training_examples_precomputed", "q03_training_examples", "q04_customer_history", "q21_simhash", "q18_minhash_bands"); i <- 1 to 2)
      time(s"$q $i") { SparkEntry.queries(q)(spark, dir).write.format("noop").mode("overwrite").save() }
    spark.stop()
  }
}
