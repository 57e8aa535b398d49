package graft
object TimeQ {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions","8").config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (q <- args) {
      val t0 = System.nanoTime()
      val n = SparkEntry.queries(q)(spark, sys.env.getOrElse("TQ_SF", "/root/testdata/sf0.01")).count()
      println(f"$q: ${(System.nanoTime()-t0)/1e9}%.2f s, $n rows")
    }
    spark.stop()
  }
}
