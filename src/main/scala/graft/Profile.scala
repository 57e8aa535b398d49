package graft
/** Dev profiling scratchpad (not part of the driver contract). */
object Profile {
  def main(args: Array[String]): Unit = {
    import org.apache.spark.sql.functions._
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions","8").config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = sys.env.getOrElse("TQ_SF", "/root/testdata/sf0.1")
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"$name: ${(System.nanoTime()-t0)/1e9}%.2f s ($n)")
    }
    import graft.operators.TextOps
    val docs = Tables.documents(spark, d)
    time("tokens only")(docs.select(explode(TextOps.tokens(col("text")))).count())
    time("shingles explode")(docs.select(explode(TextOps.shingles(TextOps.tokens(col("text"))))).count())
    time("shingles+md5+conv")(docs.select(conv(substring(md5(explode(TextOps.shingles(TextOps.tokens(col("text"))))),1,8),16,10)).count())
    spark.stop()
  }
}
