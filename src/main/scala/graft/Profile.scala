package graft
/** Dev profiling scratchpad (not part of the driver contract). */
object Profile {
  def main(args: Array[String]): Unit = {
    import org.apache.spark.sql.functions._
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions","8").config("spark.ui.enabled","false")
      .config("spark.sql.session.timeZone","UTC").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = sys.env.getOrElse("TQ_SF", "/root/testdata/sf0.1")
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"$name: ${(System.nanoTime()-t0)/1e9}%.2f s ($n)")
    }
    import graft.operators.{TextOps, Dedup}
    val docs = Tables.documents(spark, d)
    val spread = docs.repartition(spark.sparkContext.defaultParallelism)
    time("warmup")(docs.count())
    println("spread partitions: " + spread.rdd.getNumPartitions)
    time("tokens spread")(spread.select(size(TextOps.tokens(col("text")))).agg(sum("size(regexp_extract_all(lower(text), \\S+, 0))")).count())
    time("tokens spread2")(spread.select(size(TextOps.tokens(col("text"))).as("n")).agg(sum(col("n"))).count())
    val toks = spread.select(col("doc_id"), TextOps.tokens(col("text")).as("t"))
    time("shingle no distinct")(toks.select(transform(sequence(lit(0), size(col("t")) - 3), i => concat_ws(" ", element_at(col("t"), (i + 1).cast("int")), element_at(col("t"), (i + 2).cast("int")), element_at(col("t"), (i + 3).cast("int")))).as("sh")).select(size(col("sh")).as("n")).agg(sum(col("n"))).count())
    time("shingle distinct")(toks.select(array_distinct(transform(sequence(lit(0), size(col("t")) - 3), i => concat_ws(" ", element_at(col("t"), (i + 1).cast("int")), element_at(col("t"), (i + 2).cast("int")), element_at(col("t"), (i + 3).cast("int"))))).as("sh")).select(size(col("sh")).as("n")).agg(sum(col("n"))).count())
    spark.stop()
  }
}
