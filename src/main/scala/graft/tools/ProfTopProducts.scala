package graft.tools

import org.apache.spark.sql.SparkSession
import graft.SparkEntry

/** r9 diagnosis harness for the q_top_products bench regression
  * (VERDICT r8 "Next round" #1): times the query ISOLATED (fresh
  * session, same local[N]/shuffle-partition config as Bench) and then
  * IN BENCH ORDER (after every query alphabetically before it has run
  * once, mimicking the warmed harness state), printing per-rep times
  * for both. Run with SPARK_GRAFT_CPUS / SPARK_GRAFT_SF_DIR like Bench.
  */
object ProfTopProducts {
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

    def rep(tag: String, n: Int): Unit = (1 to n).foreach { i =>
      val t0 = System.nanoTime()
      SparkEntry.queries("q_top_products")(spark, sfDir).count()
      println(f"$tag rep $i: ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }

    // Phase A: isolated, cold session — 1 warmup + 3 timed.
    rep("isolated-warmup", 1)
    rep("isolated", 3)

    if (args.contains("full")) {
      // Phase B: replicate the bench harness state — run every query
      // once (warmup pass), then time q_top_products 3×.
      val t0 = System.nanoTime()
      SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (_, fn) =>
        try fn(spark, sfDir).count() catch { case _: Throwable => () }
      }
      println(f"full warmup pass: ${(System.nanoTime() - t0) / 1e9}%.1f s")
      rep("after-warmup-pass", 3)
    }
    spark.stop()
  }
}
