package graft.tools

import org.apache.spark.sql.SparkSession
import graft.Pipeline

/** Per-stage profile of the E1 macro pipeline (VERDICT r8 #4): reproduces
  * the Bench macro protocol (same session shape, fresh temp out-dir per
  * rep, one untimed warmup, min-of-reps) but times each DAG stage via
  * `Pipeline.runReport`, so the 17 s macro number decomposes into its
  * stages instead of being one opaque wall. Args: [sfDir] [reps].
  */
object ProfPipeline {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def rmRf(p: java.nio.file.Path): Unit =
      try {
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.walk(p).iterator().asScala.toSeq.reverse
          .foreach(java.nio.file.Files.deleteIfExists(_))
      } catch { case _: Throwable => () }

    def oneRun(): (Seq[Pipeline.StageTiming], Double) = {
      val out = java.nio.file.Files.createTempDirectory("graft_prof_e1_")
      val t0 = System.nanoTime()
      val r = Pipeline.runReport(spark, sfDir, out.toString)
      val wall = (System.nanoTime() - t0) / 1e9
      rmRf(out)
      (r.stages, wall)
    }

    oneRun() // untimed warmup, like Bench
    val runs: Seq[(Seq[Pipeline.StageTiming], Double)] =
      (1 to reps).map { _ => System.gc(); Thread.sleep(200); oneRun() }

    val stages = runs.head._1.map(_.stage)
    println(f"${"stage"}%-32s ${"min_s"}%8s ${"mean_s"}%8s  reps")
    var minTotal = 0.0
    stages.foreach { st =>
      val ts = runs.map(_._1.find(_.stage == st).get.seconds)
      minTotal += ts.min
      println(f"$st%-32s ${ts.min}%8.2f ${ts.sum / ts.size}%8.2f  " +
        ts.map(t => f"$t%.2f").mkString(" "))
    }
    // Concurrent stages overlap, so the stage-min sum OVERCOUNTS the
    // critical path — true wall clock is timed around each run.
    val walls = runs.map(_._2)
    println(f"${"sum_of_stage_mins"}%-32s $minTotal%8.2f (overlaps double-count)")
    println(f"${"wall_min"}%-32s ${walls.min}%8.2f ${walls.sum / walls.size}%8.2f")
    spark.stop()
  }
}
