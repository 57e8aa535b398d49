package graft

import org.apache.spark.sql.SparkSession
import graft.operators.Takedown

/** Measurement main (r17): per-leg cost decomposition of the erasure
  * certificate — the evidence feed for deciding whether its standing
  * ×100 line (~20–25 s min-of-3 at sf10) has a dominant leg worth a
  * plan fix or is genuinely scan-bound across all seven artifacts.
  * Times the full certificate, the index-legs body alone, the pack leg
  * alone, and then each index leg as a single-artifact certificate
  * (same staging, same dead-id set — the per-leg numbers sum to ~the
  * body because the body is one union-all job over the same scans).
  *
  * Usage: runMain graft.CertProbe <sfDir> [reps]
  */
object CertProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(2)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val env = SparkEntry.stagedErasureEnv(spark, dir)
    val ids = SparkEntry.takedownDocIds(spark, dir)
    val t = env.targets
    def time(name: String)(f: => org.apache.spark.sql.DataFrame): Unit = {
      val secs = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        f.write.mode("overwrite").format("noop").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"""{"leg":"$name","min_sec":${secs.min}%.3f,""" +
        f""""reps":$reps}""")
    }
    def pack = Some((spark.read.parquet(env.countsDir),
      spark.read.parquet(env.packsDir)))
    time("full")(Takedown.erasureCertificate(spark, ids, t, pack))
    time("body_only")(Takedown.erasureCertificate(spark, ids, t, None))
    time("pack_only")(Takedown.erasureCertificate(spark, ids,
      Takedown.TakedownTargets(), pack))
    def perLeg(suffix: String): Unit = Seq(
      "corpus" -> Takedown.TakedownTargets(corpusTableDir = t.corpusTableDir),
      "lex" -> Takedown.TakedownTargets(lexIndexPath = t.lexIndexPath),
      "pos" -> Takedown.TakedownTargets(posIndexPath = t.posIndexPath),
      "ivf" -> Takedown.TakedownTargets(ivfIndexPath = t.ivfIndexPath),
      "pairs" -> Takedown.TakedownTargets(pairTablePath = t.pairTablePath),
      "content" ->
        Takedown.TakedownTargets(contentIndexPath = t.contentIndexPath)
    ).foreach { case (name, one) =>
      time(name + suffix)(Takedown.erasureCertificate(spark, ids, one, None))
    }
    perLeg("")
    // Same legs against COMPACTED generations — the standing shape a
    // deployment's compaction cadence maintains (StreamingIngest folds
    // on the same entry points). Quantifies how much of the leg cost is
    // small-file/batch-layout overhead vs true row volume.
    graft.operators.Compaction.compactLexIndex(spark, t.lexIndexPath.get)
    graft.operators.Compaction.compactPosIndex(spark, t.posIndexPath.get)
    graft.operators.Compaction.compactIvfIndex(spark, t.ivfIndexPath.get)
    graft.operators.Compaction.compactPairTable(spark, t.pairTablePath.get,
      t.pairTablePath.get.stripSuffix("/pairs") + "/sigs")
    perLeg("_compacted")
    time("full_compacted")(
      Takedown.erasureCertificate(spark, ids, t, pack))
    spark.stop()
  }
}
