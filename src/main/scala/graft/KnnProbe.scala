package graft
import org.apache.spark.sql.SparkSession

/** Measurement main (r17, VERDICT r16 #7): the kNN band join's
  * candidate-pair volume as a function of signature width h, per SF
  * mint — the evidence behind the [[graft.operators.ScaleEnvelope
  * .lshPlanesFor]] growth policy. For each dir argument it prints one
  * JSON line per probed width: the envelope-derived h plus h±1, so the
  * curve shows both the policy's chosen point and its sensitivity.
  *
  * Usage: runMain graft.KnnProbe <sfDir> [<sfDir> ...]
  */
object KnnProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    args.foreach { dir =>
      val n = Tables.embeddings(spark, dir).count()
      val h0 = graft.operators.Similarity.tablePlanesFor(n)
      Seq(h0 - 1, h0, h0 + 1).filter(_ >= 1).foreach { h =>
        val t0 = System.nanoTime()
        val (_, _, cands) = graft.operators.Similarity
          .knnCandidateCount(spark, dir, Some(h))
        val sec = (System.nanoTime() - t0) / 1e9
        println(s"""{"dir":"$dir","n":$n,"h":$h,"derived_h":$h0,""" +
          s""""candidates":$cands,"cand_per_vec":${cands.toDouble / n},""" +
          s""""sec":$sec}""")
      }
    }
    spark.stop()
  }
}
