package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators._

/** Throwaway round-15 decomposition of q_erasure_certificate's cost. */
object ProfCert {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/tmp/graft_sf1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s"); r
    }
    val docs = graft.Tables.documents(spark, sfDir)
    val dead = docs.where(col("doc_id") % 5 === 2).select(col("doc_id"))
      .localCheckpoint()
    // r16: packCertLeg reads the standing counts table; here it is
    // materialized once, the same shape the fixture stages.
    val counts = {
      val c = Sampling.tokenCountsOf(docs).localCheckpoint(); c.count(); c
    }
    val packs = time("packs (packSequencesOf)") {
      val p = Sampling.packSequencesOf(docs).localCheckpoint(); p.count(); p
    }
    // warm page cache
    time("warm full leg pass") {
      Takedown.packCertLeg(counts, dead, packs, suffixScoped = true)
        .collect()
    }
    time("packCertLeg scoped") {
      Takedown.packCertLeg(counts, dead, packs, suffixScoped = true)
        .collect()
    }
    time("packCertLeg full") {
      Takedown.packCertLeg(counts, dead, packs, suffixScoped = false)
        .collect()
    }
    time("counts checkpoint alone") {
      Sampling.packSequencesOf(docs).count()
    }
    // The production shape suffix-scoping exists for: ONE lang, cut
    // near the stratum's tail (a takedown of recent documents).
    val lang0 = docs.select(col("lang")).orderBy(col("lang")).limit(1)
      .collect()(0).getString(0)
    val lastDoc = docs.where(col("lang") === lang0)
      .agg(max(col("doc_id"))).collect()(0).getLong(0)
    val oneDead = docs.where(col("doc_id") === lastDoc)
      .select(col("doc_id")).localCheckpoint()
    time("late-cut scoped") {
      Takedown.packCertLeg(counts, oneDead, packs, suffixScoped = true)
        .collect()
    }
    time("late-cut full") {
      Takedown.packCertLeg(counts, oneDead, packs, suffixScoped = false)
        .collect()
    }
    spark.stop()
  }
}
