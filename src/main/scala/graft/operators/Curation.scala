package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** End-to-end training-data curation: the composition a 100 TB corpus
  * actually runs — quality gating plus near-duplicate removal — built
  * entirely from the already-verified operator families:
  *
  *   1. per-document quality metrics (TextOps.qualityScore),
  *   2. MinHash-LSH candidates → exact Jaccard (Dedup.ngramJaccard),
  *   3. near-dup losers (higher doc_id of any pair with J ≥ τ) removed
  *      via a LEFT ANTI join (losers frame ≪ corpus — broadcastable at
  *      any scale where the dup-rate is sane),
  *   4. token-count and punctuation-ratio gates.
  */
object Curation {

  def curatedDocs(spark: SparkSession, dir: String,
                  jaccardThreshold: Double = 0.5,
                  minTokens: Int = 20,
                  maxPunctRatio: Double = 0.2): DataFrame = {
    val quality = TextOps.qualityScore(spark, dir)
    val losers = Dedup.ngramJaccard(spark, dir)
      .where(col("jaccard") >= jaccardThreshold)
      .select(col("doc_b").as("doc_id"))
      .distinct()
    quality
      .join(losers, Seq("doc_id"), "left_anti")
      .where(col("n_tokens") >= minTokens &&
        col("punct_ratio") <= maxPunctRatio)
      .select(col("doc_id"), col("n_tokens"), col("punct_ratio"),
        col("quality_score"))
  }
}
