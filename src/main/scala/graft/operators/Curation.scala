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

  /** Decontamination: find train-split documents whose n-gram content
    * overlaps an eval-split document (the GPT-3-style "remove training
    * docs sharing n-grams with the benchmark" step — training on eval
    * data silently inflates benchmarks, so this check is mandatory
    * corpus hygiene before packing).
    *
    * Shape: explode distinct shingles on both sides and equi-join on the
    * shingle itself — the shuffle is keyed by n-gram, candidate pairs
    * only materialize for actually-shared n-grams, never all-pairs. The
    * eval side is the benchmark corpus: tiny at any scale, so Catalyst
    * broadcasts it. Emits (train_doc, eval_doc, n_shared) for pairs with
    * at least `minShared` shared distinct shingles (exact duplicates
    * surface naturally with n_shared = their full shingle count). */
  def decontaminate(spark: SparkSession, dir: String,
                    minShared: Int = 3): DataFrame = {
    val docs = graft.Tables.documents(spark, dir)
      .join(Sampling.trainSplit(spark, dir).select("doc_id", "split"), "doc_id")
    def shingled(split: String, out: String) = docs
      .where(col("split") === split)
      .select(col("doc_id").as(out),
        explode(TextOps.shingles(TextOps.tokens(col("text")))).as("sh"))
    shingled("train", "train_doc")
      .join(shingled("test", "eval_doc"), "sh")
      .groupBy(col("train_doc"), col("eval_doc"))
      .agg(count(lit(1)).as("n_shared"))
      .where(col("n_shared") >= minShared)
  }
}
