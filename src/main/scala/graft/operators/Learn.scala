package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Trainable quality filtering — the fastText-style "model-based quality
  * gate" tier of an LLM-data pipeline (heuristic gates: [[TextOps]];
  * this is the LEARNED gate trained on the corpus itself).
  *
  * [[qualityLr]] trains a logistic-style classifier by full-batch
  * gradient descent ON THE CLUSTER: each iteration is one map-side
  * partially-aggregated pass producing a single gradient row (4 longs +
  * a count — the bounded one-row driver probe class, same as the JDBC
  * bounds), and the updated weights re-enter the next pass as literals.
  * Nothing data-sized ever reaches the driver; per-iteration cost is
  * one linear scan, shuffle-free up to the one-row partial-merge. At
  * 100 TB this is the standard distributed-GD shape (N·d work per
  * epoch, d = 4), and the feature frame is localCheckpoint-pinned so
  * the epochs don't re-tokenize the corpus.
  *
  * Engine-exact determinism (the repo's discipline, two tricks):
  *  - Gradient sums are MICRO-UNIT FIXED-POINT: each per-row
  *    contribution rounds to 1e-6 units as a long BEFORE the sum, so
  *    the aggregate is an order-insensitive exact-integer sum (float
  *    accumulation order would diverge between Spark's partial
  *    aggregation tree and DuckDB's scan order — the BM25 lesson).
  *  - The activation is the RATIONAL sigmoid s(z) = (1 + z/(1+|z|))/2
  *    — same S-shape, (0,1) range, computed with +,−,×,÷,|·| only,
  *    which IEEE defines exactly; exp() is NOT cross-engine
  *    bit-stable (libm vs JVM differ in the last ulp), so the classic
  *    logistic link would make the twin flaky by construction.
  * Weight updates are w += (g/1e6)/n — identical operand-for-operand
  * in both engines (unit learning rate, folded into the feature
  * scale). The DuckDB twin unrolls the same [[Iterations]] epochs as
  * chained CTEs and lands on bit-identical weights, scores, and
  * verdicts.
  *
  * The training label is self-supervised from the corpus (is the
  * document's tagged language the pipeline's primary language?) — the
  * standard bootstrap when no human labels exist; swapping in a real
  * labeled frame changes only the `y` column. */
object Learn {

  /** Full-batch GD epochs. Three is enough to separate the fixture
    * (the loss surface is 4-dimensional and near-quadratic); the knob
    * a real deployment raises. */
  val Iterations = 3

  /** Fixed-point scale for the gradient sums (1e-6 per unit). */
  val Micro = 1000000L

  /** Feature frame: doc_id, label y ∈ {0,1}, and three bounded
    * features sharing [[TextOps.qualityScore]]'s exact derivations
    * (x1 length saturation, x2 punctuation ratio, x3 stopword ratio —
    * every one an IEEE quotient/min of integer-derived operands, so
    * both engines hold identical doubles before training starts). */
  def features(spark: SparkSession, dir: String): DataFrame =
    TextOps.qualityScore(spark, dir)
      .select(col("doc_id"), col("n_tokens"), col("punct_ratio"),
        col("stop_ratio"))
      .join(graft.Tables.documents(spark, dir)
        .select(col("doc_id"),
          when(col("lang") === "en", lit(1.0)).otherwise(lit(0.0)).as("y")),
        "doc_id")
      .select(col("doc_id"), col("y"),
        least(lit(1.0), col("n_tokens").cast("double") / lit(100.0))
          .as("x1"),
        col("punct_ratio").as("x2"),
        col("stop_ratio").as("x3"))

  /** Rational sigmoid — exact in IEEE arithmetic on both engines. */
  private def sig(z: Column): Column =
    lit(0.5) * (lit(1.0) + z / (lit(1.0) + abs(z)))

  /** z = w0·1 + w1·x1 + w2·x2 + w3·x3, strictly left-to-right — the
    * association the twin mirrors token-for-token. */
  private def zOf(w: Array[Double]): Column =
    lit(w(0)) * lit(1.0) + lit(w(1)) * col("x1") +
      lit(w(2)) * col("x2") + lit(w(3)) * col("x3")

  /** Train [[Iterations]] epochs from w = 0 and emit every document
    * with its learned score and verdict: (doc_id, is_en, score,
    * predicted). */
  def qualityLr(spark: SparkSession, dir: String): DataFrame = {
    // Pin the features so the epochs (and the final scoring pass) read
    // a materialized frame instead of re-tokenizing the corpus — the
    // q_lm_score precedent.
    val feats = features(spark, dir).localCheckpoint()
    val xs: Array[Column] =
      Array(lit(1.0), col("x1"), col("x2"), col("x3"))
    val w = Array(0.0, 0.0, 0.0, 0.0)
    for (_ <- 1 to Iterations) {
      val err = col("y") - sig(zOf(w))
      val gs = xs.zipWithIndex.map { case (x, j) =>
        sum(round(err * x * lit(Micro)).cast("long")).as(s"g$j")
      }
      val row = feats.agg(gs.head, (gs.tail :+
        count(lit(1)).as("n")): _*).head()
      val n = row.getLong(4)
      require(n > 0, s"qualityLr: empty corpus under $dir")
      var j = 0
      while (j < 4) {
        w(j) = w(j) + (row.getLong(j) / 1e6) / n
        j += 1
      }
    }
    val score = sig(zOf(w))
    feats.select(col("doc_id"), (col("y") === lit(1.0)).as("is_en"),
      score.as("score"), (score >= lit(0.5)).as("predicted"))
  }
}
