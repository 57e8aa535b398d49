package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Salted two-phase grouped top-k, shared by every operator that keeps
  * k rows per group (top products, cosine top-k, exact-k sampling):
  * phase 1 ranks within (group, salt-bucket) and keeps k per bucket —
  * no task ever sorts a whole group's candidate list — phase 2 ranks
  * the surviving k·buckets rows per group. Emits the final position as
  * `rank` (1-based, dense by construction). The ordering must be total
  * (break ties on a unique column) or ranks are nondeterministic. */
object Ranking {
  def saltedTopK(df: DataFrame, part: Seq[Column], ord: Seq[Column],
                 saltOn: Column, k: Int, saltBuckets: Int): DataFrame = {
    require(!df.columns.contains("rank") && !df.columns.contains("salt_rank"),
      "saltedTopK emits 'rank' and uses 'salt_rank' internally — rename " +
        "the input's conflicting column(s) first")
    val salted = Window
      .partitionBy(part :+ pmod(saltOn, lit(saltBuckets)): _*)
      .orderBy(ord: _*)
    val global = Window.partitionBy(part: _*).orderBy(ord: _*)
    df.withColumn("salt_rank", row_number().over(salted))
      .filter(col("salt_rank") <= k)
      .drop("salt_rank")
      .withColumn("rank", row_number().over(global))
      .filter(col("rank") <= k)
  }

  /** Standalone global ORDER BY … LIMIT (VERDICT r5 ask #5) — the one
    * everyday interactive shape that had no dedicated oracle row: the
    * n longest documents by `n_chars`, `doc_id` ASC tiebreak (total
    * order ⇒ deterministic result). Spark plans `orderBy(…).limit(n)`
    * as TakeOrderedAndProject: each partition keeps an n-row heap and
    * the driver merges #partitions·n rows — NO global sort, no range
    * exchange, no skew exposure, so the shape holds at any corpus size
    * for interactive n. PlanAuditSpec pins the plan sort-free. */
  def orderLimit(spark: SparkSession, dir: String, n: Int = 100): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"), col("source"), col("n_chars"))
      .orderBy(col("n_chars").desc, col("doc_id").asc)
      .limit(n)
}
