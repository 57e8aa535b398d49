package graft.operators

import org.apache.spark.sql.DataFrame

/** Spread a frame across the cluster before CPU-heavy per-row stages
  * (tokenization, shingling, hashing, vector math): a corpus delivered
  * as few large files otherwise pins the work to the file-split count —
  * measured 11 s single-task vs sub-second spread for the shingle
  * explode at sf0.1. One definition so the lesson can't drift. */
object Spread {
  def apply(df: DataFrame): DataFrame =
    df.repartition(df.sparkSession.sparkContext.defaultParallelism)
}
