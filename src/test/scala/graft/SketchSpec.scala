package graft

import org.apache.spark.sql.functions._
import graft.operators.Sketches

/** HLL sketch tier: the properties the operator's 100 TB story rests on. */
class SketchSpec extends SparkSpec {
  import spark.implicits._

  test("shard-merge identity: union of per-shard sketches == global sketch") {
    // THE mergeability claim: building per-shard and union-merging must
    // give the estimator identical register state to one global pass —
    // so the estimates are EQUAL, not approximately equal. (This is what
    // makes per-day incremental maintenance lossless.)
    val rows = Sketches.shardMergeIdentity(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (m, g) = (r.getAs[Long]("est_merged"), r.getAs[Long]("est_global"))
      assert(m == g, s"${r.getAs[String]("event_type")}: merged $m != global $g")
    }
  }

  test("small-cardinality exactness: sketch estimate == exact below coupon cap") {
    // datasketches HLL stores raw coupons below a threshold — estimates
    // of small sets are exact, which the tolerance verdicts rely on to
    // be robust at sf0.001.
    val df = (1 to 500).map(i => (i.toLong, s"t${i % 3}")).toDF("u", "t")
    val out = df.groupBy($"t")
      .agg(count_distinct($"u").as("n"),
        hll_sketch_estimate(hll_sketch_agg($"u")).as("est"))
      .collect()
    out.foreach { r =>
      assert(r.getAs[Long]("est") == r.getAs[Long]("n"),
        s"${r.getString(0)}: est ${r.getAs[Long]("est")} != ${r.getAs[Long]("n")}")
    }
  }

  test("audience overlap: verdicts hold and exact columns match a recompute") {
    val out = Sketches.audienceOverlap(spark, sf0001)
    val rows = out.collect()
    // 5 fixture event types → C(5,2) = 10 ordered pairs.
    assert(rows.length == 10, s"expected 10 pairs, got ${rows.length}")
    rows.foreach { r =>
      assert(r.getAs[Int]("union_ok") == 1 && r.getAs[Int]("inter_ok") == 1,
        s"${r.getAs[String]("type_a")}/${r.getAs[String]("type_b")}: " +
          "sketch estimate fell outside the union-relative 5% bound")
    }
    // Exact intersection column against an independent formulation
    // (conditional distinct counts, no self-join).
    val ev = Tables.events(spark, sf0001)
      .select($"event_type", $"user_id").distinct()
    val pairs = rows.map(r => (r.getAs[String]("type_a"),
      r.getAs[String]("type_b"), r.getAs[Long]("n_inter_exact")))
    pairs.take(3).foreach { case (ta, tb, n) =>
      val expected = ev.where($"event_type" === ta || $"event_type" === tb)
        .groupBy($"user_id").agg(count(lit(1)).as("k"))
        .where($"k" === 2).count()
      assert(n == expected, s"$ta/$tb: $n != $expected")
    }
  }
}
