package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.apache.spark.sql.functions._
import graft.operators.Joins

/** ScalaCheck properties for the generalized temporal joins: on random
  * event sets (duplicate timestamps, empty sides, dense clusters
  * included by construction), the banded/union-window formulations must
  * equal the brute-force inequality joins row for row. */
class JoinsPropertySpec extends SparkSpec {
  import spark.implicits._

  // Tight domains on purpose: collisions (same key, same ts) and
  // just-inside/outside-the-window gaps must actually occur.
  private val eventGen = for {
    key <- Gen.chooseNum(1L, 4L)
    ts <- Gen.chooseNum(0L, 50L)
  } yield (key, ts)

  private def sample(n: Int, seed: Long): List[(Long, Long, Long)] =
    Gen.listOfN(n, eventGen)
      .pureApply(Gen.Parameters.default, Seed(seed))
      .zipWithIndex.map { case ((k, ts), id) => (id.toLong, k, ts) }

  test("asofJoin == brute-force greatest-at-or-before (15 generated cases)") {
    (1L to 15L).foreach { seed =>
      val rows = sample(40, seed).toDF("event_id", "user_id", "ts_us")
      val left = rows.where($"event_id" % 2 === 0)
      val right = rows.where($"event_id" % 2 === 1)
      val got = Joins.asofJoin(left, right, Seq("user_id"), "ts_us", "event_id")
        .select($"event_id", $"asof_event_id")
      val brute = left.alias("l").join(right.alias("r"),
          $"r.user_id" === $"l.user_id" && $"r.ts_us" <= $"l.ts_us", "left")
        .groupBy($"l.event_id".as("event_id"))
        .agg(max(struct($"r.ts_us", $"r.event_id")).as("best"))
        .select($"event_id", $"best.event_id".as("asof_event_id"))
      assert(got.exceptAll(brute).isEmpty && brute.exceptAll(got).isEmpty,
        s"seed $seed")
    }
  }

  test("asofJoin carries left payload columns through untouched") {
    val rows = sample(30, 42L).toDF("event_id", "user_id", "ts_us")
    val left = rows.where($"event_id" % 2 === 0)
      .withColumn("payload", $"event_id" * 10 + $"user_id")
    val right = rows.where($"event_id" % 2 === 1)
    val out = Joins.asofJoin(left, right, Seq("user_id"), "ts_us", "event_id")
    assert(out.columns.contains("payload"))
    assert(out.count() == left.count())
    assert(out.where($"payload" =!= $"event_id" * 10 + $"user_id").isEmpty)
  }

  test("rangeJoin == brute-force inequality join (15 generated cases)") {
    val width = 7L
    (1L to 15L).foreach { seed =>
      val ev = sample(40, seed).toDF("event_id", "user_id", "ts_us")
      val got = Joins.rangeJoin(ev, Seq("user_id"), "ts_us", width)
        .select($"a_event_id", $"b_event_id")
      val brute = ev.alias("a").join(ev.alias("b"),
          $"a.user_id" === $"b.user_id" &&
            $"b.ts_us" > $"a.ts_us" && $"b.ts_us" <= $"a.ts_us" + width)
        .select($"a.event_id".as("a_event_id"), $"b.event_id".as("b_event_id"))
      assert(got.exceptAll(brute).isEmpty && brute.exceptAll(got).isEmpty,
        s"seed $seed")
    }
  }

  test("bloom-pruned join: result identical to the plain join, probe in plan") {
    val li = Tables.lineitem(spark, sf0001)
      .select(col("l_orderkey"), col("l_quantity"))
    val o = Tables.orders(spark, sf0001)
      .where(col("o_orderpriority") === "1-URGENT")
      .select(col("o_orderkey"))
    val plain = li.join(o, col("l_orderkey") === col("o_orderkey"))
    // A deliberately UNDERSIZED sketch (worst realistic case: fpp way
    // above nominal) must still give the identical result — correctness
    // is fpp-independent by construction.
    for (items <- Seq(1L << 16, 64L)) {
      val pruned = graft.operators.Joins.bloomPrunedJoin(
        li, o, Seq("l_orderkey"), Seq("o_orderkey"), expectedItems = items)
      assert(pruned.exceptAll(plain).isEmpty &&
        plain.exceptAll(pruned).isEmpty, s"items=$items")
    }
    val p = graft.operators.Joins.bloomPrunedJoin(
      li, o, Seq("l_orderkey"), Seq("o_orderkey"), 1L << 16)
      .queryExecution.executedPlan.toString
    assert(p.contains("might_contain"),
      s"bloom probe missing from the physical plan:\n$p")
  }
}
