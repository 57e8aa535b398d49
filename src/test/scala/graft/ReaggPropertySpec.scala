package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.apache.spark.sql.functions._

/** SURVEY §5.3: ScalaCheck-generated re-aggregation invariants of the E3
  * rollup — final agg over UNION ALL of partial aggs ≡ direct agg, and
  * SUM(income - cost) ≡ SUM(income) - SUM(cost) per group (exact,
  * because all money is integer cents rendered as 2-dp doubles).
  * (Plain ScalaCheck generators with fixed seeds — deterministic, no
  * scalatest-plus bridge needed.) */
class ReaggPropertySpec extends SparkSpec {
  import spark.implicits._

  private val rowGen = for {
    country <- Gen.oneOf("Peru", "Chile", "Ghana")
    date <- Gen.oneOf("2023-07-01", "2023-07-02")
    cents <- Gen.chooseNum(0L, 100000L)
  } yield (country, date, cents / 100.0)

  private def sample(n: Int, seed: Long): List[(String, String, Double)] =
    Gen.listOfN(n, rowGen)
      .pureApply(Gen.Parameters.default, Seed(seed))

  test("re-agg of unioned partials equals direct agg (20 generated cases)") {
    (1L to 20L).foreach { seed =>
      val rows = sample(60, seed)
      val df = rows.toDF("country", "date", "income")
      val a = df.limit(rows.size / 2)
      val b = df.exceptAll(a)
      val partial = a.groupBy($"country", $"date")
        .agg(sum($"income").as("s"), count(lit(1)).as("c"))
        .union(b.groupBy($"country", $"date")
          .agg(sum($"income").as("s"), count(lit(1)).as("c")))
        .groupBy($"country", $"date")
        .agg(round(sum($"s"), 2).as("income"), sum($"c").as("n"))
      val direct = df.groupBy($"country", $"date")
        .agg(round(sum($"income"), 2).as("income"), count(lit(1)).as("n"))
      assert(partial.exceptAll(direct).isEmpty &&
        direct.exceptAll(partial).isEmpty, s"seed $seed")
    }
  }

  test("SUM(income - cost) == SUM(income) - SUM(cost) after 2-dp rounding") {
    (1L to 20L).foreach { seed =>
      val df = sample(40, seed).toDF("country", "date", "income")
        .withColumn("cost", round($"income" * 0.5, 2))
      val r = df.agg(
        round(sum($"income" - $"cost"), 2).as("a"),
        (round(sum($"income"), 2) - round(sum($"cost"), 2)).as("b"))
        .head()
      assert(math.abs(r.getDouble(0) - r.getDouble(1)) < 1e-9, s"seed $seed")
    }
  }
}
