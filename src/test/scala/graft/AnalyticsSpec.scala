package graft

import org.apache.spark.sql.functions._
import graft.operators.{Events, TextOps}

/** Semantic invariants for the round-5 analytic surface: lead/lag
  * self-consistency, ntile bucket balance, pivot mass conservation,
  * z-score guard paths, and the approx-quantile rank-tolerance verdict.
  * (Value-level parity vs DuckDB is the oracle gate's job; these pin the
  * properties an oracle hash can't express — e.g. that a pivot conserves
  * the un-pivoted mass, or that zero variance can never divide by zero.) */
class AnalyticsSpec extends SparkSpec {
  import spark.implicits._

  test("propsKpis: malformed JSON rows count toward n but not k aggregates") {
    val ts0 = java.sql.Timestamp.valueOf("2024-03-01 10:00:00")
    val df = Seq(
      (ts0, "click", """{"k": 10}"""),
      (ts0, "click", """{"k": 4}"""),
      (ts0, "click", "not json at all"),   // from_json → null k
      (ts0, "click", """{"other": 1}"""))  // valid JSON, missing field
      .toDF("ts", "event_type", "props")
    val r = Events.propsKpisOf(df).head()
    assert(r.getAs[Long]("n") == 4)           // every row counted
    assert(r.getAs[Long]("sum_k") == 14)      // nulls excluded from sums
    assert(r.getAs[Int]("min_k") == 4 && r.getAs[Int]("max_k") == 10)
    assert(r.getAs[Double]("avg_k") == 14.0 / 4) // denominator = all rows
  }

  test("leadlag: prev/next gaps mirror each other and nulls mark stream edges") {
    val ll = Events.leadLagAnalytics(spark, sf0001).cache()
    try {
      val users = ll.select(col("user_id")).distinct().count()
      assert(ll.where(col("prev_gap_us").isNull).count() == users,
        "exactly one null prev-gap (the first event) per user")
      assert(ll.where(col("next_gap_us").isNull).count() == users,
        "exactly one null next-gap (the last event) per user")
      assert(ll.where(col("prev_gap_us") < 0 || col("next_gap_us") < 0)
        .count() == 0, "time moves forward within a user stream")
      // Every non-edge prev gap is some event's next gap of the same
      // size: the two multisets (grouped per user) must be identical.
      val prevM = ll.where(col("prev_gap_us").isNotNull)
        .groupBy(col("user_id"), col("prev_gap_us").as("gap"))
        .count()
      val nextM = ll.where(col("next_gap_us").isNotNull)
        .groupBy(col("user_id"), col("next_gap_us").as("gap"))
        .count()
      assert(prevM.exceptAll(nextM).isEmpty && nextM.exceptAll(prevM).isEmpty,
        "per-user prev-gap and next-gap multisets must coincide")
    } finally ll.unpersist()
  }

  test("leadlag: ntile quartiles are balanced and ordered by value") {
    val ll = Events.leadLagAnalytics(spark, sf0001).cache()
    try {
      val sizes = ll.groupBy("user_id", "value_quartile").count()
        .groupBy("user_id")
        .agg(max("count").as("mx"), min("count").as("mn"),
          countDistinct("value_quartile").as("nq"))
        .collect()
      sizes.foreach { r =>
        assert(r.getAs[Long]("mx") - r.getAs[Long]("mn") <= 1,
          s"ntile buckets within a user differ by at most 1: $r")
        assert(r.getAs[Long]("nq") <= 4)
      }
      // pct_rank must be monotone in value within a user: the max value
      // of quartile q stays <= the min value of quartile q+1.
      val q = ll.groupBy("user_id", "value_quartile")
        .agg(max("value_pct_rank").as("mxp"), min("value_pct_rank").as("mnp"))
      val viol = q.as("a").join(q.as("b"),
          $"a.user_id" === $"b.user_id" &&
            $"a.value_quartile" + 1 === $"b.value_quartile")
        .where($"a.mxp" > $"b.mnp")
      assert(viol.isEmpty, "percent_rank ordered across quartile boundaries")
    } finally ll.unpersist()
  }

  test("pivot conserves the un-pivoted mass per day") {
    val piv = Events.typePivot(spark, sf0001)
    val nCols = Events.EventTypes.map(t => coalesce(col(s"${t}_n"), lit(0L)))
    val fromPivot = piv.select(
      col("date"), nCols.reduce(_ + _).as("n"))
    val plain = Tables.events(spark, sf0001)
      .groupBy(to_date(col("ts")).cast("string").as("date"))
      .agg(count(lit(1)).as("n"))
    assert(fromPivot.exceptAll(plain).isEmpty &&
      plain.exceptAll(fromPivot).isEmpty,
      "summing the pivoted counts re-derives the plain per-day counts")
  }

  test("pivot then unpivot round-trips to the plain two-key aggregate") {
    val melted = Events.typeUnpivot(spark, sf0001)
    val plain = Tables.events(spark, sf0001)
      .groupBy(to_date(col("ts")).cast("string").as("date"),
        col("event_type"))
      .agg(round(sum(col("value")), 2).as("daily_value"))
    assert(melted.exceptAll(plain).isEmpty &&
      plain.exceptAll(melted).isEmpty,
      "unpivot(pivot(x)) == groupBy(date, event_type) exactly")
  }

  test("unpivot keeps all-NULL-value cells and drops truly absent ones") {
    // A day where clicks happened but every value was NULL (n=2, v=null)
    // must survive the melt with a NULL sum — that IS what the plain
    // aggregate produces; a combo with no rows at all (n=null) must not.
    val piv = Seq(("2026-01-01", Some(2L), None: Option[Double]))
      .toDF("date", "click_n", "click_value")
      .withColumn("error_n", lit(null).cast("long"))
      .withColumn("error_value", lit(null).cast("double"))
      .withColumn("purchase_n", lit(3L))
      .withColumn("purchase_value", lit(1.5))
      .withColumn("signup_n", lit(null).cast("long"))
      .withColumn("signup_value", lit(null).cast("double"))
      .withColumn("view_n", lit(null).cast("long"))
      .withColumn("view_value", lit(null).cast("double"))
    val out = Events.meltTypePivot(piv).collect()
      .map(r => (r.getString(1), Option(r.get(2)))).toMap
    assert(out == Map("click" -> None, "purchase" -> Some(1.5)),
      s"melt keeps the null-sum click cell, drops absent types: $out")
  }

  test("cube grains re-aggregate consistently to the same total") {
    val cube = Events.typeCube(spark, sf0001).cache()
    try {
      val total = Tables.events(spark, sf0001).count()
      def mass(gType: Int, gDate: Int): Long =
        cube.where(col("g_type") === gType && col("g_date") === gDate)
          .agg(sum("n_events")).head().getLong(0)
      assert(mass(0, 0) == total, "cell grain sums to the corpus")
      assert(mass(0, 1) == total, "per-type grain sums to the corpus")
      assert(mass(1, 0) == total, "per-day grain sums to the corpus")
      assert(mass(1, 1) == total, "grand-total row IS the corpus count")
    } finally cube.unpersist()
  }

  test("anomaly z-scores: zero variance and single-row series never blow up") {
    val daily = Seq(
      ("flat", "2026-01-01", 10.0), ("flat", "2026-01-02", 10.0),
      ("flat", "2026-01-03", 10.0),
      ("lone", "2026-01-01", 42.0),
      ("spike", "2026-01-01", 10.0), ("spike", "2026-01-02", 10.0),
      ("spike", "2026-01-03", 10.0), ("spike", "2026-01-04", 10.0),
      ("spike", "2026-01-05", 10.0), ("spike", "2026-01-06", 10.0),
      ("spike", "2026-01-07", 200.0))
      .toDF("event_type", "date", "daily_value")
    val out = Events.anomaliesFromDaily(daily).cache()
    try {
      assert(out.where(col("z").isNull || isnan(col("z"))).count() == 0)
      assert(out.where(col("event_type").isin("flat", "lone") &&
        (col("z") =!= 0.0 || col("anomaly") =!= 0)).count() == 0,
        "constant and single-point series carry z=0, no anomaly")
      val spike = out.where(col("event_type") === "spike" &&
        col("date") === "2026-01-07").collect().head
      assert(spike.getAs[Int]("anomaly") == 1 &&
        spike.getAs[Double]("z") > 2.0, s"the 20x day is flagged: $spike")
      assert(out.where(col("event_type") === "spike").count() == 7)
    } finally out.unpersist()
  }

  /** Σz = 0 holds exactly for (x-mean)/std over any series; rounding
    * to 6 dp (Events z output) leaves at most n·5e-7 of drift. */
  private def assertSeriesZSumsToZero(out: org.apache.spark.sql.DataFrame,
                                      ctx: String): Unit =
    out.groupBy("event_type")
      .agg(sum("z").as("sz"), count(lit(1)).as("n")).collect()
      .foreach { r =>
        assert(math.abs(r.getAs[Double]("sz")) <= r.getAs[Long]("n") * 5e-7,
          s"$ctx: z-scores of a series sum to zero: $r")
      }

  test("anomaly core matches an independent z computation (20 seeds)") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val threshold = 1.5 // non-default, so the parameter is proven threaded
    val rowGen = for {
      typ <- Gen.oneOf("a", "b", "c")
      day <- Gen.chooseNum(1, 28)
      cents <- Gen.chooseNum(-500000L, 500000L)
    } yield (typ, f"2026-01-$day%02d", cents / 100.0)
    (1L to 20L).foreach { seed =>
      val rows = Gen.listOfN(40, rowGen)
        .pureApply(Gen.Parameters.default, Seed(seed))
        .distinctBy(r => (r._1, r._2)) // one row per (type, day)
      // Driver-side oracle, same arithmetic shape as the operator
      // (BigDecimal HALF_UP mirrors Spark's round(_, 6)).
      val byType = rows.groupBy(_._1)
      val expected: Map[(String, String), (Double, Int)] =
        byType.flatMap { case (typ, rs) =>
          val cents = rs.map(r => math.round(r._3 * 100).toDouble)
          val n = cents.size
          val (s1, s2) = (cents.sum, cents.map(c => c * c).sum)
          val mean = s1 / n
          val varc = if (n > 1) (s2 - s1 * s1 / n) / (n - 1) else 0.0
          rs.zip(cents).map { case (r, c) =>
            val z = if (varc > 0)
              BigDecimal((c - mean) / math.sqrt(varc))
                .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
            else 0.0
            (typ, r._2) -> (z, if (math.abs(z) >= threshold) 1 else 0)
          }
        }
      val out = Events.anomaliesFromDaily(
        rows.toDF("event_type", "date", "daily_value"), threshold).cache()
      try {
        assert(out.count() == rows.size, s"seed $seed: no rows lost/dropped")
        out.collect().foreach { r =>
          val key = (r.getString(0), r.getString(1))
          val (zExp, flagExp) = expected(key)
          val z = r.getDouble(3)
          assert(!z.isNaN && math.abs(z - zExp) <= 1e-9,
            s"seed $seed $key: z=$z expected $zExp")
          assert(r.getInt(4) == flagExp,
            s"seed $seed $key: flag=${r.getInt(4)} expected $flagExp")
        }
        assertSeriesZSumsToZero(out, s"seed $seed")
      } finally out.unpersist()
    }
  }

  test("anomaly on the fixture: z-scores of each series sum to ~0") {
    assertSeriesZSumsToZero(Events.valueAnomalies(spark, sf0001), "fixture")
  }

  test("heavy hitters: sketch tracks every exact top-k token within additive error") {
    val hh = TextOps.heavyHitters(spark, sf0001).cache()
    try {
      assert(hh.count() == 20)
      assert(hh.where(col("approx_ok") =!= 1).count() == 0,
        "every exact heavy hitter appears in the sketch within tolerance")
      // The exact side must equal a brute-force count over the token
      // stream with the same (count desc, token) tie-break.
      val brute = Tables.documents(spark, sf0001)
        .select(explode(TextOps.tokens(col("text"))).as("tok"))
        .groupBy("tok").count()
        .orderBy(col("count").desc, col("tok")).limit(20)
        .withColumnRenamed("count", "n_tok")
      assert(hh.select("tok", "n_tok").exceptAll(brute).isEmpty &&
        brute.exceptAll(hh.select("tok", "n_tok")).isEmpty,
        "exact top-k side matches brute force")
    } finally hh.unpersist()
  }

  test("approx quantiles agree with the exact inverse-ECDF path") {
    val aq = TextOps.approxLengthQuantiles(spark, sf0001).cache()
    try {
      assert(aq.where(col("approx_ok") =!= 1).count() == 0,
        "GK sketch rank error within tolerance for every (lang, pct)")
      // exact_chars must match the wide exact-quantile frame column-wise.
      val wide = TextOps.lengthQuantiles(spark, sf0001)
      TextOps.QuantilePcts.foreach { p =>
        val fromWide = wide.select(col("lang"), col(s"p${p}_chars"))
        val fromLong = aq.where(col("pct") === p)
          .select(col("lang"), col("exact_chars"))
        assert(fromWide.exceptAll(fromLong).isEmpty &&
          fromLong.exceptAll(fromWide).isEmpty,
          s"p$p exact quantiles agree between the wide and long frames")
      }
    } finally aq.unpersist()
  }
}
