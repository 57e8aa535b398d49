package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Reference-parity relational operators (SURVEY.md §2.2–§2.7).
  *
  * The reference's medallion model — raw (campaigns / transactions / sales)
  * → master join (`modeling_tables/master_layer/m_data_model.sql`) → five
  * business rollups (`modeling_tables/business_layer` SQL files) — re-expressed
  * over the TPC-H-ish fixtures per FIXTURES.md:
  *   transactions ← orders ⨝ customer ⨝ nation (country via nationkey)
  *   sales/additional_data ← lineitem (⨝ part for `category`)
  *   campaigns ← derived per (country, month) cost dimension
  *
  * Determinism discipline (SURVEY §7.4.5): every double aggregate that
  * crosses the DuckDB-oracle boundary is `round(·, 2)` for sums of 2-dp
  * inputs (the true sum is a multiple of 0.01, so rounding recovers the
  * exact value independent of summation order) and `round(·, 6)` for
  * derived ratios computed from already-exact operands. The same formulas,
  * token for token, appear in SparkEntry.oracleSql.
  */
object Relational {

  /** Exact sum of 2-dp doubles — order-insensitive, engine-portable. */
  def rsum2(c: Column): Column = round(sum(c), 2)

  /** Exact sum of 3-dp doubles (campaign_cost carries 3 decimals because it
    * is 10% of a 2-dp sum; rounding to 2 would sit exactly on the .xx5
    * half-way boundary where Spark and DuckDB round differently). */
  def rsum3(c: Column): Column = round(sum(c), 3)

  /** AVG re-expressed as exact-sum / count with NO final rounding: both
    * operands are bit-identical across engines, so the IEEE quotient is
    * bit-identical too — rounding it would only reintroduce half-way
    * boundary risk. (Reference uses plain AVG: b_performance_metrics.sql:7-8.) */
  def ravg2(c: Column): Column = round(sum(c), 2) / count(c)
  def ravg3(c: Column): Column = round(sum(c), 3) / count(c)

  /** DATE group keys are emitted as 'yyyy-MM-dd' strings: parquet date32 and
    * DuckDB DATE normalize differently through pandas, strings never do. */
  def dateStr(c: Column): Column = to_date(c).cast("string")

  /** Transaction frame: reference `raw_layer.r_transactions`
    * (cloud_composer/datapipeline_gcp.py:247-252) on fixtures.
    *
    * Scale notes: `nation` is genuinely bounded (25 rows at any SF) →
    * explicit broadcast. `customer` grows linearly with SF (TB-scale at
    * 100 TB), so NO hint — AQE's autoBroadcastJoinThreshold decides (it
    * still broadcasts at fixture scale, and falls back to a shuffled
    * hash/sort-merge join when customer outgrows the threshold). */
  def transactions(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .join(Tables.customer(spark, dir),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(spark, dir)),
        col("c_nationkey") === col("n_nationkey"))
      .select(
        col("o_orderkey").as("transaction_id"),
        col("o_totalprice").as("income"),
        col("n_name").as("transaction_country"),
        col("n_nationkey"),
        col("o_orderdate").as("transaction_datetime"),
        col("o_custkey").as("customer_id"),
        trunc(col("o_orderdate"), "month").as("tmonth"))

  /** Unique campaign key per (nation, year, month) — ADVICE r1: encode the
    * year so campaigns in the same calendar month of different years
    * (orders span 1992-1998) never collide. Mirrored token-for-token in
    * SparkEntry's oracle CTE. */
  private def campaignIdCol: Column =
    (col("n_nationkey") * 1000000 + year(col("tmonth")) * 100 +
      month(col("tmonth"))).cast("long")

  /** Compact (nation, country, month) campaign-cost aggregate — the ONE
    * place the cost formula lives. Cardinality is bounded at any SF:
    * ≤ 25 nations × #distinct-months (hundreds even for a decades-long
    * corpus), so the result is always broadcastable. */
  private def campaignCosts(txn: DataFrame): DataFrame =
    txn
      .groupBy(col("n_nationkey"), col("transaction_country"), col("tmonth"))
      .agg(round(round(sum(col("income")), 2) * lit(0.1).cast("double"), 3)
        .as("campaign_cost"))

  /** Campaign dimension: reference `raw_layer.r_campaigns`
    * (cloud_composer/datapipeline_gcp.py:230-235). Fixtures carry no
    * campaign table, so it is derived deterministically: one campaign per
    * (country, month) whose cost is 10% of that month's order income. */
  def campaigns(spark: SparkSession, dir: String): DataFrame =
    campaignCosts(transactions(spark, dir))
      .select(
        campaignIdCol.as("campaign_id"),
        col("campaign_cost"),
        col("transaction_country").as("campaign_country"),
        col("tmonth").as("campaign_month"))

  /** Master model: J1 composite-key join + J2 single-key join + dim join,
    * 11-column projection — `modeling_tables/master_layer/m_data_model.sql:1-20`
    * and QUERY_MASTER (cloud_composer/datapipeline_gcp.py:95-117).
    *
    * Shape at scale (VERDICT r5 fix, §8.7 decision of record):
    * `campaign_cost` is the compact [[campaignCosts]] aggregate BROADCAST
    * back onto the fact — never a window over the raw transaction stream.
    * The cost dimension's cardinality is bounded (≤ 25 nations ×
    * #months) at any SF, so the join-back is a broadcast hash join and
    * the fact side never shuffles at all; the r1–r4 window formulation
    * shuffled the ENTIRE fact on a (country, month) key whose partitions
    * grow linearly with corpus size and which AQE can never skew-split
    * (windows pin one partition per task; joins it can split). The
    * round(·,2)/(·,3) discipline makes the agg+join-back value
    * bit-identical to the window form, so the change is hash-neutral.
    *
    * Ad-hoc-vs-standing trade: computing the aggregate from `txn` re-plans
    * the orders⨝customer⨝nation subtree a second time (Catalyst plans
    * aggregate-of-X ⨝ X as two subtrees); the E1 driver passes a
    * PERSISTED transaction frame here, making that second pass a cheap
    * cached read. At 100 TB the standing pipeline always runs the
    * persisted-frame path.
    *
    * `part` carries no broadcast hint (it scales with SF); AQE picks the
    * join strategy. The orders→lineitem fanout is the reference's
    * intentional many-to-many semantics (SURVEY §7.4.3). */
  def masterModel(spark: SparkSession, dir: String): DataFrame =
    masterModelFrom(transactions(spark, dir),
      Tables.lineitem(spark, dir), Tables.part(spark, dir))

  /** masterModel over prebuilt inputs — the E1 pipeline driver passes a
    * persisted transaction frame here so the whole DAG computes it once. */
  def masterModelFrom(txn: DataFrame, li: DataFrame, part: DataFrame): DataFrame = {
    // Null-safe join keys (<=>) reproduce the window's null-grouping
    // semantics exactly; Spark still plans <=> as a hashable equi-join.
    val costs = broadcast(campaignCosts(txn)
      .select(
        col("n_nationkey").as("cc_nationkey"),
        col("transaction_country").as("cc_country"),
        col("tmonth").as("cc_month"),
        col("campaign_cost")))
    txn
      .withColumn("campaign_id", campaignIdCol)
      .join(costs,
        col("n_nationkey") <=> col("cc_nationkey") &&
          col("transaction_country") <=> col("cc_country") &&
          col("tmonth") <=> col("cc_month"))
      .join(li, col("transaction_id") === col("l_orderkey"))
      .join(part, col("l_partkey") === col("p_partkey"))
      .select(
        col("campaign_id"),
        col("campaign_cost"),
        col("transaction_id"),
        col("income"),
        col("transaction_country"),
        col("customer_id"),
        col("l_partkey").as("product_id"),
        col("l_quantity").as("quantity"),
        col("l_extendedprice").as("price"),
        col("p_brand").as("category"),
        col("transaction_datetime"))
  }

  /** b_performance_metrics.sql:1-16 — A1 group-by, A4 countDistinct,
    * A6 sums/avgs, A7 ratio-of-aggregates.
    *
    * DATE group key, string form applied AFTER the final aggregate
    * (r17 optimization round, guide §2.3 "narrower types"): grouping on
    * the raw 4-byte DATE instead of its 10-char string is identical
    * (equal dates ⟺ equal strings, null ⟺ null), narrows every
    * partial-agg exchange row of the dated business family, and runs
    * the format expression once per GROUP instead of once per
    * fact-stream row. Same-JVM A/B at sf0.1: salesKpi 1.70→1.51 /
    * 1.48→1.32 s, retention 1.59→1.39 / 1.45→1.32 s across interleaved
    * arms. The spec twins (performanceMetricsTwoPhase,
    * customerRetentionExpand) deliberately KEEP the string key, so the
    * existing bit-identity pins also pin this rewrite. */
  def performanceMetrics(master: DataFrame): DataFrame =
    master
      .groupBy(col("transaction_country").as("country"),
        col("transaction_datetime").as("_d"))
      .agg(
        countDistinct(col("transaction_id")).as("transaction_count"),
        rsum2(col("income")).as("total_income"),
        rsum3(col("campaign_cost")).as("total_campaign_cost"),
        ravg2(col("income")).as("average_income"),
        ravg3(col("campaign_cost")).as("average_campaign_cost"),
        rsum3(col("income") - col("campaign_cost")).as("total_profit"),
        (round(sum(col("income")), 2) / countDistinct(col("transaction_id")))
          .as("average_transaction_value"))
      .select(col("country"), dateStr(col("_d")).as("date"),
        col("transaction_count"), col("total_income"),
        col("total_campaign_cost"), col("average_income"),
        col("average_campaign_cost"), col("total_profit"),
        col("average_transaction_value"))

  /** The 100 TB shape for [[performanceMetrics]]'s exact distinct count
    * (SURVEY §4 watch list): Spark plans mixed distinct + plain
    * aggregates as an Expand that doubles every input row through the
    * shuffle; this two-phase form pre-aggregates on (group keys,
    * transaction_id) — map-side combine collapses the orders→lineitem
    * fanout before any exchange — then finishes with a plain aggregate
    * where the distinct count is a row count. Bit-identical results
    * (spec-proven): all money passes unrounded through phase 1 and hits
    * the same round(·, 2/3) at the end, which recovers the exact value
    * in any summation order; null-bearing rows contribute to exactly
    * the same aggregates as in the Expand form (per-column non-null
    * counts, per-row profit differences, null-skipping sums). Only
    * requirement: transaction_id non-null (it is the join key — a null
    * id would count as one distinct group here vs zero in
    * countDistinct). */
  def performanceMetricsTwoPhase(master: DataFrame): DataFrame =
    master
      .groupBy(col("transaction_country").as("country"),
        dateStr(col("transaction_datetime")).as("date"),
        col("transaction_id"))
      .agg(
        sum(col("income")).as("s_income"),
        sum(col("campaign_cost")).as("s_cost"),
        sum(col("income") - col("campaign_cost")).as("s_profit"),
        count(col("income")).as("n_income"),
        count(col("campaign_cost")).as("n_cost"))
      .groupBy(col("country"), col("date"))
      .agg(
        count(lit(1)).as("transaction_count"),
        round(sum(col("s_income")), 2).as("total_income"),
        round(sum(col("s_cost")), 3).as("total_campaign_cost"),
        (round(sum(col("s_income")), 2) / sum(col("n_income")))
          .as("average_income"),
        (round(sum(col("s_cost")), 3) / sum(col("n_cost")))
          .as("average_campaign_cost"),
        round(sum(col("s_profit")), 3).as("total_profit"),
        (round(sum(col("s_income")), 2) / count(lit(1)))
          .as("average_transaction_value"))

  /** b_product_performance.sql:1-18 — A2 three-key group-by. DATE
    * group key per [[performanceMetrics]] — this row's distinct
    * rewrite exchanges at ~lineitem grain, the family's widest, so the
    * narrower key matters most here. */
  def productPerformance(master: DataFrame): DataFrame =
    master
      .groupBy(col("product_id"), col("transaction_country").as("country"),
        col("transaction_datetime").as("_d"))
      .agg(
        countDistinct(col("transaction_id")).as("transaction_count"),
        rsum2(col("quantity")).as("total_quantity"),
        rsum2(col("income")).as("total_income"),
        ravg2(col("income")).as("average_income"),
        rsum3(col("income") - col("campaign_cost")).as("total_profit"),
        (round(sum(col("income")), 2) / countDistinct(col("transaction_id")))
          .as("average_transaction_value"))
      .select(col("product_id"), col("country"),
        dateStr(col("_d")).as("date"), col("transaction_count"),
        col("total_quantity"), col("total_income"), col("average_income"),
        col("total_profit"), col("average_transaction_value"))

  /** b_profitability_kpi.sql:1-14 — A3 two-key group-by, no date. */
  def profitabilityKpi(master: DataFrame): DataFrame =
    master
      .groupBy(col("product_id"), col("transaction_country").as("country"))
      .agg(
        rsum2(col("quantity")).as("total_quantity"),
        rsum2(col("income")).as("total_income"),
        ravg2(col("income")).as("average_income"),
        rsum3(col("income") - col("campaign_cost")).as("total_profit"))

  /** b_sales_kpi.sql:1-14. DATE group key per [[performanceMetrics]]. */
  def salesKpi(master: DataFrame): DataFrame =
    master
      .groupBy(col("transaction_country").as("country"),
        col("transaction_datetime").as("_d"))
      .agg(
        countDistinct(col("transaction_id")).as("transaction_count"),
        rsum2(col("income")).as("total_income"),
        ravg2(col("income")).as("average_income"),
        rsum3(col("income") - col("campaign_cost")).as("total_profit"))
      .select(col("country"), dateStr(col("_d")).as("date"),
        col("transaction_count"), col("total_income"),
        col("average_income"), col("total_profit"))

  /** b_customer_retention.sql:1-14 — A5 conditional distinct count
    * (`COUNT(DISTINCT CASE WHEN income > 0 THEN customer_id END)`).
    *
    * Two-phase no-Expand shape (r17 optimization round, guide §2.3
    * "aggregate before you shuffle"): the direct three-countDistinct
    * form plans an Expand that emits every master row THREE times (one
    * slice per distinct aggregate) before the first exchange — the only
    * remaining Expand on the business surface (single-distinct
    * aggregates get the planner's own two-level rewrite; three distinct
    * NULL-gated projections of the same column do not). Phase 1 groups
    * at (country, date, customer_id) grain — map-side combine collapses
    * the orders→lineitem fanout BEFORE the exchange, one row per
    * customer-day, with two 1-or-null flags; phase 2 turns each
    * conditional distinct count into a non-null flag count. Identity
    * argument (same class as [[performanceMetricsTwoPhase]], spec-pinned
    * in RelationalSpec):
    *  - customer_id is a join key (o_custkey), hence non-null, so
    *    count(*) over phase-1 groups ≡ countDistinct(customer_id);
    *  - `max(when(income > 0, 1))` is non-null for a (country, date,
    *    customer) group iff SOME row has income > 0 — exactly the
    *    groups whose customer_id the conditional countDistinct counts;
    *    null incomes yield null conditions → `when` yields null → max
    *    skips them, matching countDistinct's null-skipping. */
  def customerRetention(master: DataFrame): DataFrame =
    master
      .groupBy(col("transaction_country").as("country"),
        col("transaction_datetime").as("_d"),
        col("customer_id"))
      .agg(
        max(when(col("income") > 0, lit(1))).as("has_pay"),
        max(when(col("income") === 0, lit(1))).as("has_zero"))
      .groupBy(col("country"), col("_d"))
      .agg(
        count(lit(1)).as("unique_customers"),
        count(col("has_pay")).as("paying_customers"),
        count(col("has_zero")).as("non_paying_customers"))
      .select(col("country"), dateStr(col("_d")).as("date"),
        col("unique_customers"), col("paying_customers"),
        col("non_paying_customers"))

  /** The pre-r17 Expand form of [[customerRetention]], kept as the
    * equivalence twin RelationalSpec pins the rewrite against (the
    * performanceMetricsTwoPhase discipline, in the opposite
    * direction: here the DIRECT form is the reference twin and the
    * two-phase form is shipped). */
  private[graft] def customerRetentionExpand(master: DataFrame): DataFrame =
    master
      .groupBy(col("transaction_country").as("country"),
        dateStr(col("transaction_datetime")).as("date"))
      .agg(
        countDistinct(col("customer_id")).as("unique_customers"),
        countDistinct(when(col("income") > 0, col("customer_id")))
          .as("paying_customers"),
        countDistinct(when(col("income") === 0, col("customer_id")))
          .as("non_paying_customers"))

  /** E3 rollup (cloud_composer/load_campaigns_csv.py:7-88): per-source
    * partial aggregates with literal padding columns (P3) → positional
    * UNION ALL → re-aggregation (A10) → `(income - cost) AS revenue`.
    * String date slicing via SUBSTR (F1) preserved from the reference;
    * column names normalized per SURVEY §7.4.2. */
  def rollup(spark: SparkSession, dir: String): DataFrame = {
    // Single-scan shape (VERDICT r1 fix #2): the reference's two partial
    // aggregates (per-day transaction rollup, per-month campaign rollup)
    // are computed in ONE pass over the transaction frame via GROUPING
    // SETS — Spark plans an Expand (each row emitted once per grain) into
    // a single partial+final aggregate, so the orders⨝customer⨝nation
    // subtree is scanned and shuffled exactly once (the r1 version planned
    // it twice; exchange reuse can't kick in because column pruning makes
    // the two subtrees differ). Both grains are bounded (countries × days
    // / months) at any scale factor. round(·,2)/(·,3) recovers the exact
    // 2/3-dp values independent of summation order → hash-neutral vs the
    // reference's two-subquery formulation.
    val grains = transactions(spark, dir)
      .withColumn("dday",
        substring(col("transaction_datetime").cast("string"), 1, 10))
      .withColumn("dmon", concat(substring(col("dday"), 1, 7), lit("-01")))
      .groupingSets(
        Seq(Seq(col("n_nationkey"), col("transaction_country"), col("dday")),
            Seq(col("n_nationkey"), col("transaction_country"), col("dmon"))),
        col("n_nationkey"), col("transaction_country"), col("dday"), col("dmon"))
      .agg(
        sum(col("income")).as("inc_raw"),
        count(col("transaction_id")).as("txn_cnt"))
    // Day-grain rows ≙ reference `tranx_agg`, month-grain ≙ `campaigns_agg`
    // (one campaign per (country, month), cost = 10% of the month's exact
    // income), with the literal padding columns (P3) of each branch.
    val unionAll = grains.select(
      col("transaction_country").as("country"),
      when(col("dday").isNotNull, round(col("inc_raw"), 2))
        .otherwise(lit(0.0)).as("income"),
      when(col("dday").isNotNull, col("txn_cnt"))
        .otherwise(lit(0L)).as("transaction_count"),
      when(col("dday").isNull,
          round(round(col("inc_raw"), 2) * lit(0.1).cast("double"), 3))
        .otherwise(lit(0.0)).as("cost"),
      when(col("dday").isNull, lit(1L)).otherwise(lit(0L)).as("campaign_count"),
      coalesce(col("dday"), col("dmon")).as("date"))
    unionAll
      .groupBy(col("country"), col("date"))
      .agg(
        round(sum(col("income")), 2).as("income"),
        sum(col("transaction_count")).as("transaction_count"),
        round(sum(col("cost")), 3).as("cost"),
        sum(col("campaign_count")).as("campaign_count"))
      .select(
        col("country"),
        col("transaction_count"),
        col("income"),
        col("cost"),
        round(col("income") - col("cost"), 3).as("revenue"),
        col("campaign_count"),
        col("date"))
  }

  /** Grouped top-k via ranking window (SURVEY §2.5 north-star window op):
    * top 5 products by income per country, ties broken by product_id.
    *
    * Two-phase top-k (VERDICT r1 scale note): a single window partitioned
    * by `country` has ~25 partitions at ANY scale, so each task would sort
    * a country's ENTIRE product list at 100 TB. Phase 1 salts the window
    * with a deterministic bucket of product_id and keeps k candidates per
    * (country, salt); phase 2 ranks the ≤ saltBuckets×k survivors per
    * country. Phase-1 ranking is per-product (already aggregated), so the
    * global top-k is always contained in the salted winners — the result
    * is bit-identical to the single-window form. */
  def topProductsPerCountry(master: DataFrame, k: Int = 5,
                            saltBuckets: Int = 32): DataFrame =
    Ranking.saltedTopK(
      master
        .groupBy(col("transaction_country").as("country"), col("product_id"))
        .agg(rsum2(col("income")).as("total_income")),
      part = Seq(col("country")),
      ord = Seq(col("total_income").desc, col("product_id").asc),
      saltOn = col("product_id"), k = k, saltBuckets = saltBuckets)

  /** SELECT * passthrough scan (S6 analog —
    * cloud_composer/datapipeline_gcp.py:36 `SELECT * FROM ronny_dev.stations`). */
  def selectStar(spark: SparkSession, dir: String, table: String): DataFrame =
    Tables.read(spark, dir, table)

  /** A4 at 100 TB (SURVEY §4 watch list): exact COUNT(DISTINCT) plans an
    * Expand that doubles shuffle volume per distinct aggregate — the
    * scale swap-in is HLL++ `approx_count_distinct` (one pass, mergeable
    * sketches, no Expand). Emits exact next to approx with the relative
    * error so the trade is measurable. No DuckDB oracle entry: DuckDB's
    * approx_count_distinct is a different HLL implementation, so only a
    * rows/sanity check applies (the spec asserts rel_err < 5%). */
  def approxDistinct(spark: SparkSession, dir: String): DataFrame =
    // Two-phase grain reduction instead of countDistinct-beside-approx
    // in one aggregate: mixing a distinct and a non-distinct aggregate
    // makes Spark plan an Expand that doubles the fact stream, and the
    // rsd-0.01 HLL++ then updates its sketch once per transaction ROW.
    // Deduping to the (country, customer) grain first (one partial-agg
    // shuffle) makes the exact count a plain count and feeds the HLL
    // one update per DISTINCT key — bit-identical estimate (HLL is
    // duplicate-insensitive by construction), no Expand, 3.4 → ~2 s at
    // sf0.1 (the residual is the shared business join).
    transactions(spark, dir)
      .groupBy(col("transaction_country").as("country"), col("customer_id"))
      .agg(count(lit(1)).as("_n_txn"))
      .groupBy(col("country"))
      .agg(
        count(lit(1)).as("n_exact"),
        approx_count_distinct(col("customer_id"), 0.01).as("n_approx"))
      .withColumn("rel_err",
        abs(col("n_approx") - col("n_exact")).cast("double") / col("n_exact"))

  /** INTERSECT / EXCEPT in one report (completeness rows — the reference
    * never uses set operators, but a user switching engines expects
    * them): set semantics, i.e. both sides deduplicated and equality
    * null-safe, exactly the ANSI behavior DuckDB implements. Scale
    * shape: Spark plans INTERSECT as aggregate + left-semi join and
    * EXCEPT as aggregate + left-anti join — keyed shuffles, never
    * all-pairs, and both sides prune to the compared columns. */
  def setReport(a: DataFrame, b: DataFrame): DataFrame =
    a.intersect(b).withColumn("op", lit("intersect"))
      .unionByName(a.except(b).withColumn("op", lit("except")))

  /** Outer-join semantics in one report: per nation, customers WITH and
    * WITHOUT orders — the left join against the distinct buyer set
    * carries the anti-join complement as NULL probes, so one query
    * covers what separate semi + anti joins would. Scale shape: the
    * buyer set is pre-aggregated to distinct keys BEFORE the join (the
    * shuffle carries one row per buyer, not one per order), and the
    * 25-row nation dim keeps its legitimate broadcast hint. */
  /** TPC-H Q1 (pricing summary report) over the fixture `lineitem` — the
    * classic single-scan aggregation breadth test, re-expressed under
    * the repo's exactness discipline: prices/discounts/taxes are 2-dp
    * decimals, so they become exact integer CENTS (`round(x·100)` as
    * long) and every product/sum stays exact integer arithmetic
    * (magnitudes: price ≤ 10⁷ cents × 100 × 100 × 6·10⁵ rows ≈ 6·10¹⁶,
    * inside long range); each final measure is then one or two IEEE
    * divisions on identical operands — bit-identical in DuckDB, no
    * float-summation order anywhere. Map-side partial agg into 6
    * groups; the shipdate filter pushes to the parquet scan. */
  def tpchQ1(spark: SparkSession, dir: String): DataFrame = {
    val priceC = round(col("l_extendedprice") * 100).cast("long")
    val discC = round(col("l_discount") * 100).cast("long")
    val taxC = round(col("l_tax") * 100).cast("long")
    val n = count(lit(1))
    Tables.lineitem(spark, dir)
      .where(col("l_shipdate") <= lit("2001-08-06").cast("timestamp"))
      .select(col("l_returnflag"), col("l_linestatus"),
        col("l_quantity").cast("long").as("qty"),
        priceC.as("pc"), discC.as("dc"), taxC.as("tc"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(col("qty")).as("sum_qty"),
        (sum(col("pc")).cast("double") / 100).as("sum_base_price"),
        (sum(col("pc") * (lit(100) - col("dc"))).cast("double") / 10000)
          .as("sum_disc_price"),
        (sum(col("pc") * (lit(100) - col("dc")) * (lit(100) + col("tc")))
          .cast("double") / 1000000).as("sum_charge"),
        (sum(col("qty")).cast("double") / n).as("avg_qty"),
        (sum(col("pc")).cast("double") / 100 / n).as("avg_price"),
        (sum(col("dc")).cast("double") / 100 / n).as("avg_disc"),
        n.as("count_order"))
  }

  /** TPC-H Q5 (local-supplier volume) — the 6-table join-chain classic:
    * lineitem ⨝ orders (orderkey, with the date range pre-filtered so
    * the shuffle carries one year only) ⨝ customer (custkey) ⨝ supplier
    * (suppkey AND the "local supplier" c_nationkey = s_nationkey
    * equality) ⨝ nation ⨝ region ('ASIA' pre-filtered). Only the
    * nation⨝region dim (≤ 25 rows, genuinely bounded) carries an
    * explicit broadcast; supplier scales with SF (~10⁹ rows at 100 TB),
    * so its join is left to AQE — broadcast at fixture size, shuffle at
    * scale. The two big joins (orderkey, custkey) shuffle on their
    * keys, which is the correct 100 TB shape. Revenue uses the same
    * integer-cents discipline as [[tpchQ1]]. */
  def tpchQ5(spark: SparkSession, dir: String): DataFrame = {
    val asiaNations = Tables.nation(spark, dir)
      .join(broadcast(Tables.region(spark, dir)
        .where(col("r_name") === "ASIA")),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey"), col("n_name"))
    val o = Tables.orders(spark, dir)
      .where(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
      .select(col("o_orderkey"), col("o_custkey"))
    val li = Tables.lineitem(spark, dir).select(
      col("l_orderkey"), col("l_suppkey"),
      (round(col("l_extendedprice") * 100).cast("long") *
        (lit(100) - round(col("l_discount") * 100).cast("long")))
        .as("rev_c"))
    val c = Tables.customer(spark, dir)
      .select(col("c_custkey"), col("c_nationkey"))
    val s = Tables.supplier(spark, dir)
      .select(col("s_suppkey"), col("s_nationkey"))
    li.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .join(s, col("l_suppkey") === col("s_suppkey") &&
        col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(asiaNations), col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name").as("nation"))
      .agg((sum(col("rev_c")).cast("double") / 10000).as("revenue"),
        count(lit(1)).as("n_items"))
  }

  /** TPC-H Q4 shape (order-priority checking) adapted to the fixture's
    * columns: orders in a quarter having AT LEAST ONE returned lineitem
    * (`l_returnflag = 'R'` stands in for the reference's
    * commit<receipt lateness — the fixture ships no commit/receipt
    * dates), counted by priority. The EXISTS becomes a LEFT SEMI join —
    * the probe side carries only `l_orderkey` after the pushed
    * returnflag filter, and a semi join never duplicates orders however
    * many lines match, so no post-join distinct is needed (the
    * correctness trap an inner-join formulation would hit). */
  def tpchQ4(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
      .where(col("o_orderdate") >= lit("1996-07-01").cast("timestamp") &&
        col("o_orderdate") < lit("1996-10-01").cast("timestamp"))
    val returned = Tables.lineitem(spark, dir)
      .where(col("l_returnflag") === "R")
      .select(col("l_orderkey"))
    o.join(returned, col("o_orderkey") === col("l_orderkey"), "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("order_count"))
  }

  /** TPC-H Q13 (customer distribution) — the two-level aggregation
    * classic: count non-urgent orders per customer through a LEFT OUTER
    * join (customers with zero orders land in the c_count=0 bucket —
    * the reason an inner join is wrong here), then histogram the
    * counts. First aggregate shuffles on custkey; the second is nearly
    * free (key space = max orders per customer). The priority filter is
    * applied to the ORDERS SIDE before the join (equivalent to the
    * reference's ON-clause predicate, and pushdown-friendly) — a
    * post-join WHERE would silently turn the outer join inner and drop
    * the zero-order customers. */
  def tpchQ13(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir).select(col("c_custkey"))
    val o = Tables.orders(spark, dir)
      .where(col("o_orderpriority") =!= "1-URGENT")
      .select(col("o_custkey"), col("o_orderkey"))
    c.join(o, col("c_custkey") === col("o_custkey"), "left")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("c_count"))
      .groupBy(col("c_count"))
      .agg(count(lit(1)).as("custdist"))
  }

  /** TPC-H Q3 (shipping priority): the unshipped-revenue top-10 over the
    * customer⨝orders⨝lineitem chain. Fixture deviation: the schema has
    * no `o_shippriority`, so `o_orderpriority` stands in (same role — a
    * low-cardinality orders attribute carried through the aggregate).
    * Shape for scale: both date filters and the segment filter push to
    * their parquet scans BEFORE any join; lineitem⨝orders shuffles on
    * orderkey (both sides big at any SF), the customer side joins on
    * custkey (1/5 kept by the segment filter — scales with SF, so no
    * forced broadcast; AQE decides). Revenue uses [[tpchQ1]]'s exact
    * integer-cents discipline (sum of exact longs, ONE trailing IEEE
    * division), and the top-10 plans as TakeOrderedAndProject — per
    * partition heaps, no global sort materialization. `o_orderdate`
    * crosses the oracle boundary as a yyyy-MM-dd string (§7.4 date
    * discipline); ties break on (o_orderdate, l_orderkey) so the cut at
    * 10 is deterministic. */
  def tpchQ3(spark: SparkSession, dir: String): DataFrame = {
    val cutoff = lit("1998-06-01").cast("timestamp")
    val c = Tables.customer(spark, dir)
      .where(col("c_mktsegment") === "BUILDING")
      .select(col("c_custkey"))
    val o = Tables.orders(spark, dir)
      .where(col("o_orderdate") < cutoff)
      .select(col("o_orderkey"), col("o_custkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_orderdate"),
        col("o_orderpriority"))
    val li = Tables.lineitem(spark, dir)
      .where(col("l_shipdate") > cutoff)
      .select(col("l_orderkey"),
        (round(col("l_extendedprice") * 100).cast("long") *
          (lit(100L) - round(col("l_discount") * 100).cast("long")))
          .as("rev4"))
    li.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg((sum(col("rev4")).cast("double") / 10000).as("revenue"))
      .orderBy(col("revenue").desc, col("o_orderdate").asc,
        col("l_orderkey").asc)
      .limit(10)
  }

  /** TPC-H Q6 (forecasting revenue change): the purest predicate-pushdown
    * benchmark — one scan, three pushed filters, one exact-cents sum,
    * zero joins. The discount band is expressed as open float bounds
    * (0.045/0.075) rather than a derived-cents predicate so it still
    * PUSHES to the parquet scan — equivalent for 2-dp data, and both
    * engines evaluate the identical comparison. */
  def tpchQ6(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .where(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1998-01-01").cast("timestamp") &&
        col("l_discount") >= 0.045 && col("l_discount") <= 0.075 &&
        col("l_quantity") < 24)
      .select((round(col("l_extendedprice") * 100).cast("long") *
        round(col("l_discount") * 100).cast("long")).as("rev4"))
      .agg((sum(col("rev4")).cast("double") / 10000).as("revenue"))

  /** TPC-H Q18 (large-volume customers): the classic HAVING-filtered
    * semi-reduction — aggregate lineitem per order FIRST (map-side
    * partial agg shrinks 4 lines/order before its shuffle), keep the
    * >300-quantity tail (~0.1% of orders), and only THEN join orders
    * and customer — both joins see the tiny filtered side, which AQE
    * broadcasts at any SF (the aggregate output scales with orders, but
    * the HAVING tail is selectivity-bounded). Quantities are whole →
    * exact long sums; top-100 plans as TakeOrderedAndProject with full
    * deterministic tie-break. */
  def tpchQ18(spark: SparkSession, dir: String,
              minQty: Long = 300L): DataFrame = {
    val big = Tables.lineitem(spark, dir)
      .groupBy(col("l_orderkey"))
      .agg(sum(col("l_quantity").cast("long")).as("sum_qty"))
      .where(col("sum_qty") > minQty)
    Tables.orders(spark, dir)
      .join(big, col("o_orderkey") === col("l_orderkey"))
      .join(Tables.customer(spark, dir),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_custkey"), col("o_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_orderdate"),
        col("o_totalprice"), col("sum_qty"))
      .orderBy(col("o_totalprice").desc, col("o_orderdate").asc,
        col("o_orderkey").asc)
      .limit(100)
  }

  /** Shared integer-cents revenue term (`price_c · (100 − disc_c)`, a
    * ×10⁴-scaled exact long) — the [[tpchQ1]] exactness discipline every
    * TPC-H revenue query below reuses. */
  private def rev4: Column =
    round(col("l_extendedprice") * 100).cast("long") *
      (lit(100L) - round(col("l_discount") * 100).cast("long"))

  /** TPC-H Q7 (volume shipping): bilateral trade volume between two
    * nations by ship year. The supplier-nation/customer-nation pair is
    * constrained to (N1,N2) ∪ (N2,N1) — both dims are the bounded
    * 25-row nation table, so each side's nation name joins in via an
    * explicit broadcast and the disjunctive pair predicate runs AFTER
    * both broadcasts as a cheap filter (never as a join condition that
    * would force a nested loop). The big shuffles are exactly two —
    * lineitem⨝orders on orderkey, +customer on custkey; supplier scales
    * with SF so AQE decides its strategy. Ship-year spans two years →
    * at most 8 output groups; revenue is the exact ×10⁴ cents sum with
    * one trailing IEEE division. */
  def tpchQ7(spark: SparkSession, dir: String,
             nationA: String = "NATION_1",
             nationB: String = "NATION_2"): DataFrame = {
    val n = Tables.nation(spark, dir)
      .select(col("n_nationkey"), col("n_name"))
    val li = Tables.lineitem(spark, dir)
      .where(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
      .select(col("l_orderkey"), col("l_suppkey"),
        year(col("l_shipdate")).as("l_year"), rev4.as("rev4"))
    val o = Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_custkey"))
    val c = Tables.customer(spark, dir)
      .select(col("c_custkey"), col("c_nationkey"))
    val s = Tables.supplier(spark, dir)
      .select(col("s_suppkey"), col("s_nationkey"))
    li.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .join(s, col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(n.select(col("n_nationkey").as("sn_key"),
        col("n_name").as("supp_nation"))),
        col("s_nationkey") === col("sn_key"))
      .join(broadcast(n.select(col("n_nationkey").as("cn_key"),
        col("n_name").as("cust_nation"))),
        col("c_nationkey") === col("cn_key"))
      .where((col("supp_nation") === nationA && col("cust_nation") === nationB) ||
        (col("supp_nation") === nationB && col("cust_nation") === nationA))
      .groupBy(col("supp_nation"), col("cust_nation"), col("l_year"))
      .agg((sum(col("rev4")).cast("double") / 10000).as("revenue"),
        count(lit(1)).as("n_items"))
  }

  /** TPC-H Q8 (national market share): of all STANDARD-type part revenue
    * sold to ASIA customers in 1996–97, the share supplied by one
    * nation, by order year. The share is a ratio of two exact ×10⁴
    * cents sums (numerator = conditional sum gated on the supplier
    * nation) → ONE IEEE division per year, bit-identical in DuckDB.
    * part is filtered to one of six types BEFORE its join (scan-pushed);
    * the customer side reduces through the broadcast ASIA nation dim;
    * big shuffles remain the orderkey/custkey/partkey joins, all
    * key-partitioned. The numerator nation is resolved to its KEY once
    * (bounded dim lookup) so the per-row gate is a primitive long
    * comparison on s_nationkey, not a string join. */
  def tpchQ8(spark: SparkSession, dir: String,
             shareNation: String = "NATION_3",
             region: String = "ASIA",
             pType: String = "STANDARD"): DataFrame = {
    val asiaKeys = Tables.nation(spark, dir)
      .join(broadcast(Tables.region(spark, dir)
        .where(col("r_name") === region)),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey"))
    val p = Tables.part(spark, dir)
      .where(col("p_type") === pType).select(col("p_partkey"))
    val o = Tables.orders(spark, dir)
      .where(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
      .select(col("o_orderkey"), col("o_custkey"),
        year(col("o_orderdate")).as("o_year"))
    val c = Tables.customer(spark, dir)
      .select(col("c_custkey"), col("c_nationkey"))
      .join(broadcast(asiaKeys), col("c_nationkey") === col("n_nationkey"),
        "left_semi")
      .select(col("c_custkey"))
    val s = Tables.supplier(spark, dir)
      .select(col("s_suppkey"), col("s_nationkey"))
    val shareKey = Tables.nation(spark, dir)
      .where(col("n_name") === shareNation)
      .select(col("n_nationkey").as("share_key"))
    val li = Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
        rev4.as("rev4"))
    li.join(p, col("l_partkey") === col("p_partkey"), "left_semi")
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"), "left_semi")
      .join(s, col("l_suppkey") === col("s_suppkey"))
      .crossJoin(broadcast(shareKey))
      .groupBy(col("o_year"))
      .agg((sum(when(col("s_nationkey") === col("share_key"), col("rev4"))
          .otherwise(0L)).cast("double") /
        sum(col("rev4")).cast("double")).as("mkt_share"),
        count(lit(1)).as("n_items"))
  }

  /** TPC-H Q10 (returned-item reporting): top 20 customers by revenue of
    * 'R'-flagged lines against a one-quarter order window. Both filters
    * push to their scans before any join; the aggregate groups on the
    * already-joined customer attributes (custkey is the grouping key —
    * name/acctbal/nation are functionally dependent and ride along).
    * Top-20 plans as TakeOrderedAndProject with a c_custkey tie-break
    * so the cut is deterministic. Revenue: exact ×10⁴ cents. */
  def tpchQ10(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
      .where(col("o_orderdate") >= lit("1997-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1997-04-01").cast("timestamp"))
      .select(col("o_orderkey"), col("o_custkey"))
    val li = Tables.lineitem(spark, dir)
      .where(col("l_returnflag") === "R")
      .select(col("l_orderkey"), rev4.as("rev4"))
    val c = Tables.customer(spark, dir)
      .select(col("c_custkey"), col("c_name"), col("c_acctbal"),
        col("c_nationkey"))
    val n = Tables.nation(spark, dir)
      .select(col("n_nationkey"), col("n_name"))
    li.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("c_custkey"), col("c_name"), col("c_acctbal"),
        col("n_name"))
      .agg((sum(col("rev4")).cast("double") / 10000).as("revenue"))
      .orderBy(col("revenue").desc, col("c_custkey").asc)
      .limit(20)
  }

  /** TPC-H Q14 (promotion effect): the share of one ship-month's revenue
    * from PROMO-type parts — 100·Σ(promo rev)/Σ(rev), both operands the
    * exact ×10⁴ cents sum over the same joined frame → one IEEE
    * division (then ×100, exact). The month filter pushes to the
    * lineitem scan; part carries only (partkey, is-promo boolean) into
    * the join — it scales with SF (~10⁹ parts at 100 TB) so no forced
    * broadcast; AQE decides. */
  def tpchQ14(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
      .where(col("l_shipdate") >= lit("1997-09-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-10-01").cast("timestamp"))
      .select(col("l_partkey"), rev4.as("rev4"))
    val p = Tables.part(spark, dir)
      .select(col("p_partkey"), (col("p_type") === "PROMO").as("is_promo"))
    li.join(p, col("l_partkey") === col("p_partkey"))
      .agg((lit(100).cast("double") *
        sum(when(col("is_promo"), col("rev4")).otherwise(0L)).cast("double") /
        sum(col("rev4")).cast("double")).as("promo_revenue_pct"),
        count(lit(1)).as("n_items"))
  }

  /** TPC-H Q15 (top supplier): supplier(s) whose one-quarter revenue
    * equals the global max. Revenue aggregates per suppkey FIRST
    * (map-side partials over the date-pruned scan; output scales with
    * suppliers, not lines), the scalar max re-aggregates that compact
    * frame, and the equality join against the broadcast one-row max
    * replaces the reference's view-self-join — no window over the full
    * frame, no second lineitem scan. Comparison is on the exact ×10⁴
    * LONG (not the divided double), so max-equality can't be perturbed
    * by IEEE rounding. */
  def tpchQ15(spark: SparkSession, dir: String): DataFrame = {
    val revenue = Tables.lineitem(spark, dir)
      .where(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-04-01").cast("timestamp"))
      .groupBy(col("l_suppkey"))
      .agg(sum(rev4).as("rev4_total"))
    val top = revenue.agg(max(col("rev4_total")).as("rev4_max"))
    Tables.supplier(spark, dir)
      .join(revenue, col("s_suppkey") === col("l_suppkey"))
      .join(broadcast(top), col("rev4_total") === col("rev4_max"))
      .select(col("s_suppkey"), col("s_name"),
        (col("rev4_total").cast("double") / 10000).as("total_revenue"))
  }

  /** TPC-H Q17 (small-quantity-order revenue): average yearly revenue
    * lost if orders below 20% of a part's average quantity weren't
    * filled, for one brand. The correlated `0.2·avg(l_quantity)`
    * subquery becomes a per-part aggregate joined back — and the
    * threshold test is cross-multiplied into ALL-INTEGER form
    * (`5·qty·n < Σqty` ⟺ `qty < 0.2·avg`), so neither engine ever
    * materializes the fractional average and the boundary can't differ
    * by one ULP. The brand filter pushes to the part scan and
    * left-semi-prunes lineitem BEFORE the stats pass, so both scans
    * over lineitem read only the brand's partitions of the partkey
    * shuffle. */
  def tpchQ17(spark: SparkSession, dir: String,
              brand: String = "Brand#23"): DataFrame = {
    val p = Tables.part(spark, dir)
      .where(col("p_brand") === brand).select(col("p_partkey"))
    val li = Tables.lineitem(spark, dir)
      .select(col("l_partkey"), col("l_quantity").cast("long").as("qty"),
        round(col("l_extendedprice") * 100).cast("long").as("price_c"))
      .join(broadcast(p), col("l_partkey") === col("p_partkey"), "left_semi")
    val stats = li.groupBy(col("l_partkey").as("s_partkey"))
      .agg(sum(col("qty")).as("sum_qty"), count(lit(1)).as("n_lines"))
    li.join(stats, col("l_partkey") === col("s_partkey"))
      .where(col("qty") * 5L * col("n_lines") < col("sum_qty"))
      .agg((sum(col("price_c")).cast("double") / 100 / 7.0)
        .as("avg_yearly"),
        count(lit(1)).as("n_items"))
  }

  /** TPC-H Q22 shape (global sales opportunity) adapted to the fixture's
    * columns: the reference segments dormant rich customers by phone
    * country code; the fixture has no c_phone, so the bounded nation
    * dim takes that role (same plan shape — a low-cardinality customer
    * attribute grouping an anti-joined frame). "Rich" is acctbal above
    * the average positive acctbal, cross-multiplied to ALL-INTEGER
    * cents (`bal_c·n > Σbal_c`) so the threshold is exact in both
    * engines; "dormant" is a LEFT ANTI join against the distinct
    * RECENT-buyer set (every fixture customer has SOME order, so the
    * reference's no-orders-ever test is vacuous here — "no order since
    * 2000-01-01" keeps the identical anti-join shape non-vacuous; the
    * date filter pushes to the orders scan and the buyer set is
    * pre-deduped so its shuffle carries one row per buyer). One-row
    * global aggregate broadcasts; no window, no correlated re-scan. */
  def tpchQ22(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
      .select(col("c_custkey"), col("c_nationkey"),
        round(col("c_acctbal") * 100).cast("long").as("bal_c"))
    val avgPos = c.where(col("bal_c") > 0L)
      .agg(sum(col("bal_c")).as("sum_bal"), count(lit(1)).as("n_pos"))
    val buyers = Tables.orders(spark, dir)
      .where(col("o_orderdate") >= lit("2000-01-01").cast("timestamp"))
      .select(col("o_custkey")).distinct()
    c.crossJoin(broadcast(avgPos))
      .where(col("bal_c") * col("n_pos") > col("sum_bal"))
      .join(buyers, col("c_custkey") === col("o_custkey"), "left_anti")
      .join(broadcast(Tables.nation(spark, dir)
        .select(col("n_nationkey"), col("n_name"))),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name").as("nation"))
      .agg(count(lit(1)).as("numcust"),
        (sum(col("bal_c")).cast("double") / 100).as("totacctbal"))
  }

  def customerCoverage(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
      .select(col("c_custkey"), col("c_nationkey"))
    val buyers = Tables.orders(spark, dir).select(col("o_custkey")).distinct()
    val n = Tables.nation(spark, dir)
      .select(col("n_nationkey"), col("n_name"))
    c.join(buyers, c("c_custkey") === buyers("o_custkey"), "left")
      .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name").as("nation"))
      .agg(
        count(lit(1)).as("n_customers"),
        sum(when(col("o_custkey").isNotNull, 1L).otherwise(0L))
          .as("n_with_orders"),
        sum(when(col("o_custkey").isNull, 1L).otherwise(0L))
          .as("n_without_orders"))
  }
}
