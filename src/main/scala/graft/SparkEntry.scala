package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every entry in [[queries]] has a DuckDB twin in [[oracleSql]] built from
  * the exact same arithmetic (see Relational's determinism discipline) so
  * the driver's sort-columns-then-hash compare is bit-stable.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q_performance_metrics")(spark, "/root/testdata/sf0.001")

  private def master(s: SparkSession, d: String): DataFrame =
    Relational.masterModel(s, d)

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_master_model" -> ((s, d) => Relational.masterModel(s, d)),
    "q_performance_metrics" -> ((s, d) => Relational.performanceMetrics(master(s, d))),
    "q_product_performance" -> ((s, d) => Relational.productPerformance(master(s, d))),
    "q_profitability_kpi" -> ((s, d) => Relational.profitabilityKpi(master(s, d))),
    "q_sales_kpi" -> ((s, d) => Relational.salesKpi(master(s, d))),
    "q_customer_retention" -> ((s, d) => Relational.customerRetention(master(s, d))),
    "q_rollup" -> ((s, d) => Relational.rollup(s, d)),
    "q_top_products" -> ((s, d) => Relational.topProductsPerCountry(master(s, d))),
    "q_select_star" -> ((s, d) => Relational.selectStar(s, d, "supplier")),
  )

  /** Shared CTE prefix mirroring Relational.{transactions,masterModel}
    * — token-for-token the same arithmetic as the DataFrame side
    * (campaign_cost as a window sum over the single txn frame; campaign_id
    * encodes nation+year+month per ADVICE r1). */
  private val MasterCte: String =
    """WITH txn AS (
      |  SELECT o_orderkey AS transaction_id, o_totalprice AS income,
      |         n_name AS transaction_country, n_nationkey,
      |         o_orderdate AS transaction_datetime, o_custkey AS customer_id,
      |         CAST(date_trunc('month', o_orderdate) AS DATE) AS tmonth
      |  FROM orders
      |  JOIN customer ON o_custkey = c_custkey
      |  JOIN nation ON c_nationkey = n_nationkey
      |), txnc AS (
      |  SELECT *,
      |         CAST(n_nationkey * 1000000 + year(tmonth) * 100 + month(tmonth) AS BIGINT) AS campaign_id,
      |         ROUND(ROUND(SUM(income) OVER (PARTITION BY n_nationkey, transaction_country, tmonth), 2) * CAST(0.1 AS DOUBLE), 3) AS campaign_cost
      |  FROM txn
      |), master AS (
      |  SELECT t.campaign_id, t.campaign_cost, t.transaction_id, t.income,
      |         t.transaction_country, t.customer_id,
      |         l.l_partkey AS product_id, l.l_quantity AS quantity,
      |         l.l_extendedprice AS price, p.p_brand AS category,
      |         t.transaction_datetime
      |  FROM txnc t
      |  JOIN lineitem l ON t.transaction_id = l.l_orderkey
      |  JOIN part p ON l.l_partkey = p.p_partkey
      |)""".stripMargin

  def oracleSql: Map[String, String] = Map(
    "q_master_model" ->
      s"""$MasterCte
         |SELECT * FROM master""".stripMargin,

    "q_performance_metrics" ->
      s"""$MasterCte
         |SELECT transaction_country AS country,
         |       CAST(CAST(transaction_datetime AS DATE) AS VARCHAR) AS date,
         |       COUNT(DISTINCT transaction_id) AS transaction_count,
         |       ROUND(SUM(income), 2) AS total_income,
         |       ROUND(SUM(campaign_cost), 3) AS total_campaign_cost,
         |       ROUND(SUM(income), 2) / COUNT(income) AS average_income,
         |       ROUND(SUM(campaign_cost), 3) / COUNT(campaign_cost) AS average_campaign_cost,
         |       ROUND(SUM(income - campaign_cost), 3) AS total_profit,
         |       ROUND(SUM(income), 2) / COUNT(DISTINCT transaction_id) AS average_transaction_value
         |FROM master
         |GROUP BY 1, 2""".stripMargin,

    "q_product_performance" ->
      s"""$MasterCte
         |SELECT product_id,
         |       transaction_country AS country,
         |       CAST(CAST(transaction_datetime AS DATE) AS VARCHAR) AS date,
         |       COUNT(DISTINCT transaction_id) AS transaction_count,
         |       ROUND(SUM(quantity), 2) AS total_quantity,
         |       ROUND(SUM(income), 2) AS total_income,
         |       ROUND(SUM(income), 2) / COUNT(income) AS average_income,
         |       ROUND(SUM(income - campaign_cost), 3) AS total_profit,
         |       ROUND(SUM(income), 2) / COUNT(DISTINCT transaction_id) AS average_transaction_value
         |FROM master
         |GROUP BY 1, 2, 3""".stripMargin,

    "q_profitability_kpi" ->
      s"""$MasterCte
         |SELECT product_id,
         |       transaction_country AS country,
         |       ROUND(SUM(quantity), 2) AS total_quantity,
         |       ROUND(SUM(income), 2) AS total_income,
         |       ROUND(SUM(income), 2) / COUNT(income) AS average_income,
         |       ROUND(SUM(income - campaign_cost), 3) AS total_profit
         |FROM master
         |GROUP BY 1, 2""".stripMargin,

    "q_sales_kpi" ->
      s"""$MasterCte
         |SELECT transaction_country AS country,
         |       CAST(CAST(transaction_datetime AS DATE) AS VARCHAR) AS date,
         |       COUNT(DISTINCT transaction_id) AS transaction_count,
         |       ROUND(SUM(income), 2) AS total_income,
         |       ROUND(SUM(income), 2) / COUNT(income) AS average_income,
         |       ROUND(SUM(income - campaign_cost), 3) AS total_profit
         |FROM master
         |GROUP BY 1, 2""".stripMargin,

    "q_customer_retention" ->
      s"""$MasterCte
         |SELECT transaction_country AS country,
         |       CAST(CAST(transaction_datetime AS DATE) AS VARCHAR) AS date,
         |       COUNT(DISTINCT customer_id) AS unique_customers,
         |       COUNT(DISTINCT CASE WHEN income > 0 THEN customer_id ELSE NULL END) AS paying_customers,
         |       COUNT(DISTINCT CASE WHEN income = 0 THEN customer_id ELSE NULL END) AS non_paying_customers
         |FROM master
         |GROUP BY 1, 2""".stripMargin,

    "q_rollup" ->
      s"""$MasterCte, camp AS (
         |  SELECT ROUND(ROUND(SUM(income), 2) * CAST(0.1 AS DOUBLE), 3) AS campaign_cost,
         |         transaction_country AS campaign_country,
         |         tmonth AS campaign_month
         |  FROM txn
         |  GROUP BY n_nationkey, transaction_country, tmonth
         |), tranx_agg AS (
         |  SELECT transaction_country AS country,
         |         ROUND(SUM(income), 2) AS income,
         |         COUNT(transaction_id) AS transaction_count,
         |         CAST(0.00 AS DOUBLE) AS cost,
         |         CAST(0 AS BIGINT) AS campaign_count,
         |         SUBSTR(CAST(transaction_datetime AS VARCHAR), 1, 10) AS date
         |  FROM txn
         |  GROUP BY 1, 6
         |), campaigns_agg AS (
         |  SELECT campaign_country AS country,
         |         CAST(0.00 AS DOUBLE) AS income,
         |         CAST(0 AS BIGINT) AS transaction_count,
         |         ROUND(SUM(campaign_cost), 3) AS cost,
         |         COUNT(campaign_cost) AS campaign_count,
         |         SUBSTR(CAST(campaign_month AS VARCHAR), 1, 10) AS date
         |  FROM camp
         |  GROUP BY 1, 6
         |), unionall AS (
         |  SELECT * FROM tranx_agg
         |  UNION ALL
         |  SELECT * FROM campaigns_agg
         |), unionall_agg AS (
         |  SELECT country,
         |         ROUND(SUM(income), 2) AS income,
         |         CAST(SUM(transaction_count) AS BIGINT) AS transaction_count,
         |         ROUND(SUM(cost), 3) AS cost,
         |         CAST(SUM(campaign_count) AS BIGINT) AS campaign_count,
         |         date
         |  FROM unionall
         |  GROUP BY 1, 6
         |)
         |SELECT country, transaction_count, income, cost,
         |       ROUND(income - cost, 3) AS revenue, campaign_count, date
         |FROM unionall_agg""".stripMargin,

    "q_top_products" ->
      s"""$MasterCte, by_country AS (
         |  SELECT transaction_country AS country, product_id,
         |         ROUND(SUM(income), 2) AS total_income
         |  FROM master
         |  GROUP BY 1, 2
         |), ranked AS (
         |  SELECT country, product_id, total_income,
         |         ROW_NUMBER() OVER (PARTITION BY country
         |           ORDER BY total_income DESC, product_id ASC) AS rank
         |  FROM by_country
         |)
         |SELECT * FROM ranked WHERE rank <= 5""".stripMargin,

    "q_select_star" -> "SELECT * FROM supplier",
  )
}
