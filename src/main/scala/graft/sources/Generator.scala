package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.Hash.h8

/** S9: deterministic synthetic data generator — the engine twin of the
  * reference's Faker-based Cloud Functions
  * (`cloud_function/create_campaigns/csv/main.py:10-46`,
  * `create_transactions/csv/main.py:10-46`): N rows of
  * (id, money, country, timestamp-within-3h-lookback).
  *
  * Unlike `rand(seed)` (whose stream depends on partitioning), every
  * field derives from md5 of the row id, so the output is bit-identical
  * under any partitioning/parallelism AND reproducible in the DuckDB
  * oracle (same md5). The 3-hour lookback mirrors F10; value domains
  * mirror F9 (`uniform(10, 1000)` 2-dp money, 8-digit ids).
  */
object Generator {

  /** Fixed country pool (the CSV flow hardcodes 'Peru' — a deliberate
    * hot key; the TXT flow draws arbitrary countries). */
  val Countries: Seq[String] = Seq(
    "Peru", "Germany", "France", "Japan", "Brazil",
    "Canada", "India", "Kenya", "Egypt", "Argentina")

  /** Generation epoch (the reference uses wall-clock 'now'; a pinned
    * epoch keeps runs reproducible). */
  val Epoch = "2023-07-07 08:00:00"

  /** 2-dp money string minted from integer cents — float-free, so the
    * DuckDB oracle reproduces it exactly with integer ops. */
  private def moneyStr(cents: Column): Column =
    concat((cents / 100).cast("long").cast("string"), lit("."),
      lpad((cents % 100).cast("string"), 2, "0"))

  /** N campaign rows in the reference's raw CSV shape (all STRING):
    * 8-digit campaign_id, 2-dp cost in [10, 1000), country, and a
    * datetime inside the 3-hour lookback window before [[Epoch]]. */
  def campaigns(spark: SparkSession, n: Long,
                hotCountry: Boolean = false): DataFrame =
    spark.range(n).select(
      (h8("id", col("id")) % 90000000 + 10000000).cast("string")
        .as("campaign_id"),
      moneyStr(h8("cost", col("id")) % 99000 + 1000).as("cost"),
      (if (hotCountry) lit(Countries.head)
       else element_at(
         typedLit(Countries), (h8("country", col("id")) % Countries.size)
           .cast("int") + 1)).as("country"),
      date_format(
        to_timestamp(lit(Epoch)) -
          make_dt_interval(lit(0), lit(0), lit(0), (h8("ts", col("id")) % 10800).cast("double")),
        "yyyy-MM-dd HH:mm:ss").as("date_time"))

  /** N transaction rows (10-digit ids, same money/country/time domains —
    * `create_transactions/csv/main.py:27-31`). */
  def transactions(spark: SparkSession, n: Long): DataFrame =
    spark.range(n).select(
      (h8("tid", col("id")) % 9000000000L + 1000000000L).cast("string")
        .as("transaction_id"),
      moneyStr(h8("income", col("id")) % 99000 + 1000).as("income"),
      element_at(
        typedLit(Countries), (h8("tcountry", col("id")) % Countries.size)
          .cast("int") + 1).as("country"),
      date_format(
        to_timestamp(lit(Epoch)) -
          make_dt_interval(lit(0), lit(0), lit(0), (h8("tts", col("id")) % 10800).cast("double")),
        "yyyy-MM-dd HH:mm:ss").as("date_time"))
}
