package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Temporal join operators Spark lacks as built-ins, composed from
  * primitives it has (SURVEY-extension tier; preference order (a) of the
  * build brief: compose existing ops before reaching for a custom
  * SparkPlan).
  *
  * - As-of join: union both sides and carry the right side forward with
  *   one `last(_, ignoreNulls)` running window — ONE shuffle on the join
  *   key, no per-left-row probe, no inequality join blow-up. This is the
  *   scale shape: a sort-merge inequality join would replicate the right
  *   side per left row; the union-scan is linear.
  * - Range join: band each right row into a fixed-width time bucket and
  *   equi-join on (key, bucket) with the left exploded to the two
  *   buckets its window can touch, then filter the exact range — the
  *   equi-join keeps Catalyst in hash-join land (never a nested-loop /
  *   cartesian), candidates are bounded per bucket.
  */
object Joins {

  /** For each 'click' event: the most recent 'purchase' by the same user
    * at or before the click (LEFT semantics — unmatched clicks keep
    * nulls). Tie rule, part of the contract: purchases at the exact
    * click timestamp are eligible; among equal-ts purchases the largest
    * event_id wins. Timestamps cross the oracle boundary as exact
    * microsecond longs. */
  def asofClickPurchase(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("event_id"), col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("ts_us"))
    val purchases = ev.where(col("event_type") === "purchase")
      .select(col("user_id"), col("ts_us"), lit(0).as("side"),
        col("event_id"),
        col("event_id").as("p_id"), col("ts_us").as("p_ts_us"))
    val clicks = ev.where(col("event_type") === "click")
      .select(col("user_id"), col("ts_us"), lit(1).as("side"),
        col("event_id"),
        lit(null).cast("long").as("p_id"),
        lit(null).cast("long").as("p_ts_us"))
    // side=0 sorts purchases before an equal-ts click (eligibility);
    // event_id breaks exact ties deterministically.
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_us"), col("side"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    purchases.unionByName(clicks)
      .withColumn("asof_event_id", last(col("p_id"), ignoreNulls = true).over(w))
      .withColumn("asof_ts_us", last(col("p_ts_us"), ignoreNulls = true).over(w))
      .where(col("side") === 1)
      .select(
        col("event_id"), col("user_id"), col("ts_us"),
        col("asof_event_id"), col("asof_ts_us"),
        (col("ts_us") - col("asof_ts_us")).as("gap_us"))
  }

  /** Range-join width (5 minutes, in microseconds). */
  val RangeUs: Long = 300L * 1000000

  /** Event pairs (a, b) of the same user with a.ts < b.ts <= a.ts + 5min,
    * rolled up by (a.event_type, b.event_type). Banded: b is keyed by its
    * time bucket, a probes its own bucket and the next one (a window
    * starting in bucket k can only end in k or k+1), so each candidate
    * pair is generated exactly once by b's unique bucket. */
  def rangePairs(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("event_id"), col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("ts_us"))
    val b = ev.select(
      col("user_id"), col("event_type").as("b_type"),
      col("event_id").as("b_id"), col("ts_us").as("b_ts_us"),
      expr(s"ts_us div $RangeUs").as("bucket"))
    val a = ev.select(
      col("user_id"), col("event_type").as("a_type"),
      col("event_id").as("a_id"), col("ts_us").as("a_ts_us"),
      explode(array(expr(s"ts_us div $RangeUs"),
        expr(s"ts_us div $RangeUs + 1"))).as("bucket"))
    a.join(b, Seq("user_id", "bucket"))
      .where(col("b_ts_us") > col("a_ts_us") &&
        col("b_ts_us") <= col("a_ts_us") + RangeUs)
      .groupBy(col("a_type"), col("b_type"))
      .agg(
        count(lit(1)).as("n_pairs"),
        sum(col("b_ts_us") - col("a_ts_us")).as("total_gap_us"),
        (sum(col("b_ts_us") - col("a_ts_us")).cast("double") /
          count(lit(1))).as("avg_gap_us"))
  }
}
