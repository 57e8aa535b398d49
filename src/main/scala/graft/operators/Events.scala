package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Event-time aggregations over the `events` fixture — the batch twins of
  * the Structured Streaming queries in graft.streaming (identical
  * semantics; the streaming versions add watermarks). Window boundaries
  * are emitted as formatted strings so parquet/DuckDB timestamp affinity
  * differences can't affect the oracle compare.
  */
object Events {

  /** Tumbling 1-hour windows per event_type: event count, distinct
    * users, exact 2-dp value sum. */
  def hourlyWindows(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(
        window(col("ts"), "1 hour").as("w"),
        col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_users"),
        round(sum(col("value")), 2).as("total_value"))
      .select(
        date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("hour"),
        col("event_type"), col("n_events"), col("n_users"),
        col("total_value"))

  /** Sliding windows: 2-hour windows advancing hourly — each event lands
    * in exactly two windows (Spark plans this as an Expand before the
    * aggregate, the same partial-agg shape as tumbling). */
  def slidingWindows(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(
        window(col("ts"), "2 hours", "1 hour").as("w"),
        col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        round(sum(col("value")), 2).as("total_value"))
      .select(
        date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("window_start"),
        col("event_type"), col("n_events"), col("total_value"))

  /** Per-user sessionization with a 6-hour inactivity gap
    * (`session_window`): session bounds, event count, value sum. The
    * session end is last-event + gap (Spark semantics; the oracle
    * reproduces it with a gaps-and-islands rewrite). */
  def userSessions(spark: SparkSession, dir: String,
                   gap: String = "6 hours"): DataFrame =
    Tables.events(spark, dir)
      .groupBy(col("user_id"), session_window(col("ts"), gap).as("w"))
      .agg(
        count(lit(1)).as("n_events"),
        round(sum(col("value")), 2).as("total_value"))
      .select(
        col("user_id"),
        date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss.SSSSSS")
          .as("session_start"),
        date_format(col("w.end"), "yyyy-MM-dd HH:mm:ss.SSSSSS")
          .as("session_end"),
        col("n_events"), col("total_value"))
}
