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

  /** Per-user sessionization with a 6-hour inactivity gap, via the
    * gaps-and-islands window formulation: a session break is a gap ≥ the
    * threshold, the session id is the running break count, and the
    * session end is last-event + gap (identical semantics to
    * `session_window`, which [[userSessionsSW]] demonstrates).
    *
    * Why not `session_window` on the oracle-gated path: its physical
    * plan (partial sessions → shuffle → MergingSessions) was observed —
    * rarely, plan-shape-dependently — to emit UNMERGED adjacent partial
    * sessions when composed into larger query plans (two occurrences
    * under a derived-aggregate anti-join; standalone evaluation never
    * flaked in 16 stress runs). Plain lag/sum windows have no merge
    * step, so this formulation is deterministic by construction; the
    * spec cross-checks the two against each other, which both
    * demonstrates the idiomatic API and fences the flake. */
  def userSessions(spark: SparkSession, dir: String,
                   gap: String = "6 hours"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val iv = org.apache.spark.sql.catalyst.util.IntervalUtils.stringToInterval(
      org.apache.spark.unsafe.types.UTF8String.fromString(gap))
    require(iv.months == 0, s"calendar-month session gaps are ambiguous: $gap")
    val gapUs = iv.days * 86400000000L + iv.microseconds
    val byTs = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_us"), col("event_id"))
    val cum = byTs.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"), col("value"),
        unix_micros(col("ts")).as("ts_us"))
      .withColumn("brk",
        when(lag(col("ts_us"), 1).over(byTs).isNull ||
          col("ts_us") - lag(col("ts_us"), 1).over(byTs) >= gapUs, 1)
          .otherwise(0))
      .withColumn("sid", sum(col("brk")).over(cum))
      .groupBy(col("user_id"), col("sid"))
      .agg(
        min(col("ts_us")).as("start_us"),
        max(col("ts_us")).as("end_us"),
        count(lit(1)).as("n_events"),
        round(sum(col("value")), 2).as("total_value"))
      .select(
        col("user_id"),
        date_format(timestamp_micros(col("start_us")),
          "yyyy-MM-dd HH:mm:ss.SSSSSS").as("session_start"),
        date_format(timestamp_micros(col("end_us") + gapUs),
          "yyyy-MM-dd HH:mm:ss.SSSSSS").as("session_end"),
        col("n_events"), col("total_value"))
  }

  /** Per-user running totals over event time — the batch twin of
    * [[graft.streaming.Stateful.runningUserTotals]]'s per-event state
    * updates, and the "customer lifetime value so far" query shape. The
    * (ts, event_id) ordering is total, so ranks are deterministic; the
    * running sum is rounded to 6 dp because engines may associate the
    * frame sum differently (segment trees vs incremental — error
    * ~1e-12, far inside the rounding granularity). Scale: the window
    * partitions by user_id — key cardinality grows with the data, so
    * no low-cardinality single-task pileup. */
  def cumulativeUserValue(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byTs = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_us"), col("event_id"))
    val cum = byTs.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"), col("event_type"),
        col("value"), unix_micros(col("ts")).as("ts_us"))
      .withColumn("n_so_far", row_number().over(byTs))
      .withColumn("cum_value", round(sum(col("value")).over(cum), 6))
      .select(col("user_id"), col("event_id"),
        date_format(timestamp_micros(col("ts_us")), "yyyy-MM-dd HH:mm:ss")
          .as("ts"),
        col("event_type"), col("n_so_far"), col("cum_value"))
  }

  /** Ordered funnel analysis (view → click → purchase): per user, the
    * first view, the first click AFTER that view, and the first
    * purchase AFTER that click — the sequential-pattern query every
    * product-analytics stack runs. Three chained min-over-user windows
    * share one partitioning, so Catalyst plans ONE shuffle for all
    * three stages (each window may reference the previous stage's
    * timestamp — no per-stage self-joins); the per-user frame then
    * collapses through a two-phase global aggregate into one row of
    * stage counts and exact-ratio conversions. */
  def funnel(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byUser = Window.partitionBy(col("user_id"))
    val staged = Tables.events(spark, dir)
      .select(col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("ts_us"))
      .withColumn("t_view",
        min(when(col("event_type") === "view", col("ts_us"))).over(byUser))
      .withColumn("t_click",
        min(when(col("event_type") === "click" &&
          col("ts_us") > col("t_view"), col("ts_us"))).over(byUser))
      .withColumn("t_purchase",
        min(when(col("event_type") === "purchase" &&
          col("ts_us") > col("t_click"), col("ts_us"))).over(byUser))
      .groupBy(col("user_id"))
      .agg(max(col("t_view")).as("tv"), max(col("t_click")).as("tc"),
        max(col("t_purchase")).as("tp"))
    staged.agg(
        count(lit(1)).as("n_users"),
        sum(when(col("tv").isNotNull, 1L).otherwise(0L)).as("n_view"),
        sum(when(col("tc").isNotNull, 1L).otherwise(0L)).as("n_click_after_view"),
        sum(when(col("tp").isNotNull, 1L).otherwise(0L)).as("n_purchase_after_click"))
      .withColumn("view_to_click",
        when(col("n_view") > 0,
          col("n_click_after_view").cast("double") / col("n_view"))
          .otherwise(lit(0.0)))
      .withColumn("click_to_purchase",
        when(col("n_click_after_view") > 0,
          col("n_purchase_after_click").cast("double") /
            col("n_click_after_view"))
          .otherwise(lit(0.0)))
  }

  /** Cohort retention: users grouped by their first-seen hour (the
    * cohort), counted at each later hour-age at which they were active
    * again — the "do users come back" matrix behind every retention
    * curve. All arithmetic is integer hour-bucket math on microsecond
    * epochs, so the matrix is engine-exact. Shape: activity collapses
    * to distinct (user, hour) first (one row per user-hour, so the
    * final count(*) IS distinct users), first-seen is a per-user min —
    * both shuffles key on user_id, which scales with the data. */
  def cohortRetention(spark: SparkSession, dir: String): DataFrame = {
    val activity = Tables.events(spark, dir)
      .select(col("user_id"),
        expr("unix_micros(ts) div 3600000000").as("hour_bucket"))
      .distinct()
    val firstSeen = activity.groupBy(col("user_id"))
      .agg(min(col("hour_bucket")).as("cohort_bucket"))
    activity.join(firstSeen, "user_id")
      .groupBy(col("cohort_bucket"),
        (col("hour_bucket") - col("cohort_bucket")).as("age_hours"))
      .agg(count(lit(1)).as("n_users"))
      .select(
        date_format(timestamp_micros(col("cohort_bucket") * 3600000000L),
          "yyyy-MM-dd HH:00").as("cohort_hour"),
        col("age_hours"), col("n_users"))
  }

  /** The same sessionization through Spark's built-in `session_window`
    * aggregate — the idiomatic API, spec-cross-checked against
    * [[userSessions]] (see that method's scaladoc for why the
    * oracle-gated path avoids it). */
  def userSessionsSW(spark: SparkSession, dir: String,
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
