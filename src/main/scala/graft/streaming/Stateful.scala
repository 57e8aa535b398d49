package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.GroupStateTimeout
import org.apache.spark.sql.types.StructType

/** Custom stateful streaming (SURVEY §2.8 north star): per-key state via
  * `KeyValueGroupedDataset.mapGroupsWithState` — the primitive the
  * built-in windowed aggregates can't express (arbitrary per-user
  * accumulators, custom eviction, session logic beyond gaps).
  *
  * State lives in the streaming state store (checkpointed, partitioned
  * by key hash) — at 100 TB of events the state size is bounded by
  * #distinct users, not event volume.
  */
object Stateful {

  case class EventRow(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
                      event_type: String, value: Double, props: String)

  case class UserAgg(user_id: Long, n_events: Long, total_value: Double)

  /** Running per-user totals over an event stream: each micro-batch
    * folds its events into the user's persistent state and emits the
    * updated row (update output mode). After an AvailableNow drain the
    * latest row per user equals the batch aggregate. */
  def runningUserTotals(spark: SparkSession, eventsDir: String,
                        schema: StructType): DataFrame = {
    import spark.implicits._
    spark.readStream
      .schema(schema)
      .parquet(eventsDir)
      .as[EventRow]
      .groupByKey(_.user_id)
      .mapGroupsWithState[UserAgg, UserAgg](GroupStateTimeout.NoTimeout) {
        (uid, events, state) =>
          var n = 0L
          var tot = 0.0
          state.getOption.foreach { prev => n = prev.n_events; tot = prev.total_value }
          events.foreach { e => n += 1; tot += e.value }
          val next = UserAgg(uid, n, tot)
          state.update(next)
          next
      }
      .toDF()
  }
}
