package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
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

  /** Open-session carry state for [[streamingSessions]]. */
  case class OpenSession(start_us: Long, last_us: Long, n_events: Long,
                         total_value: Double)

  /** Closed session emitted by [[streamingSessions]]. */
  case class ClosedSession(user_id: Long, session_start_us: Long,
                           session_end_us: Long, n_events: Long,
                           total_value: Double)

  /** Session gap (6 h in µs) — same semantics as Events.userSessions. */
  val SessionGapUs: Long = 6L * 3600 * 1000000

  /** Streaming sessionization via `flatMapGroupsWithState`: the shape
    * the built-in `session_window` aggregate can't express when the
    * per-session output needs custom fold logic — each user's open
    * session is carried in the state store across micro-batches; a gap
    * ≥ 6 h closes it and EMITS it (append mode), the open tail stays
    * pending. Events are sorted within each (user, batch) before the
    * fold; cross-batch ordering is the file-drop order (a production
    * deployment adds a watermark + EventTimeTimeout to both bound state
    * and flush tails on event-time progress — same callback shape).
    *
    * State is one OpenSession per active user: bounded by #users, not
    * event volume — the 100 TB property that makes stateful streaming
    * viable. */
  def streamingSessions(spark: SparkSession, eventsDir: String,
                        schema: StructType,
                        maxFilesPerTrigger: Option[Int] = None): DataFrame = {
    import spark.implicits._
    var reader = spark.readStream.schema(schema)
    maxFilesPerTrigger.foreach(n =>
      reader = reader.option("maxFilesPerTrigger", n))
    reader.parquet(eventsDir)
      .as[EventRow]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[OpenSession, ClosedSession](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (uid, events, state) =>
          def eventUs(e: EventRow): Long =
            e.ts.getTime / 1000 * 1000000 + e.ts.getNanos / 1000
          val sorted = events.toSeq.sortBy(e => (eventUs(e), e.event_id))
          var open = state.getOption
          // Late-zone buffer (ADVICE r5): late arrivals are sessionized
          // TOGETHER within the batch instead of each becoming its own
          // overlapping singleton — two late events within one gap of
          // each other emit as ONE late session, matching batch
          // semantics as closely as append mode allows.
          var lateOpen: Option[OpenSession] = None
          val closed = Seq.newBuilder[ClosedSession]
          def closeLate(lo: OpenSession): Unit =
            closed += ClosedSession(uid, lo.start_us, lo.last_us + SessionGapUs,
              lo.n_events, lo.total_value)
          sorted.foreach { e =>
            val us = eventUs(e)
            open match {
              case Some(o) if us > o.start_us - SessionGapUs &&
                  us - o.last_us < SessionGapUs =>
                // STRICTLY within one gap of the open session on either
                // edge: merge, extending the bounds as needed. Both
                // edges must be checked — us - last_us is negative for
                // any late arrival, so the upper-edge test alone would
                // merge an event hours before start_us. Both edges use
                // the same convention as the closing branch (a gap of
                // exactly SessionGapUs SPLITS): with >= on the lower
                // edge, an event exactly one gap before start_us would
                // merge and manufacture a session whose internal gap
                // equals the threshold — diverging from the batch twin.
                open = Some(o.copy(
                  start_us = math.min(o.start_us, us),
                  last_us = math.max(o.last_us, us),
                  n_events = o.n_events + 1,
                  total_value = o.total_value + e.value))
              case Some(o) if us - o.last_us >= SessionGapUs =>
                closed += ClosedSession(uid, o.start_us, o.last_us + SessionGapUs,
                  o.n_events, o.total_value)
                open = Some(OpenSession(us, us, 1, e.value))
              case Some(_) =>
                // More than a gap BEFORE the open session: batch
                // semantics would have placed it in an earlier, already-
                // emitted session, which append mode cannot revise — fold
                // it into the batch's late-zone session (events sort
                // ascending, so only the trailing edge needs checking)
                // rather than corrupting the open session's bounds.
                // Residual divergence, by design: late sessions cannot
                // merge ACROSS batches, and a late chain that climbs to
                // within one gap of the open session's start still splits
                // (the chain's tail merges upward instead). A production
                // deployment's watermark drops such events earlier.
                lateOpen match {
                  case Some(lo) if us - lo.last_us < SessionGapUs =>
                    lateOpen = Some(lo.copy(last_us = us,
                      n_events = lo.n_events + 1,
                      total_value = lo.total_value + e.value))
                  case other =>
                    other.foreach(closeLate)
                    lateOpen = Some(OpenSession(us, us, 1, e.value))
                }
              case None =>
                open = Some(OpenSession(us, us, 1, e.value))
            }
          }
          lateOpen.foreach(closeLate)
          open.foreach(state.update)
          closed.result().iterator
      }
      .toDF()
  }
}
