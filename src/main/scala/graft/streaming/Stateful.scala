package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom keyed state over a stream: the `mapGroupsWithState` /
  * `flatMapGroupsWithState` surface (SURVEY §2.B "stateful").
  *
  * Example operator: per-user running profile (event count, last value,
  * last-seen time) with an idle timeout — the canonical sessionized-state
  * shape a feature store or abuse counter needs. State lives in the state
  * store (RocksDB/HDFS-backed on a cluster), partitioned by key: scales
  * horizontally with executors, no driver state.
  */
object Stateful {

  final case class UserEvent(user_id: Long, ts: java.sql.Timestamp, value: Double)
  final case class UserProfile(user_id: Long, n_events: Long, last_value: Double,
                               last_seen: java.sql.Timestamp)

  def profileUpdate(userId: Long, events: Iterator[UserEvent],
                    state: GroupState[UserProfile]): UserProfile = {
    val evs = events.toSeq
    val prev = state.getOption
    val latest = evs.maxByOption(e => (e.ts.getTime, e.value))
    val updated = UserProfile(
      user_id = userId,
      n_events = prev.map(_.n_events).getOrElse(0L) + evs.size,
      last_value = latest.map(_.value)
        .orElse(prev.map(_.last_value)).getOrElse(Double.NaN),
      last_seen = latest.map(_.ts).orElse(prev.map(_.last_seen))
        .getOrElse(new java.sql.Timestamp(0L)))
    state.update(updated)
    updated
  }

  /** Streaming per-user profiles; works on batch Datasets too (Spark runs
    * mapGroupsWithState in batch with one state update per key). */
  def userProfiles(spark: SparkSession, events: Dataset[UserEvent]): Dataset[UserProfile] = {
    import spark.implicits._
    events.groupByKey(_.user_id)
      .mapGroupsWithState[UserProfile, UserProfile](
        GroupStateTimeout.NoTimeout())(profileUpdate)
  }

  final case class SessionSummary(user_id: Long, n_events: Long,
                                  closed: Boolean)

  final case class SessionEvent(user_id: Long, ts: java.sql.Timestamp)
  final case class SessionState(start_us: Long, last_us: Long, n: Long)
  final case class SessionOut(user_id: Long, start_us: Long, end_us: Long,
                              n_events: Long)

  /** Exact µs from a Timestamp: getTime truncates to ms, getNanos carries
    * the full fractional second — combining both preserves the parquet µs
    * value bit-for-bit (the fixture's event times are µs-precise). */
  def tsMicros(t: java.sql.Timestamp): Long =
    Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L

  /** Full sessionization via flatMapGroupsWithState + event-time timeout —
    * the stateful-streaming equivalent of `session_window(ts, gap)`:
    * per-user state holds the OPEN session (start, last, count); an event
    * within `gap` of the last extends it, a later event closes and EMITS it
    * (arrival-driven closure), and the watermark passing last+gap closes it
    * by timeout — so state is bounded by one open session per active user,
    * the production shape.
    *
    * Correct under one arrival-order premise: micro-batches are event-time
    * ordered ACROSS batches (each batch's events are all ≥ the previous
    * watermark — which is exactly the premise watermarking itself rests
    * on; intra-batch disorder is handled by sorting the group iterator).
    * Under it the fold is monotone: a state session can never be extended
    * by an event older than a batch already folded, so arrival-closure and
    * timeout-closure emit exactly the `<=gap` gaps-and-islands sessions.
    * Session end = last + gap, matching `session_window`'s end semantics. */
  def sessionize(spark: SparkSession, events: Dataset[SessionEvent],
                 gapUs: Long): Dataset[SessionOut] = {
    import spark.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (userId, it, state) =>
          if (state.hasTimedOut) {
            val sess = state.get
            state.remove()
            Iterator.single(
              SessionOut(userId, sess.start_us, sess.last_us + gapUs, sess.n))
          } else {
            val times = it.map(e => tsMicros(e.ts)).toArray.sorted
            val closed = scala.collection.mutable.ArrayBuffer.empty[SessionOut]
            var cur = state.getOption
            times.foreach { t =>
              cur match {
                // <= not <: session_window MERGES an event arriving exactly
                // gap after the previous one (same rule as the batch oracle)
                case Some(sess) if t <= sess.last_us + gapUs =>
                  cur = Some(SessionState(sess.start_us,
                    math.max(sess.last_us, t), sess.n + 1))
                case Some(sess) =>
                  closed += SessionOut(userId, sess.start_us,
                    sess.last_us + gapUs, sess.n)
                  cur = Some(SessionState(t, t, 1L))
                case None =>
                  cur = Some(SessionState(t, t, 1L))
              }
            }
            cur.foreach { sess =>
              state.update(sess)
              // timeout is in ms; +1 rounds up so the µs-precise close
              // never fires a hair early (firing late never changes WHAT
              // is emitted, only which batch emits it)
              state.setTimeoutTimestamp((sess.last_us + gapUs) / 1000L + 1L)
            }
            closed.iterator
          }
      }
  }

  /** Session close-out via flatMapGroupsWithState with event-time timeout:
    * events accumulate per user; when the watermark passes last-seen + gap,
    * the timed-out state EMITS a final summary and clears — the
    * "emit-on-session-close" shape (late data past the watermark is dropped
    * by the engine). */
  def sessionCloseouts(spark: SparkSession, events: Dataset[UserEvent],
                       gapMs: Long): Dataset[SessionSummary] = {
    import spark.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[UserProfile, SessionSummary](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (userId, it, state) =>
          if (state.hasTimedOut) {
            val p = state.get
            state.remove()
            Iterator.single(SessionSummary(userId, p.n_events, closed = true))
          } else {
            profileUpdate(userId, it, state)
            state.setTimeoutTimestamp(state.get.last_seen.getTime + gapMs)
            Iterator.empty
          }
      }
  }
}
