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
