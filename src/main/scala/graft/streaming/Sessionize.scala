package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom-state streaming: gap-based sessionization of the events stream via
  * `flatMapGroupsWithState` — the stateful surface the reference has no
  * analog for (SURVEY §2.8: "no state store") but a training-data event
  * pipeline needs.
  *
  * State per user = the open session (start, last-seen, count). An event
  * more than `gap` after last-seen closes the session (emitted) and opens a
  * new one. Works identically on a batch Dataset (one pass; pass
  * `emitOpen = true` to flush the trailing open session per user) and a
  * stream (state persists across micro-batches; open sessions are held
  * until closed by a later event).
  *
  * Gap arithmetic is in exact microseconds (`Timestamp.getTime` alone is
  * millisecond-truncated), so boundaries match the SQL/DuckDB formulation
  * bit-for-bit.
  *
  * Scale: state is O(active users), keyed and partitioned by user — the
  * state store shards with the shuffle; no global structure.
  */
object Sessionize {

  case class Event(user_id: Long, ts: Timestamp, event_type: String)
  case class Session(user_id: Long, session_start: Timestamp,
      session_end: Timestamp, n_events: Long)
  case class OpenSession(start: Timestamp, last: Timestamp, n: Long)

  val DefaultGapUs: Long = 30L * 60 * 1000 * 1000

  private def micros(t: Timestamp): Long =
    t.toInstant.getEpochSecond * 1000000L + t.toInstant.getNano / 1000L

  /** Process one user's new events against open-session state. */
  def updateUser(gapUs: Long, emitOpen: Boolean)(
      userId: Long, events: Iterator[Event],
      state: GroupState[OpenSession]): Iterator[Session] = {
    val sorted = events.toSeq.sortBy(e => micros(e.ts))
    var open = state.getOption
    val closed = Seq.newBuilder[Session]
    sorted.foreach { e =>
      open match {
        case Some(s) if micros(e.ts) - micros(s.last) <= gapUs =>
          open = Some(s.copy(last = e.ts, n = s.n + 1))
        case Some(s) =>
          closed += Session(userId, s.start, s.last, s.n)
          open = Some(OpenSession(e.ts, e.ts, 1))
        case None =>
          open = Some(OpenSession(e.ts, e.ts, 1))
      }
    }
    if (emitOpen) { // batch flush: no more data can arrive
      open.foreach(s => closed += Session(userId, s.start, s.last, s.n))
      state.remove()
    } else open.foreach(state.update)
    closed.result().iterator
  }

  /** Closed sessions for a (batch or streaming) event Dataset; with
    * `emitOpen` also the trailing open session per user (batch semantics).
    */
  def sessions(
      events: Dataset[Event], gapUs: Long = DefaultGapUs,
      emitOpen: Boolean = false): Dataset[Session] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        updateUser(gapUs, emitOpen))
  }

  /** [[updateUser]] with event-time EVICTION: when the watermark passes
    * `last + gap` — the instant no on-time event can extend the session —
    * the open session is emitted as closed and its state removed. Same
    * closed-session stream as [[updateUser]] plus the timeout closures
    * NoTimeout holds open forever.
    */
  def updateUserEvicting(gapUs: Long)(
      userId: Long, events: Iterator[Event],
      state: GroupState[OpenSession]): Iterator[Session] = {
    if (state.hasTimedOut) {
      val s = state.get
      state.remove()
      Iterator.single(Session(userId, s.start, s.last, s.n))
    } else {
      val out = updateUser(gapUs, emitOpen = false)(userId, events, state)
      // timeout at last-seen + gap, in ms (the GroupState clock); fires
      // when the WATERMARK passes it, so late on-time events still extend
      state.getOption.foreach(s =>
        state.setTimeoutTimestamp(micros(s.last) / 1000 + gapUs / 1000))
      out
    }
  }

  /** [[sessions]] with bounded state for churning key spaces: state is
    * O(users ACTIVE within the gap+watermark horizon), not O(users ever
    * seen) — the difference between a fixed panel and an open-world user
    * id space at 100 TB/day. Streaming requires `withWatermark` upstream
    * (event-time timeouts ride the watermark); every session eventually
    * emits — by a later event (gap closure) or by eviction (idle
    * closure) — so the stream is also COMPLETE, where [[sessions]] holds
    * each user's last session open forever.
    */
  def sessionsEvicting(
      events: Dataset[Event], gapUs: Long = DefaultGapUs): Dataset[Session] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        updateUserEvicting(gapUs))
  }
}
