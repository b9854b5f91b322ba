package graft.streaming

import java.time.Instant

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom streaming state via `flatMapGroupsWithState` — the engine's
  * demonstration of arbitrary keyed state beyond built-in windows
  * (SURVEY.md §2.5 streaming row). Semantically equivalent to
  * `session_window` with gap `gapMs`, but hand-managed: the pattern users
  * extend for custom session payloads (e.g. event-type paths, funnels).
  *
  * All arithmetic is in epoch-microseconds (Spark timestamp precision);
  * folding on milliseconds would silently truncate session boundaries.
  *
  * State per key is one open session (start, last, n, total) — O(keys)
  * state, evicted by event-time timeout at `lastTs + gap` once the
  * watermark passes it. */
object Sessionize {

  case class Event(user_id: Long, ts: Instant, value: Double)
  /** start/last in epoch-micros. */
  case class SessionState(start: Long, last: Long, n: Long, total: Double)
  case class Session(user_id: Long, s_start: Instant, s_end: Instant,
                     n: Long, total: Double)

  private def micros(i: Instant): Long = i.getEpochSecond * 1000000L + i.getNano / 1000
  private def instant(us: Long): Instant =
    Instant.ofEpochSecond(us / 1000000L, (us % 1000000L) * 1000L)

  /** Fold sorted events of one user into gap-separated sessions. */
  private def fold(userId: Long, evs: Iterator[Event], gapUs: Long,
                   open: Option[SessionState]): (Seq[Session], Option[SessionState]) = {
    val sorted = evs.toSeq.sortBy(e => micros(e.ts))
    var state = open
    val out = Seq.newBuilder[Session]
    sorted.foreach { e =>
      val t = micros(e.ts)
      state match {
        // strict <: matches session_window's half-open [ts, ts+gap) merge.
        // t can precede s.last when a prior batch left open state and this
        // batch delivers a late-but-in-gap event, so the session bounds
        // must only ever widen: min for start, max for last.
        case Some(s) if t - s.last < gapUs =>
          state = Some(SessionState(math.min(s.start, t), math.max(s.last, t),
            s.n + 1, s.total + e.value))
        case Some(s) =>
          out += Session(userId, instant(s.start), instant(s.last + gapUs),
            s.n, s.total)
          state = Some(SessionState(t, t, 1, e.value))
        case None =>
          state = Some(SessionState(t, t, 1, e.value))
      }
    }
    (out.result(), state)
  }

  /** Streaming sessionization with event-time timeout. On timeout the open
    * session is emitted and the state cleared. */
  def sessions(events: Dataset[Event], gapMs: Long)
              (implicit spark: SparkSession): Dataset[Session] = {
    import spark.implicits._
    val gapUs = gapMs * 1000L
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        (userId: Long, evs: Iterator[Event], state: GroupState[SessionState]) => {
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(Session(userId, instant(s.start),
              instant(s.last + gapUs), s.n, s.total))
          } else {
            val (closed, open) = fold(userId, evs, gapUs, state.getOption)
            open match {
              case Some(s) =>
                state.update(s)
                // A timeout at or below the current watermark is rejected by
                // Spark (IllegalArgumentException) — possible when the batch
                // only carried late events. Clamp strictly above it so the
                // session still times out on the next watermark advance.
                val wm = state.getCurrentWatermarkMs()
                state.setTimeoutTimestamp(math.max((s.last + gapUs) / 1000L, wm + 1L))
              case None => state.remove()
            }
            closed.iterator
          }
        })
  }

  /** Batch twin used for correctness comparison: same fold, all sessions
    * closed at end-of-input. */
  def sessionsBatch(events: Dataset[Event], gapMs: Long)
                   (implicit spark: SparkSession): Dataset[Session] = {
    import spark.implicits._
    val gapUs = gapMs * 1000L
    events.groupByKey(_.user_id).flatMapGroups { (userId, evs) =>
      val (closed, open) = fold(userId, evs, gapUs, None)
      (closed ++ open.map(s => Session(userId, instant(s.start),
        instant(s.last + gapUs), s.n, s.total))).iterator
    }
  }

  // ------------------------------------------------- custom payload demo

  case class TypedEvent(user_id: Long, ts: Instant, event_type: String)
  /** t1/t2/t3 = first view / first later click / first later purchase
    * (epoch-micros; Long.MinValue = unset). */
  case class FunnelState(start: Long, last: Long, n: Long,
                         t1: Long, t2: Long, t3: Long)
  case class FunnelSession(user_id: Long, s_start: Instant, n: Long,
                           viewed: Int, clicked: Int, purchased: Int)

  private val Unset = Long.MinValue

  private def foldFunnel(userId: Long, evs: Iterator[TypedEvent], gapUs: Long,
                         open: Option[FunnelState])
      : (Seq[FunnelSession], Option[FunnelState]) = {
    def close(s: FunnelState) = FunnelSession(userId, instant(s.start), s.n,
      if (s.t1 != Unset) 1 else 0, if (s.t2 != Unset) 1 else 0,
      if (s.t3 != Unset) 1 else 0)
    def step(s: FunnelState, t: Long, ty: String): FunnelState = {
      // ascending fold ⇒ first-qualifying == window-min with strictly-after
      val t1 = if (s.t1 == Unset && ty == "view") t else s.t1
      val t2 = if (s.t2 == Unset && ty == "click" && s.t1 != Unset && t > s.t1) t else s.t2
      val t3 = if (s.t3 == Unset && ty == "purchase" && s.t2 != Unset && t > s.t2) t else s.t3
      FunnelState(math.min(s.start, t), math.max(s.last, t), s.n + 1, t1, t2, t3)
    }
    val sorted = evs.toSeq.sortBy(e => micros(e.ts))
    var state = open
    val out = Seq.newBuilder[FunnelSession]
    sorted.foreach { e =>
      val t = micros(e.ts)
      state match {
        case Some(s) if t - s.last < gapUs => state = Some(step(s, t, e.event_type))
        case Some(s) =>
          out += close(s)
          state = Some(step(FunnelState(t, t, 0, Unset, Unset, Unset), t, e.event_type))
        case None =>
          state = Some(step(FunnelState(t, t, 0, Unset, Unset, Unset), t, e.event_type))
      }
    }
    (out.result(), state)
  }

  /** The "custom session payload" pattern the plain sessionizer's doc
    * promises: same gap/timeout state machine, session payload = funnel
    * conversion flags folded in event order. Streaming emits a session's
    * funnel row when the gap (or event-time timeout) closes it. */
  def funnelSessions(events: Dataset[TypedEvent], gapMs: Long)
                    (implicit spark: SparkSession): Dataset[FunnelSession] = {
    import spark.implicits._
    val gapUs = gapMs * 1000L
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        (userId: Long, evs: Iterator[TypedEvent], state: GroupState[FunnelState]) => {
          def close(s: FunnelState) = FunnelSession(userId, instant(s.start), s.n,
            if (s.t1 != Unset) 1 else 0, if (s.t2 != Unset) 1 else 0,
            if (s.t3 != Unset) 1 else 0)
          if (state.hasTimedOut) {
            val s = state.get; state.remove(); Iterator.single(close(s))
          } else {
            val (closed, open) = foldFunnel(userId, evs, gapUs, state.getOption)
            open match {
              case Some(s) =>
                state.update(s)
                val wm = state.getCurrentWatermarkMs()
                state.setTimeoutTimestamp(math.max((s.last + gapUs) / 1000L, wm + 1L))
              case None => state.remove()
            }
            closed.iterator
          }
        })
  }

  /** Batch twin: all funnel sessions closed at end-of-input. */
  def funnelSessionsBatch(events: Dataset[TypedEvent], gapMs: Long)
                         (implicit spark: SparkSession): Dataset[FunnelSession] = {
    import spark.implicits._
    val gapUs = gapMs * 1000L
    events.groupByKey(_.user_id).flatMapGroups { (userId, evs) =>
      val (closed, open) = foldFunnel(userId, evs, gapUs, None)
      (closed ++ open.map(s => FunnelSession(userId, instant(s.start), s.n,
        if (s.t1 != Unset) 1 else 0, if (s.t2 != Unset) 1 else 0,
        if (s.t3 != Unset) 1 else 0))).iterator
    }
  }
}
