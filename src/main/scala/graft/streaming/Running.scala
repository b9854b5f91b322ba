package graft.streaming

import java.time.Instant

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Per-key running aggregates via `mapGroupsWithState` — the one-output-
  * per-key-per-batch sibling of [[Sessionize]]'s flatMap form. The demo
  * aggregate is EWMA (α = 0.5, seeded with the first observation), the
  * same recurrence the batch `q_ewma` query folds; within each microbatch
  * events fold in event-time order.
  *
  * EWMA is order-sensitive, so cross-batch disorder is NOT corrected: an
  * event older than the state's high-water mark folds as-if-current (the
  * alternative — buffering by watermark before folding — costs O(delay)
  * state per key; the [[Sessionize]] pattern shows that shape). State is
  * O(keys): one (ewma, last_ts, n) triple per user. */
object Running {

  case class Ewma(user_id: Long, n_events: Long, ewma: Double)
  /** lastUs = high-water mark in epoch-micros, for monitoring only. */
  case class EwmaState(ewma: Double, lastUs: Long, n: Long)

  private def micros(i: Instant): Long = i.getEpochSecond * 1000000L + i.getNano / 1000

  /** One updated EWMA row per user per microbatch (Update output mode). */
  def ewmaStream(events: Dataset[Sessionize.Event], alpha: Double = 0.5)
                (implicit spark: SparkSession): Dataset[Ewma] = {
    import spark.implicits._
    events.groupByKey(_.user_id)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout)(
        (userId: Long, evs: Iterator[Sessionize.Event], state: GroupState[EwmaState]) => {
          val sorted = evs.toSeq.sortBy(e => micros(e.ts))
          var s = state.getOption.getOrElse(EwmaState(Double.NaN, Long.MinValue, 0L))
          sorted.foreach { e =>
            val next =
              if (s.n == 0L) e.value
              else alpha * e.value + (1.0 - alpha) * s.ewma
            s = EwmaState(next, math.max(s.lastUs, micros(e.ts)), s.n + 1)
          }
          state.update(s)
          Ewma(userId, s.n, s.ewma)
        })
  }

  // ------------------------------------------------- real-time attribution

  case class TouchEvent(user_id: Long, event_id: Long, ts: Instant,
                        event_type: String, k: Option[Long])
  /** Last qualifying touch per user: item + its event-time micros. */
  case class TouchState(k: Long, tsUs: Long)
  case class Attribution(event_id: Long, user_id: Long, bought_k: Option[Long],
                         touch_k: Option[Long], touch_age_us: Option[Long])

  /** Real-time last-touch attribution (the streaming twin of
    * q_attribution): state is ONE (item, ts) pair per user — views/clicks
    * overwrite it, purchases emit an attribution row against it
    * immediately. Emissions happen only for purchases, so the stream runs
    * in Append mode; within each microbatch events fold in (event-time,
    * event-id) order. Like the EWMA, cross-batch disorder folds
    * as-arrived — the watermark-buffered variant is the [[Sessionize]]
    * shape. */
  def attributionStream(events: Dataset[TouchEvent])
                       (implicit spark: SparkSession): Dataset[Attribution] = {
    import spark.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (userId: Long, evs: Iterator[TouchEvent], state: GroupState[TouchState]) => {
          val sorted = evs.toSeq.sortBy(e => (micros(e.ts), e.event_id))
          val out = Seq.newBuilder[Attribution]
          var s = state.getOption
          sorted.foreach { e =>
            e.event_type match {
              case "view" | "click" if e.k.isDefined =>
                s = Some(TouchState(e.k.get, micros(e.ts)))
              case "purchase" =>
                out += Attribution(e.event_id, userId, e.k,
                  s.map(_.k), s.map(t => micros(e.ts) - t.tsUs))
              case _ => ()
            }
          }
          s.foreach(state.update)
          out.result().iterator
        })
  }

  /** Batch twin of [[attributionStream]] for twin tests. */
  def attributionBatch(events: Dataset[TouchEvent])
                      (implicit spark: SparkSession): Dataset[Attribution] = {
    import spark.implicits._
    events.groupByKey(_.user_id).flatMapGroups { (userId, evs) =>
      val sorted = evs.toSeq.sortBy(e => (micros(e.ts), e.event_id))
      var s: Option[TouchState] = None
      val out = Seq.newBuilder[Attribution]
      sorted.foreach { e =>
        e.event_type match {
          case "view" | "click" if e.k.isDefined =>
            s = Some(TouchState(e.k.get, micros(e.ts)))
          case "purchase" =>
            out += Attribution(e.event_id, userId, e.k,
              s.map(_.k), s.map(t => micros(e.ts) - t.tsUs))
          case _ => ()
        }
      }
      out.result().iterator
    }
  }

  /** Batch twin: same fold over the full history, for twin tests. */
  def ewmaBatch(events: Dataset[Sessionize.Event], alpha: Double = 0.5)
               (implicit spark: SparkSession): Dataset[Ewma] = {
    import spark.implicits._
    events.groupByKey(_.user_id).mapGroups { (userId, evs) =>
      val sorted = evs.toSeq.sortBy(e => micros(e.ts))
      var ewma = Double.NaN; var n = 0L
      sorted.foreach { e =>
        ewma = if (n == 0L) e.value else alpha * e.value + (1.0 - alpha) * ewma
        n += 1
      }
      Ewma(userId, n, ewma)
    }
  }
}
