package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, ValueState}

/** Streaming last-touch attribution — the stateful twin of the batch
  * [[graft.ops.StatsOps.attributionLastTouch]] window op. The batch form
  * carries the last click forward with an `ignoreNulls` window over each
  * user's full history; in a stream that lookback is unbounded, so the
  * carry becomes ONE tiny value-state per user (last applied ordering key
  * + last click micro-timestamp) updated per event — the canonical
  * `transformWithState` shape: cardinality-bounded state, checkpoint
  * recovery, no history re-scan, shuffle only the groupByKey hash
  * exchange on user_id.
  *
  * Semantics match the batch op exactly on an in-order replay: a purchase
  * is credited to the STRICTLY-preceding click in (ts, event_id) order
  * (an event never credits itself — the purchase emits before this row's
  * own click update could apply, and ties resolve by event_id). A LATE
  * event (ordering key ≤ the last applied one) is SKIPPED: attribution is
  * order-defined, and retro-crediting would mean recalling rows already
  * emitted downstream — the same discipline as [[WilderState]]. The spec
  * pins both: replayed-in-order equality with the batch op, and the
  * late-click skip.
  */
object Attribution {

  final case class EventRow(
      user_id: Long, ts: Timestamp, event_id: Long, event_type: String)

  /** One row per purchase; `click_us` is None when no click preceded. */
  final case class TouchRow(
      user_id: Long, purchase_id: Long, purchase_us: Long, click_us: Option[Long])

  final case class TouchState(
      lastUs: Long, lastId: Long, clickUs: Long, hasClick: Boolean)

  /** ordering key: exact micro-of-epoch of a (µs-precision) timestamp */
  def usOf(t: Timestamp): Long =
    t.getTime / 1000L * 1000000L + t.getNanos / 1000L

  class Processor extends StatefulProcessor[Long, EventRow, TouchRow] {

    @transient private var st: ValueState[TouchState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[TouchState](
        "touch", Encoders.product[TouchState],
        org.apache.spark.sql.streaming.TTLConfig.NONE)

    override def handleInputRows(
        user: Long,
        rows: Iterator[EventRow],
        timerValues: TimerValues): Iterator[TouchRow] = {
      val out = Seq.newBuilder[TouchRow]
      rows.toSeq.sortBy(e => (usOf(e.ts), e.event_id)).foreach { e =>
        val us = usOf(e.ts)
        val s =
          if (st.exists()) st.get()
          else TouchState(Long.MinValue, Long.MinValue, 0L, hasClick = false)
        val inOrder = us > s.lastUs || (us == s.lastUs && e.event_id > s.lastId)
        if (inOrder) { // late events cannot retro-attribute: skip
          if (e.event_type == "purchase")
            out += TouchRow(user, e.event_id, us,
              if (s.hasClick) Some(s.clickUs) else None)
          val next =
            if (e.event_type == "click") s.copy(clickUs = us, hasClick = true)
            else s
          st.update(next.copy(lastUs = us, lastId = e.event_id))
        }
      }
      out.result().iterator
    }
  }

  /** event stream → one attribution row per purchase. */
  def lastTouch(events: Dataset[EventRow]): Dataset[TouchRow] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .transformWithState(
        new Processor,
        TimeMode.None(),
        OutputMode.Update())
  }
}
