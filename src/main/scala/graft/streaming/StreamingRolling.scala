package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.streaming.{
  ExpiredTimerInfo, ListState, OutputMode, StatefulProcessor, TimeMode, TimerValues,
  TTLConfig, ValueState}

/** Streaming twin of the batch trailing-window velocity query
  * ([[graft.Queries.eventsRolling]]): for every event, the sum and count
  * of the SAME user's event values in the hour ending at that event —
  * computed incrementally on `transformWithState`.
  *
  * State per user is a deque of the events inside the trailing window
  * (us, value) — bounded by the window SPAN, never by stream length: each
  * incoming event appends, then everything older than `event time −
  * window` is pruned (on in-order arrival those rows can never re-enter
  * any later frame). An idle user's remaining deque is expired by an
  * EVENT-TIME timer `window` past their last event — once the watermark
  * passes it the state store drops the user entirely, so a 100 TB/day
  * feed holds (users active inside the horizon) × (their in-window
  * events), the same frame of state the batch RANGE window holds per
  * partition.
  *
  * Semantics are AT-ARRIVAL, folding each micro-batch in (us, event_id)
  * order: when per-user arrival order respects event time — what the
  * convergence spec feeds — every emitted row equals the batch RANGE
  * frame's row exactly (same ascending-order summation, same HALF_UP
  * 3-decimal rounding). A late event older than the user's newest emits
  * its own row against the then-current deque but cannot retro-correct
  * rows already emitted — the standard trade of bounded state vs
  * history.
  */
object StreamingRolling {

  final case class RollEvent(event_id: Long, user_id: Long, value: Double, us: Long)
  final case class RollOut(event_id: Long, user_id: Long, roll_value: Double, n_window: Long)
  final case class WindowEntry(us: Long, value: Double)

  private def round3(x: Double): Double =
    BigDecimal(x).setScale(3, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** One user's trailing-window processor. `windowMicros` is the frame
    * span (batch twin uses 1 hour).
    */
  final class RollingProcessor(windowMicros: Long)
      extends StatefulProcessor[Long, RollEvent, RollOut] {
    @transient private var window: ListState[WindowEntry] = _
    @transient private var expiry: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      window = getHandle.getListState[WindowEntry]("window",
        Encoders.product[WindowEntry], TTLConfig.NONE)
      expiry = getHandle.getValueState[Long]("expiry",
        Encoders.scalaLong, TTLConfig.NONE)
    }

    override def handleInputRows(user: Long, rows: Iterator[RollEvent],
        timers: TimerValues): Iterator[RollOut] = {
      val entries = scala.collection.mutable.ArrayBuffer.from(window.get())
      val out = scala.collection.mutable.ArrayBuffer.empty[RollOut]
      rows.toSeq.sortBy(e => (e.us, e.event_id)).foreach { e =>
        // keep the deque time-ordered even under out-of-order arrival —
        // ascending summation is what makes the twin bit-equal to the
        // batch frame
        val at = entries.lastIndexWhere(_.us <= e.us) + 1
        entries.insert(at, WindowEntry(e.us, e.value))
        val lo = e.us - windowMicros
        var sum = 0.0
        var n = 0L
        entries.foreach { w => if (w.us >= lo && w.us <= e.us) { sum += w.value; n += 1 } }
        out += RollOut(e.event_id, user, round3(sum), n)
        entries.filterInPlace(_.us >= lo)
      }
      if (entries.nonEmpty) {
        window.put(entries.toArray)
        // slide the idle-expiry timer to (newest event + window): event-time
        // ms, fired once the watermark passes it
        val newExpiry = entries.last.us / 1000L + windowMicros / 1000L + 1L
        if (expiry.exists()) getHandle.deleteTimer(expiry.get())
        getHandle.registerTimer(newExpiry)
        expiry.update(newExpiry)
      } else window.clear()
      out.iterator
    }

    override def handleExpiredTimer(user: Long, timers: TimerValues,
        info: ExpiredTimerInfo): Iterator[RollOut] = {
      window.clear()
      expiry.clear()
      Iterator.empty
    }
  }

  /** `events` must be a streaming Dataset with an event-time watermark
    * already applied (the timer expiry rides it); columns
    * (event_id, user_id, value, us).
    */
  def rollingVelocity(events: Dataset[RollEvent],
      windowMicros: Long = 3600L * 1000000L): Dataset[RollOut] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .groupByKey(_.user_id)
      .transformWithState(new RollingProcessor(windowMicros),
        TimeMode.EventTime(), OutputMode.Append())
  }

  /** Convenience: (event_id, user_id, value, us) columns + a watermark on
    * `ts` → [[rollingVelocity]].
    */
  def rollingVelocityFromColumns(events: DataFrame,
      windowMicros: Long = 3600L * 1000000L,
      watermarkDelay: String = "1 hour"): Dataset[RollOut] = {
    val spark = events.sparkSession
    import spark.implicits._
    rollingVelocity(
      events.withWatermark("ts", watermarkDelay)
        .selectExpr("event_id", "user_id", "value", "us").as[RollEvent],
      windowMicros)
  }
}
