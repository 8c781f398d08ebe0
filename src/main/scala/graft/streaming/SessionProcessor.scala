package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** Sessionization on the arbitrary-stateful-processing v2 API
  * (`transformWithState`, Spark 4.x) — the modern replacement for
  * `flatMapGroupsWithState` ([[StreamingPipelines.statefulSessions]] keeps
  * the v1 form; both are tested against the same scenario).
  *
  * v2 advantages that matter at scale: typed named state cells with
  * independent TTLs, explicit timers (multiple per key), and state-format
  * evolution — here one `ValueState[SessState]` plus one event-time timer
  * at `last + gap` per user.
  */
class SessionProcessor(gapMs: Long) extends StatefulProcessor[Long, UserEvent, UserSession] {

  @transient private var session: ValueState[SessState] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    session = getHandle.getValueState[SessState]("session", Encoders.product[SessState], TTLConfig.NONE)

  private def toSession(user: Long, s: SessState): UserSession =
    UserSession(user, new java.sql.Timestamp(s.startMs), new java.sql.Timestamp(s.lastMs), s.n)

  override def handleInputRows(
      user: Long,
      rows: Iterator[UserEvent],
      timerValues: TimerValues
  ): Iterator[UserSession] = {
    val sorted = rows.map(_.ts.getTime).toSeq.sorted
    var open: Option[SessState] = if (session.exists()) Some(session.get()) else None
    val closed = Seq.newBuilder[UserSession]
    sorted.foreach { t =>
      open match {
        case Some(s) if t >= s.startMs - gapMs && t - s.lastMs <= gapMs =>
          open = Some(SessState(math.min(s.startMs, t), math.max(s.lastMs, t), s.n + 1))
        case Some(s) =>
          closed += toSession(user, s)
          open = Some(SessState(t, t, 1L))
        case None => open = Some(SessState(t, t, 1L))
      }
    }
    open.foreach { s =>
      // delete the previous timer before arming the new one — a stale timer
      // from an earlier lastMs would otherwise fire mid-session, emit early,
      // and clear state out from under a live session
      if (session.exists()) {
        val prev = session.get()
        if (prev.lastMs != s.lastMs) getHandle.deleteTimer(prev.lastMs + gapMs)
      }
      session.update(s)
      getHandle.registerTimer(s.lastMs + gapMs)
    }
    closed.result().iterator
  }

  override def handleExpiredTimer(
      user: Long,
      timerValues: TimerValues,
      expiredTimerInfo: ExpiredTimerInfo
  ): Iterator[UserSession] =
    // belt and braces: only honor the timer that matches the CURRENT
    // session's expiry (a leftover timer from a closed session must not
    // emit/clear the live one)
    if (session.exists() &&
      expiredTimerInfo.getExpiryTimeInMs() == session.get().lastMs + gapMs) {
      val out = toSession(user, session.get())
      session.clear()
      Iterator.single(out)
    } else Iterator.empty
}

object SessionProcessor {

  /** Sessionize with the v2 stateful API (event-time mode, append output). */
  def statefulSessionsV2(
      events: Dataset[UserEvent],
      gapMs: Long = 30 * 60 * 1000L,
      watermark: String = "10 minutes"
  ): Dataset[UserSession] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .transformWithState(new SessionProcessor(gapMs), TimeMode.EventTime(), OutputMode.Append())
  }
}
