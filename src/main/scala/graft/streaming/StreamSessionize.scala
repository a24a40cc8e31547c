package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** True-streaming gap sessionization via flatMapGroupsWithState —
  * the stateful-operator form of StreamingOps.sessionize.
  *
  * State is one open session per user (bounded: keyed by user_id, a
  * few longs each — at 100 TB of events state size is O(active
  * users), not O(events)). A session CLOSES when an event arrives
  * more than `gap` after the previous one; closed sessions are
  * emitted downstream (append semantics). Money sums are kept in
  * scaled-integer cents, matching the batch operator's exact-sum
  * discipline, so stream and batch answers are bit-identical.
  *
  * Events inside one micro-batch are sorted per user before folding —
  * micro-batch iterators carry no order guarantee.
  */
object StreamSessionize {

  case class EvIn(user_id: Long, event_id: Long, ts: Timestamp, value: Double)
  case class OpenSession(sessionId: Long, startMicros: Long, lastMicros: Long,
                         n: Long, sumCents: Long)
  case class SessionOut(user_id: Long, session_id: Long, n_events: Long,
                        session_start: Timestamp, session_end: Timestamp,
                        sum_value: Double)

  private def micros(t: Timestamp): Long = t.getTime * 1000L + (t.getNanos / 1000) % 1000

  def apply(events: Dataset[EvIn], gapMinutes: Int): Dataset[SessionOut] = {
    val spark = events.sparkSession
    import spark.implicits._
    val gapMicros = gapMinutes * 60L * 1000000L

    def fold(userId: Long, it: Iterator[EvIn],
             state: GroupState[OpenSession]): Iterator[SessionOut] = {
      val evs = it.toSeq.sortBy(e => (micros(e.ts), e.event_id))
      var open = state.getOption
      val closed = Seq.newBuilder[SessionOut]
      def emit(s: OpenSession): Unit = closed += SessionOut(
        userId, s.sessionId, s.n,
        new Timestamp(s.startMicros / 1000), new Timestamp(s.lastMicros / 1000),
        s.sumCents.toDouble / 100.0)
      evs.foreach { e =>
        val m = micros(e.ts)
        val cents = math.round(e.value * 100.0)
        open match {
          case Some(s) if m <= s.lastMicros + gapMicros =>
            open = Some(s.copy(lastMicros = m, n = s.n + 1, sumCents = s.sumCents + cents))
          case Some(s) =>
            emit(s)
            open = Some(OpenSession(s.sessionId + 1, m, m, 1, cents))
          case None =>
            open = Some(OpenSession(1, m, m, 1, cents))
        }
      }
      open.foreach(state.update)
      closed.result().iterator
    }

    events.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(fold)
  }
}
