package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.GroupState

/** True-streaming CDC apply via mapGroupsWithState — the stateful
  * form of StreamingOps.cdcApply: one latest-change record per key
  * (state is O(live keys), not O(changes)), last-writer-wins by
  * (ts, event_id), DELETE ops (event_type "error" in this model)
  * tombstone the key. Each micro-batch emits the key's current state
  * (update semantics); the final state equals the batch evaluation —
  * StreamingSpec proves it over a MemoryStream.
  *
  * Micro-batch iterators carry no order guarantee, so changes fold
  * in (ts, event_id) order within a batch, exactly like the batch
  * window's ordering.
  */
object StreamCdc extends Serializable {

  case class ChangeIn(user_id: Long, event_id: Long, ts: Timestamp,
                      event_type: String, value: Option[Double])
  case class KeyState(lastMicros: Long, lastId: Long, op: String,
                      value: Option[Double])
  case class CurrentOut(user_id: Long, last_op: String,
                        current_value: Option[Double], updated_at: Timestamp)

  private def micros(t: Timestamp): Long =
    t.getTime * 1000L + (t.getNanos / 1000) % 1000

  /** Micros → Timestamp WITHOUT truncating sub-millisecond digits
    * (the batch twin passes ts through untouched, so the streamed
    * updated_at must carry full microseconds too). */
  private def toTimestamp(m: Long): Timestamp = {
    val t = new Timestamp((m / 1000000L) * 1000L)
    t.setNanos(((m % 1000000L) * 1000L).toInt)
    t
  }

  val DeleteOp = "error"

  def apply(changes: Dataset[ChangeIn]): Dataset[CurrentOut] = {
    val spark = changes.sparkSession
    import spark.implicits._

    // last-writer-wins is a MAX over (micros, event_id) — order-
    // independent, so the micro-batch iterator folds directly with
    // no buffering or sort
    def fold(userId: Long, it: Iterator[ChangeIn],
             state: GroupState[KeyState]): Iterator[CurrentOut] = {
      var cur = state.getOption
      it.foreach { e =>
        val m = micros(e.ts)
        val newer = cur.forall(s =>
          m > s.lastMicros || (m == s.lastMicros && e.event_id > s.lastId))
        if (newer) cur = Some(KeyState(m, e.event_id, e.event_type, e.value))
      }
      cur.foreach(state.update)
      cur match {
        case Some(s) if s.op != DeleteOp =>
          Iterator.single(CurrentOut(userId, s.op, s.value,
            toTimestamp(s.lastMicros)))
        case _ => Iterator.empty // tombstoned (or no state): key absent
      }
    }

    changes.groupByKey(_.user_id)
      .flatMapGroupsWithState[KeyState, CurrentOut](
        org.apache.spark.sql.streaming.OutputMode.Update,
        org.apache.spark.sql.streaming.GroupStateTimeout.NoTimeout)(fold)
  }
}
