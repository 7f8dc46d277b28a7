package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One change row: op is "upsert" or "delete"; seq is the change-log
  * position (the total order within a key).
  */
final case class Change(key: Long, seq: Long, op: String, value: Double)

/** Current state of one key after a micro-batch; deleted keys emit a
  * tombstone (present = false) so the sink can retract.
  */
final case class KeyState(key: Long, seq: Long, present: Boolean,
                          value: Double)

/** Streaming CDC apply — MERGE INTO as a stream: fold a change log
  * (upserts/deletes with per-key sequence numbers) into keyed state so
  * the maintained table always equals "last writer wins by seq" over
  * every change seen. The consumer of [[graft.core.Tables.snapshotDiff]]
  * output (or any upstream CDC feed).
  *
  * State = one (seq, present, value) per live key. Out-of-order and
  * duplicate deliveries are absorbed: a change only applies if its seq
  * is NEWER than the state's (idempotent replays, late arrivals
  * ignored), so any micro-batch split of the same log converges to the
  * same table (spec-pinned against the batch window form).
  */
object StreamingCdc {

  def step(key: Long, rows: Iterator[Change],
           state: GroupState[(Long, Boolean, Double)]): Iterator[KeyState] = {
    var (seq, present, value) =
      state.getOption.getOrElse((Long.MinValue, false, 0.0))
    // fold in log order regardless of delivery order within the batch
    rows.toSeq.sortBy(_.seq).foreach { c =>
      if (c.seq > seq) {
        seq = c.seq
        if (c.op == "delete") { present = false; value = 0.0 }
        else { present = true; value = c.value }
      }
    }
    state.update((seq, present, value))
    Iterator.single(KeyState(key, seq, present, value))
  }

  def applyChanges(changes: Dataset[Change]): Dataset[KeyState] = {
    import changes.sparkSession.implicits._
    changes.groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Update,
        GroupStateTimeout.NoTimeout)(step)
  }
}
