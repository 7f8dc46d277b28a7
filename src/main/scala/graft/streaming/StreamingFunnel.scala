package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One event entering the streaming funnel. */
final case class FunnelEvent(key: Long, etype: String, tUs: Long)

/** Per-key funnel progress: last processed event time (late-data guard)
  * and the first-qualifying time per step (-1 = unreached). Flat longs —
  * columnar-state-friendly, O(steps) per key regardless of history.
  */
final case class FunnelState(lastTUs: Long, times: Array[Long])

/** Emitted whenever a key's funnel deepens: it just reached `stage`
  * (1-based) at event time `tUs`.
  */
final case class FunnelAdvance(key: Long, stage: Int, tUs: Long)

/** The ordered funnel ([[graft.ops.Funnel]]) as TRUE streaming state
  * (`flatMapGroupsWithState`): per key, keep the first time each step
  * was reached at-or-after the previous step, emit an advance row the
  * moment a stage is first reached — funnel dashboards update at ingest
  * latency instead of per batch recompute.
  *
  * Batch parity (pinned in StreamingSpec): on in-order streams the final
  * advance per key equals `Funnel.ordered`'s stage, and each stage's
  * `tUs` equals the batch `tI`. In-batch rows sort by (time, step rank)
  * so equal-timestamp events qualify in funnel order exactly like the
  * batch `>=` boundary; rows older than the key's last processed time
  * are dropped (the watermark policy — a replay/backfill runs the batch
  * operator instead). Ties split ACROSS micro-batches resolve in arrival
  * order — the one divergence, same family as the session-gap boundary.
  *
  * Scale: state is `steps.length + 1` longs per key; each micro-batch
  * shuffles only itself (hash by key).
  */
object StreamingFunnel {

  /** The per-group transition (shared by the stream and direct tests). */
  def step(steps: Array[String])(
      key: Long, rows: Iterator[FunnelEvent],
      state: GroupState[FunnelState]): Iterator[FunnelAdvance] = {
    val rank = steps.zipWithIndex.toMap
    val st = state.getOption.getOrElse(
      FunnelState(Long.MinValue, Array.fill(steps.length)(-1L)))
    val times = st.times.clone()
    var lastT = st.lastTUs
    val out = Seq.newBuilder[FunnelAdvance]
    rows.toArray
      .filter(r => rank.contains(r.etype) && r.tUs >= lastT)
      .sortBy(r => (r.tUs, rank(r.etype)))
      .foreach { r =>
        val i = rank(r.etype)
        if (times(i) < 0 && (i == 0 || (times(i - 1) >= 0 && r.tUs >= times(i - 1)))) {
          times(i) = r.tUs
          out += FunnelAdvance(key, i + 1, r.tUs)
        }
        lastT = math.max(lastT, r.tUs)
      }
    state.update(FunnelState(lastT, times))
    out.result().iterator
  }

  def apply(events: Dataset[FunnelEvent], steps: Seq[String]): Dataset[FunnelAdvance] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        step(steps.toArray))
  }
}
