package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One observation for the drift monitor. */
final case class CusumIn(ds: Long, tUs: Long, tie: Long, v: Long)

/** Per-stream CUSUM accumulators + the last accepted (t, tie) so late
  * rows are dropped with the same rule at every micro-batch split.
  */
final case class CusumState(sp: Long, sn: Long, lastT: Long, lastTie: Long)

/** Streaming face of `WindowKernels.cusumFixed` (Page 1954 with
  * configured control limits): the clamped recursion
  * S⁺ ← max(0, S⁺ + (v − μ − k)) needs exactly two longs of state per
  * stream — the reason the FIXED-parameter form is the streamable one
  * (the data-derived form's μ/mad need the whole series). Each accepted
  * row emits (stream, tie, s_pos, s_neg, alarm); rows at-or-before the
  * stream's high-water (t, tie) mark are dropped, so replays and
  * cross-batch reordering cannot double-count. stream == batch pinned
  * at every split point in `StreamingCusumSpec`.
  */
object StreamingCusum {

  def step(muMicro: Long, slackMicro: Long, hMicro: Long)(
      key: Long, rows: Iterator[CusumIn],
      state: GroupState[CusumState]): Iterator[(Long, Long, Long, Long, Boolean)] = {
    var st = state.getOption.getOrElse(
      CusumState(0L, 0L, Long.MinValue, Long.MinValue))
    val out = scala.collection.mutable.ArrayBuffer
      .empty[(Long, Long, Long, Long, Boolean)]
    rows.toSeq.sortBy(r => (r.tUs, r.tie)).foreach { r =>
      if (r.tUs > st.lastT || (r.tUs == st.lastT && r.tie > st.lastTie)) {
        val sp = math.max(0L, st.sp + (r.v - muMicro - slackMicro))
        val sn = math.max(0L, st.sn + (muMicro - r.v - slackMicro))
        st = CusumState(sp, sn, r.tUs, r.tie)
        out += ((key, r.tie, sp, sn, sp > hMicro || sn > hMicro))
      }
    }
    state.update(st)
    out.iterator
  }

  /** Run with OutputMode.Append: one emission per accepted observation,
    * identical to the batch `cusumFixed` rows for the same input.
    */
  def monitor(ds: DataFrame, keyCol: String, tsUsCol: String,
              vMicroCol: String, tieCol: String,
              muMicro: Long, slackMicro: Long, hMicro: Long): DataFrame = {
    import ds.sparkSession.implicits._
    ds.select(col(keyCol).cast("long").as("ds"),
        col(tsUsCol).cast("long").as("tUs"),
        col(tieCol).cast("long").as("tie"),
        col(vMicroCol).cast("long").as("v"))
      .as[CusumIn]
      .groupByKey(_.ds)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout)(step(muMicro, slackMicro, hMicro))
      .toDF("datastream_id", "iot_id", "s_pos_micro", "s_neg_micro",
        "alarm")
  }
}
