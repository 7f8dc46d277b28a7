package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One observation for the gap monitor. `evt` carries the event-time
  * watermark attribute through the typed boundary (dropping it with a
  * map would strip the watermark the EventTimeTimeout needs).
  */
final case class GapIn(ds: Long, tUs: Long, tie: Long,
                       evt: java.sql.Timestamp)

/** Per-stream high-water mark. */
final case class GapState(lastT: Long, lastTie: Long)

/** One gap event: closed (both bounds known) or open (the stream has
  * been silent past the threshold and the watermark proves it — end
  * and width unknown by definition).
  */
final case class GapOut(datastream_id: Long, gap_start_us: Long,
                        gap_end_us: Option[Long], gap_us: Option[Long],
                        open: Boolean)

/** Streaming face of `WindowKernels.gapEvents` — the silence monitor a
  * sensor fleet runs live, and the ONE twin that needs event-time
  * TIMERS, not just keyed state: a closed gap is detected by the
  * observation that ends it, but an ONGOING outage has no such
  * observation — only the event-time watermark advancing past
  * lastT + threshold (carried by OTHER streams' data) can prove the
  * silence. `GroupStateTimeout.EventTimeTimeout` +
  * `setTimeoutTimestamp` is exactly that proof; every other monitor
  * in this package is NoTimeout because its emissions are
  * data-triggered.
  *
  * Closed gaps replay the batch op exactly (stream == batch at every
  * split, `StreamingGapsSpec`); the open-gap alert fires once per
  * silence (the timer is re-armed only by new data, which also closes
  * the gap the alert announced).
  */
object StreamingGaps {

  def step(thresholdUs: Long)(
      key: Long, rows: Iterator[GapIn],
      state: GroupState[GapState]): Iterator[GapOut] = {
    if (state.hasTimedOut) {
      // silence proven by the watermark: alert once, keep the mark so
      // the gap closes normally when data returns; no re-arm — a
      // second alert for the same silence would just repeat this one
      Iterator(GapOut(key, state.get.lastT, None, None, open = true))
    } else {
      var st = state.getOption.getOrElse(
        GapState(Long.MinValue, Long.MinValue))
      val out = scala.collection.mutable.ArrayBuffer.empty[GapOut]
      rows.toSeq.sortBy(r => (r.tUs, r.tie)).foreach { r =>
        if (r.tUs > st.lastT || (r.tUs == st.lastT && r.tie > st.lastTie)) {
          if (st.lastT != Long.MinValue && r.tUs - st.lastT > thresholdUs)
            out += GapOut(key, st.lastT, Some(r.tUs),
              Some(r.tUs - st.lastT), open = false)
          st = GapState(r.tUs, r.tie)
        }
      }
      state.update(st)
      state.setTimeoutTimestamp(st.lastT / 1000L + thresholdUs / 1000L)
      out.iterator
    }
  }

  /** Run with OutputMode.Append. `ds` must carry an event-time
    * watermark (the monitor sets one from `tsUsCol` via
    * `timestamp_micros`); `watermarkDelay` bounds how out-of-order
    * observations may arrive before the open-gap timer can fire.
    */
  def monitor(ds: DataFrame, keyCol: String, tsUsCol: String,
              tieCol: String, thresholdUs: Long,
              watermarkDelay: String = "0 seconds"): DataFrame = {
    import ds.sparkSession.implicits._
    ds.select(col(keyCol).cast("long").as("ds"),
        col(tsUsCol).cast("long").as("tUs"),
        col(tieCol).cast("long").as("tie"))
      .withColumn("evt", timestamp_micros(col("tUs")))
      .withWatermark("evt", watermarkDelay)
      .as[GapIn]
      .groupByKey(_.ds)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(step(thresholdUs))
      .toDF("datastream_id", "gap_start_us", "gap_end_us", "gap_us",
        "open")
  }
}
