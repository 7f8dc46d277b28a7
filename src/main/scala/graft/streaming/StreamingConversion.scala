package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One event routed to the monitor: source opens a pending attempt,
  * target resolves in-window attempts, every event advances time.
  */
final case class ConvIn(ds: Long, tUs: Long, tie: Long, isSrc: Boolean,
                        isTgt: Boolean, id: Long)

/** One resolved attempt: converted with its latency, or timed out
  * (dt_us null).
  */
final case class ConvOut(datastream_id: Long, id: Long, t_us: Long,
                         converted: Boolean, dt_us: Option[Long])

/** Pending attempts (id, t, tie) + the folded event-time horizon. */
final case class ConvState(pending: List[(Long, Long, Long)], lastT: Long,
                           lastTie: Long)

/** Streaming face of [[graft.ops.WindowKernels.conversionTimeout]]:
  * per source event, emit its verdict AS SOON AS the event stream
  * decides it — a target lands inside the window (converted, with
  * latency) or any later event's time passes the window end (timed
  * out). State per key is the open-attempt list, bounded by
  * window × arrival rate (attempts resolve and leave).
  *
  * Contract vs the batch kernel: for every RESOLVED attempt the
  * (converted, dt_us-when-converted) pair equals the batch verdict —
  * pinned across splits in `StreamingConversionSpec`. A timed-out
  * attempt reports dt_us = NULL (the batch kernel, with hindsight,
  * reports the eventual too-late target's distance; a monitor that
  * must act at the deadline cannot).
  */
object StreamingConversion {

  def stepW(windowUs: Long)(key: Long, rows: Iterator[ConvIn],
                            state: GroupState[ConvState]): Iterator[ConvOut] = {
    val out = scala.collection.mutable.Buffer.empty[ConvOut]
    var st = state.getOption.getOrElse(ConvState(Nil, Long.MinValue, Long.MinValue))
    rows.toSeq.sortBy(r => (r.tUs, r.tie)).foreach { r =>
      if (r.tUs > st.lastT || (r.tUs == st.lastT && r.tie > st.lastTie)) {
        // 1) expire attempts whose window closed strictly before r
        val (dead, alive) = st.pending.partition(_._2 + windowUs < r.tUs)
        dead.foreach { case (id, t, _) =>
          out += ConvOut(key, id, t, converted = false, None)
        }
        // 2) a target resolves every attempt it falls strictly AFTER
        //    in (t, tie) order (a same-time later-tie target counts:
        //    dt 0 — the batch following-frame contract); window is
        //    already guaranteed by the expiry above
        def after(p: (Long, Long, Long)): Boolean =
          r.tUs > p._2 || (r.tUs == p._2 && r.tie > p._3)
        val remaining =
          if (r.isTgt) {
            alive.foreach { case p @ (id, t, _) =>
              if (after(p))
                out += ConvOut(key, id, t, converted = true, Some(r.tUs - t))
            }
            alive.filterNot(after)
          } else alive
        // 3) a source opens a new attempt
        val opened =
          if (r.isSrc) (r.id, r.tUs, r.tie) :: remaining else remaining
        st = ConvState(opened, r.tUs, r.tie)
      } // else: at/below the folded horizon — dropped
    }
    state.update(st)
    out.iterator
  }

  def monitor(ds: DataFrame, keyCol: String, tsUsCol: String,
              tieCol: String, isSource: Column, isTarget: Column,
              idCol: String, windowUs: Long): Dataset[ConvOut] = {
    import ds.sparkSession.implicits._
    ds.select(col(keyCol).cast("long").as("ds"),
        col(tsUsCol).cast("long").as("tUs"),
        col(tieCol).cast("long").as("tie"),
        isSource.as("isSrc"), isTarget.as("isTgt"),
        col(idCol).cast("long").as("id"))
      .as[ConvIn]
      .groupByKey(_.ds)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout)(stepW(windowUs))
  }
}
