package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One tracked-attribute observation. */
final case class ScdIn(ds: Long, tUs: Long, tie: Long, v: String)

/** One CLOSED validity interval (half-open [from, to)). */
final case class ScdOut(datastream_id: Long, value: String,
                        valid_from_us: Long, valid_to_us: Long,
                        n_rows: Long)

/** The open interval: current value, its start, rows seen, and the
  * last folded (t, tie) — the monotonic horizon late rows drop below.
  */
final case class ScdOpen(v: String, fromUs: Long, n: Long,
                         lastT: Long, lastTie: Long)

/** Streaming face of [[graft.ops.WindowKernels.scd2Intervals]]: SCD2
  * validity intervals emitted as the tracked value CHANGES. State per
  * key is the one open interval; a change closes it (emitting exactly
  * the batch kernel's row) and opens the next. The emitted set always
  * equals the batch kernel's CLOSED intervals (valid_to_us non-null)
  * over the same rows — pinned across micro-batch splits. Rows at or
  * below the folded horizon drop deterministically (the watermark
  * decision made explicit), and a re-arrival of the SAME value only
  * bumps the open interval's row count — no flicker interval.
  */
object StreamingScd {

  def step(key: Long, rows: Iterator[ScdIn],
           state: GroupState[ScdOpen]): Iterator[ScdOut] = {
    val out = scala.collection.mutable.Buffer.empty[ScdOut]
    var open = state.getOption.orNull
    rows.toSeq.sortBy(r => (r.tUs, r.tie)).foreach { r =>
      if (open == null) {
        open = ScdOpen(r.v, r.tUs, 1L, r.tUs, r.tie)
      } else if (r.tUs > open.lastT ||
        (r.tUs == open.lastT && r.tie > open.lastTie)) {
        if (r.v == open.v) {
          open = open.copy(n = open.n + 1L, lastT = r.tUs, lastTie = r.tie)
        } else {
          out += ScdOut(key, open.v, open.fromUs, r.tUs, open.n)
          open = ScdOpen(r.v, r.tUs, 1L, r.tUs, r.tie)
        }
      } // else: at/below the folded horizon — dropped
    }
    if (open != null) state.update(open)
    out.iterator
  }

  /** Returns the closed-interval stream — run with OutputMode.Append. */
  def scdMonitor(ds: DataFrame, keyCol: String, tsUsCol: String,
                 tieCol: String, valueCol: String): Dataset[ScdOut] = {
    import ds.sparkSession.implicits._
    ds.select(col(keyCol).cast("long").as("ds"),
        col(tsUsCol).cast("long").as("tUs"),
        col(tieCol).cast("long").as("tie"),
        col(valueCol).cast("string").as("v"))
      .as[ScdIn]
      .groupByKey(_.ds)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout)(step)
  }
}
