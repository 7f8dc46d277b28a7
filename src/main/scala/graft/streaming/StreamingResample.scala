package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One observation routed to its grid bucket (bucket computed map-side
  * with the SAME integer DIV as the batch kernel, so stream and batch
  * grids are bit-compatible).
  */
final case class LocfIn(ds: Long, bucket: Long, tUs: Long, tie: Long,
                        v: Double)

/** One finalized grid row. */
final case class LocfOut(datastream_id: Long, bucket_us: Long,
                         v_fill: Double, filled: Boolean)

/** The open (not-yet-finalized) bucket's winning observation. */
final case class LocfPending(bucket: Long, tUs: Long, tie: Long, v: Double)

/** Streaming face of [[graft.ops.WindowKernels.resampleFfill]]: the
  * dense LOCF grid emitted continuously as observations arrive. A
  * bucket finalizes when a LATER bucket's first observation arrives —
  * the winner (last obs by (t_us, tie)) is emitted, followed by one
  * forward-filled row per empty bucket up to the new one. The current
  * maximal bucket stays pending in state (one small case class per
  * stream — O(streams) store), so the emitted prefix always equals the
  * batch kernel over the same rows restricted to buckets strictly
  * below each stream's open bucket — the stream==batch contract the
  * spec pins across micro-batch splits.
  *
  * Ordering contract: rows are folded in (bucket, t_us, tie) order
  * WITHIN each micro-batch; a row below the stream's already-final
  * horizon (late beyond the open bucket) is dropped — the same
  * decision a watermark would make, made deterministic.
  */
object StreamingResample {

  def stepMs(stepUs: Long)(key: Long, rows: Iterator[LocfIn],
                           state: GroupState[LocfPending]): Iterator[LocfOut] = {
    val out = scala.collection.mutable.Buffer.empty[LocfOut]
    var pending = state.getOption.orNull
    rows.toSeq.sortBy(r => (r.bucket, r.tUs, r.tie)).foreach { r =>
      if (pending == null) {
        pending = LocfPending(r.bucket, r.tUs, r.tie, r.v)
      } else if (r.bucket == pending.bucket) {
        if (r.tUs > pending.tUs || (r.tUs == pending.tUs && r.tie > pending.tie))
          pending = LocfPending(r.bucket, r.tUs, r.tie, r.v)
      } else if (r.bucket > pending.bucket) {
        out += LocfOut(key, pending.bucket * stepUs, pending.v, filled = false)
        var b = pending.bucket + 1
        while (b < r.bucket) {
          out += LocfOut(key, b * stepUs, pending.v, filled = true)
          b += 1
        }
        pending = LocfPending(r.bucket, r.tUs, r.tie, r.v)
      } // else: late row below the final horizon — dropped
    }
    if (pending != null) state.update(pending)
    out.iterator
  }

  /** `ds` is a (possibly streaming) frame with long key/ts/tie columns
    * and a double value. Returns the finalized-grid-row stream — run
    * with OutputMode.Append.
    */
  def locfMonitor(ds: DataFrame, keyCol: String, tsUsCol: String,
                  tieCol: String, valueCol: String,
                  stepUs: Long): Dataset[LocfOut] = {
    import ds.sparkSession.implicits._
    ds.select(col(keyCol).cast("long").as("ds"),
        expr(s"$tsUsCol DIV $stepUs").as("bucket"),
        col(tsUsCol).cast("long").as("tUs"),
        col(tieCol).cast("long").as("tie"),
        col(valueCol).cast("double").as("v"))
      .as[LocfIn]
      .groupByKey(_.ds)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout)(stepMs(stepUs))
  }
}
