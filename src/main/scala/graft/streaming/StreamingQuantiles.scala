package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One quantized observation. */
final case class QuantIn(stratum: String, v: Long)

/** Per-stratum refreshed exact percentiles after a micro-batch. */
final case class QuantOut(stratum: String, n: Long, p50: Long, p90: Long)

/** Streaming face of [[graft.functions.Sketches.exactQuantiles]]:
  * EXACT per-stratum percentiles maintained continuously. State per
  * stratum is the distinct-value histogram (a map bounded by the
  * quantized value domain — the same bound that makes the batch
  * operator sort-free), folded additively, so any micro-batch split
  * yields the same state and the emitted percentiles always equal the
  * batch operator over the rows seen (percentile_disc semantics:
  * smallest value whose cumulative count reaches q%).
  */
object StreamingQuantiles {

  private def disc(hist: Map[Long, Long], total: Long, q: Int): Long = {
    var cum = 0L
    val it = hist.toSeq.sortBy(_._1).iterator
    while (it.hasNext) {
      val (v, c) = it.next()
      cum += c
      if (cum * 100 >= total * q) return v
    }
    0L
  }

  def step(key: String, rows: Iterator[QuantIn],
           state: GroupState[Map[Long, Long]]): Iterator[QuantOut] = {
    var hist = state.getOption.getOrElse(Map.empty[Long, Long])
    rows.foreach { r =>
      hist = hist.updated(r.v, hist.getOrElse(r.v, 0L) + 1L)
    }
    state.update(hist)
    val n = hist.valuesIterator.sum
    Iterator.single(QuantOut(key, n, disc(hist, n, 50), disc(hist, n, 90)))
  }

  /** Run with OutputMode.Update; the last snapshot per stratum is the
    * converged percentile row.
    */
  def monitor(ds: DataFrame, stratumCol: String,
              value: Column): Dataset[QuantOut] = {
    import ds.sparkSession.implicits._
    ds.select(col(stratumCol).cast("string").as("stratum"),
        value.cast("long").as("v"))
      .as[QuantIn]
      .groupByKey(_.stratum)
      .flatMapGroupsWithState(OutputMode.Update,
        GroupStateTimeout.NoTimeout)(step)
  }
}
