package graft.streaming

import graft.functions.Sketches
import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One (stratum, register, rho) token observation — hashed map-side with
  * the SAME columns as the batch sketch, so stream and batch registers
  * are bit-compatible.
  */
final case class HllToken(stratum: String, reg: Int, rho: Int)

/** Per-stratum sketch snapshot after a micro-batch. */
final case class HllSnapshot(stratum: String, hllZeros: Long,
                             hllDenomQ49: Long, hllEstimate: Double)

/** Streaming cardinality monitor — the streaming face of
  * [[graft.functions.Sketches.hllProfile]]: per-stratum distinct-count
  * estimates maintained continuously over an ingest stream ("how many
  * distinct tokens/users/urls has this source produced so far").
  *
  * The batch profile is two cascaded aggregations, which Structured
  * Streaming cannot chain; the streaming form is keyed register state
  * instead: `flatMapGroupsWithState` per stratum holding the m register
  * maxima as one byte array (m bytes per stratum, O(1) — a thousand
  * strata is a megabyte of store). Each micro-batch folds its tokens
  * into the registers and emits the stratum's refreshed snapshot
  * (Update mode). Register updates are max-merges — commutative and
  * idempotent, so replays and late data cannot corrupt the estimate,
  * and a snapshot's registers can be merged with any batch sketch of
  * the same (p, salt).
  */
object StreamingSketch {

  /** The per-group fold (shared by the stream and the spec). */
  def step(p: Int)(key: String, rows: Iterator[HllToken],
                   state: GroupState[Array[Byte]]): Iterator[HllSnapshot] = {
    val m = 1 << p
    val regs = state.getOption.getOrElse(new Array[Byte](m))
    rows.foreach { r =>
      if (r.rho > regs(r.reg)) regs(r.reg) = r.rho.toByte
    }
    state.update(regs)
    var zeros = 0L; var denom = 0L
    var i = 0
    while (i < m) {
      val b = regs(i) & 0xff
      if (b == 0) zeros += 1
      denom += 1L << (49 - b)
      i += 1
    }
    Iterator.single(HllSnapshot(key, zeros, denom,
      Sketches.hllNumerator(p) / denom.toDouble))
  }

  /** `ds` is a (possibly streaming) frame; `item` the value column.
    * Returns the per-stratum snapshot stream (one row per stratum per
    * micro-batch that touched it) — run with OutputMode.Update.
    */
  def hllMonitor(ds: DataFrame, stratumCol: String, item: Column,
                 p: Int = 12, salt: String = "hll"): Dataset[HllSnapshot] = {
    import ds.sparkSession.implicits._
    val (reg, rho) = Sketches.hllRegisterRho(item, p, salt)
    ds.select(col(stratumCol).cast("string").as("stratum"),
        reg.cast("int").as("reg"), rho.cast("int").as("rho"))
      .as[HllToken]
      .groupByKey(_.stratum)
      .flatMapGroupsWithState(OutputMode.Update,
        GroupStateTimeout.NoTimeout)(step(p))
  }
}
