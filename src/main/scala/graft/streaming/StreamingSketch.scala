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

/** One (sketch row, cell) hit — derived map-side with the same hash
  * columns as the batch CMS, so stream and batch cells are
  * bit-compatible.
  */
final case class CmsToken(cmsRow: Int, cmsCol: Int)

/** One refreshed CMS cell after a micro-batch. */
final case class CmsCell(cmsRow: Int, cmsCol: Int, cmsCnt: Long)

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

  /** The per-row CMS fold: state = the row's w cell counts (one long
    * array — w=2048 is 16 KB per row, the whole sketch fits any state
    * store); emits the refreshed value of every cell this batch touched.
    * Cell updates are SUMS — commutative but not idempotent (unlike the
    * HLL max-merge), so correctness under retries leans on Structured
    * Streaming's exactly-once state semantics, not on the operation.
    */
  def cmsStep(w: Int)(key: Int, rows: Iterator[CmsToken],
                      state: GroupState[Array[Long]]): Iterator[CmsCell] = {
    val cells = state.getOption.getOrElse(new Array[Long](w))
    val touched = scala.collection.mutable.SortedSet.empty[Int]
    rows.foreach { t => cells(t.cmsCol) += 1L; touched += t.cmsCol }
    state.update(cells)
    touched.iterator.map(c => CmsCell(key, c, cells(c))).toIndexedSeq.iterator
  }

  /** Streaming frequency monitor — the streaming face of
    * [[Sketches.cmsSketch]]: the d×w Count-Min grid maintained as keyed
    * state over an ingest stream, bit-compatible with (and mergeable
    * into) any batch sketch of the same (d, w, salt). The keyed-state
    * grain is the sketch ROW (d groups — cell additivity would allow any
    * finer (row, col-block) sharding if d-way parallelism ever bound);
    * run with OutputMode.Update. Probe the latest cells with
    * [[Sketches.cmsEstimate]].
    */
  def cmsMonitor(ds: DataFrame, item: Column, d: Int = 4, w: Int = 2048,
                 salt: String = "cms"): Dataset[CmsCell] = {
    import ds.sparkSession.implicits._
    val hits = explode(array((0 until d).map { j =>
      struct(lit(j).as("cmsRow"),
        pmod(Sketches.hash60(concat(lit(s"$salt$j"), item.cast("string"))),
          lit(w.toLong)).cast("int").as("cmsCol"))
    }: _*))
    ds.select(hits.as("__c"))
      .select(col("__c.cmsRow").as("cmsRow"), col("__c.cmsCol").as("cmsCol"))
      .as[CmsToken]
      .groupByKey(_.cmsRow)
      .flatMapGroupsWithState(OutputMode.Update,
        GroupStateTimeout.NoTimeout)(cmsStep(w))
  }
}
