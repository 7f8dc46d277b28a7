package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One observation routed to its pair's monitor. */
final case class CorrIn(d: Long, tUs: Long, tie: Long, v: Long)

/** Per-pair alignment state: pending per-side bucket representatives,
  * per-side accepted high-water (t, tie) + its bucket, the last ≤ W−1
  * aligned (bucket, x, y) rows, and the emission high-water bucket.
  */
final case class CorrState(px: Map[Long, Long], py: Map[Long, Long],
                           lastTx: Long, lastTieX: Long, hwBx: Long,
                           lastTy: Long, lastTieY: Long, hwBy: Long,
                           tail: Seq[(Long, Long, Long)],
                           emittedUpTo: Long)

/** Streaming face of `WindowKernels.rollingPairCorr`: streams (2k, 2k+1)
  * align on time buckets (FIRST observation per bucket per side — final
  * on arrival under per-side in-order delivery, which the per-side
  * (t, tie) high-water enforces against replays), and an aligned bucket
  * B becomes EMITTABLE only once both sides' high-water buckets reach B
  * — before that an earlier bucket could still align and change B's
  * window. Pending one-sided buckets at-or-below both high-waters can
  * never align (the other side is past them) and are pruned, so state
  * is bounded by the inter-stream skew window plus the W−1 aligned
  * tail — never by history length. That bound holds only while BOTH
  * sides flow: a stream whose partner stops (or never starts) would
  * grow its pending map one entry per bucket forever, so the pending
  * maps are additionally HARD-CAPPED at `maxSkewBuckets` entries per
  * side — the oldest one-sided buckets beyond the cap are dropped
  * (they could only ever align if the partner lagged further than the
  * cap's skew window, in which case those rows are consciously
  * sacrificed for bounded state; the cap never fires while skew stays
  * inside the window, so stream == batch is unaffected there).
  * Arithmetic matches the batch twin exactly: centi-quantized values,
  * BigInt sums/products — exact wherever the batch twin's DECIMAL(38,0)
  * arithmetic is (at that envelope the batch query raises ANSI decimal
  * overflow; the monitor instead emits a NULL r² for the extreme row
  * and keeps running — the one documented asymmetry).
  * stream == batch pinned at every split in `StreamingCorrSpec`.
  */
object StreamingCorr {

  /** DECIMAL(38,0) overflow threshold: past it the batch twin raises
    * ANSI decimal overflow; the streaming side emits NULL r² instead
    * (a monitor must survive one extreme pair).
    */
  private[streaming] val DecimalLimit: BigInt = BigInt(10).pow(38)

  def step(bucketUs: Long, windowRows: Int, minPairs: Int,
           maxSkewBuckets: Int = 4096)(
      key: Long, rows: Iterator[CorrIn],
      state: GroupState[CorrState]): Iterator[(Long, Long, Long, Option[Long])] = {
    var st = state.getOption.getOrElse(CorrState(Map.empty, Map.empty,
      Long.MinValue, Long.MinValue, Long.MinValue,
      Long.MinValue, Long.MinValue, Long.MinValue,
      Seq.empty, Long.MinValue))
    rows.toSeq.sortBy(r => (r.tUs, r.tie)).foreach { r =>
      val xSide = r.d % 2 == 0
      val (lt, ltie) = if (xSide) (st.lastTx, st.lastTieX)
                       else (st.lastTy, st.lastTieY)
      if (r.tUs > lt || (r.tUs == lt && r.tie > ltie)) {
        val b = r.tUs / bucketUs
        val vc = r.v / 10000L
        st =
          if (xSide) st.copy(
            px = if (st.px.contains(b)) st.px else st.px + (b -> vc),
            lastTx = r.tUs, lastTieX = r.tie, hwBx = math.max(st.hwBx, b))
          else st.copy(
            py = if (st.py.contains(b)) st.py else st.py + (b -> vc),
            lastTy = r.tUs, lastTieY = r.tie, hwBy = math.max(st.hwBy, b))
      }
    }
    val minHw = math.min(st.hwBx, st.hwBy)
    val ready = st.px.keySet.intersect(st.py.keySet)
      .filter(b => b <= minHw && b > st.emittedUpTo).toSeq.sorted
    val out = scala.collection.mutable.ArrayBuffer
      .empty[(Long, Long, Long, Option[Long])]
    var tail = st.tail
    ready.foreach { b =>
      val cur = (b, st.px(b), st.py(b))
      val win = (tail :+ cur).takeRight(windowRows)
      val n = win.length.toLong
      if (n >= minPairs) {
        // BigInt end to end — matches the batch twin's widened decimal
        // arithmetic exactly over the full range both can represent
        // (64-bit products here would wrap where batch stays exact: a
        // twin divergence). At the DECIMAL(38,0) envelope the batch
        // side raises ANSI decimal overflow; a long-running monitor
        // must NOT crash on one extreme pair, so the stream reports a
        // NULL r² for that row instead — the one documented,
        // deliberate asymmetry
        def cap(v: BigInt): Option[BigInt] =
          if (v.abs < DecimalLimit) Some(v) else None
        val nB = BigInt(n)
        val sx = win.map(w => BigInt(w._2)).sum
        val sy = win.map(w => BigInt(w._3)).sum
        val sxy = win.map(w => BigInt(w._2) * w._3).sum
        val sxx = win.map(w => BigInt(w._2) * w._2).sum
        val syy = win.map(w => BigInt(w._3) * w._3).sum
        val r2: Option[Long] = for {
          num <- cap(nB * sxy - sx * sy)
          dx <- cap(nB * sxx - sx * sx)
          dy <- cap(nB * syy - sy * sy)
          den <- cap(dx * dy) if den != 0
          n6 <- cap(num * num * 1000000)
        } yield {
          val mag = (n6 / den).toLong
          if (num < 0) -mag else mag
        }
        out += ((key, b, n, r2))
      }
      tail = (tail :+ cur).takeRight(windowRows - 1)
    }
    val emitted = if (ready.nonEmpty) ready.max else st.emittedUpTo
    // aligned-and-consumed buckets leave the maps; one-sided buckets at
    // or below both high-waters can never align (in-order per side).
    // Then the skew cap: a one-sided stream (partner stalled/absent)
    // otherwise grows its pending map without bound — keep only the
    // NEWEST maxSkewBuckets entries per side
    def capped(m: Map[Long, Long]): Map[Long, Long] =
      if (m.size <= maxSkewBuckets) m
      else m.toSeq.sortBy(-_._1).take(maxSkewBuckets).toMap
    st = st.copy(
      px = capped(st.px.filter { case (b, _) => b > minHw }),
      py = capped(st.py.filter { case (b, _) => b > minHw }),
      tail = tail, emittedUpTo = math.max(st.emittedUpTo, emitted))
    state.update(st)
    out.iterator
  }

  /** Run with OutputMode.Append: rows identical to the batch
    * `rollingPairCorr` for the same (in-order per stream) input.
    */
  def monitor(ds: DataFrame, keyCol: String, tsUsCol: String,
              vMicroCol: String, tieCol: String,
              bucketUs: Long = 21600000000L, windowRows: Int = 8,
              minPairs: Int = 4, maxSkewBuckets: Int = 4096): DataFrame = {
    import ds.sparkSession.implicits._
    ds.select(col(keyCol).cast("long").as("d"),
        col(tsUsCol).cast("long").as("tUs"),
        col(tieCol).cast("long").as("tie"),
        col(vMicroCol).cast("long").as("v"))
      .as[CorrIn]
      .groupByKey(r => r.d / 2)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout)(
        step(bucketUs, windowRows, minPairs, maxSkewBuckets))
      .toDF("pair_id", "bucket", "n_w", "r2_signed_ppm")
  }
}
