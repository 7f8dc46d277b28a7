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
  * tail — never by history length. Arithmetic matches the batch twin
  * exactly: centi-quantized values, integer sums, num²·10⁶ over the
  * variance product in BigInt with truncating division.
  * stream == batch pinned at every split in `StreamingCorrSpec`.
  */
object StreamingCorr {

  def step(bucketUs: Long, windowRows: Int, minPairs: Int)(
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
        val sx = win.map(_._2).sum; val sy = win.map(_._3).sum
        val sxy = win.map(w => w._2 * w._3).sum
        val sxx = win.map(w => w._2 * w._2).sum
        val syy = win.map(w => w._3 * w._3).sum
        val num = n * sxy - sx * sy
        val den = BigInt(n * sxx - sx * sx) * (n * syy - sy * sy)
        val r2 =
          if (den == 0) None
          else {
            val mag = (BigInt(num) * num * 1000000 / den).toLong
            Some(if (num < 0) -mag else mag)
          }
        out += ((key, b, n, r2))
      }
      tail = (tail :+ cur).takeRight(windowRows - 1)
    }
    val emitted = if (ready.nonEmpty) ready.max else st.emittedUpTo
    // aligned-and-consumed buckets leave the maps; one-sided buckets at
    // or below both high-waters can never align (in-order per side)
    st = st.copy(
      px = st.px.filter { case (b, _) => b > minHw },
      py = st.py.filter { case (b, _) => b > minHw },
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
              minPairs: Int = 4): DataFrame = {
    import ds.sparkSession.implicits._
    ds.select(col(keyCol).cast("long").as("d"),
        col(tsUsCol).cast("long").as("tUs"),
        col(tieCol).cast("long").as("tie"),
        col(vMicroCol).cast("long").as("v"))
      .as[CorrIn]
      .groupByKey(r => r.d / 2)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout)(step(bucketUs, windowRows, minPairs))
      .toDF("pair_id", "bucket", "n_w", "r2_signed_ppm")
  }
}
