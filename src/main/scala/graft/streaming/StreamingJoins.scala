package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Watermarked stream-stream joins — the Structured Streaming join
  * machinery itself (state-store buffered, watermark-bounded), as
  * opposed to the keyed-state operators elsewhere in this package.
  *
  * The canonical shape: attribute every click to the view that
  * preceded it within the attribution window, with BOTH sides
  * unbounded streams. The time-range predicate
  * `v.ts < c.ts AND c.ts <= v.ts + window` plus watermarks on both
  * sides lets Spark expire buffered rows: per-key state is bounded by
  * (watermark delay + window) × arrival rate, not by history. An
  * un-watermarked stream-stream join would buffer forever — the knob
  * IS the scale story here.
  *
  * Inner-join emissions are watermark-INDEPENDENT (a match emits as
  * soon as both rows have arrived), so the emitted set equals the
  * batch join over the same rows at every micro-batch split — the
  * pin `StreamingJoinsSpec` holds. Outer-side nulls, by contrast,
  * emit only when the watermark closes the possibility of a match;
  * that path is timing-dependent by design and stays out of the
  * equality contract.
  */
object StreamingJoins {

  /** Click-to-view attribution within `windowSec`. Both inputs need an
    * event-time `ts` timestamp column plus the named key/id columns;
    * emits (user_id, view_id, click_id, dt_us).
    */
  def attributionJoin(views: DataFrame, clicks: DataFrame,
                      windowSec: Long, delaySec: Long = 3600L): DataFrame = {
    val v = views.select(col("user_id"), col("id").as("view_id"),
        col("ts").as("v_ts"))
      .withWatermark("v_ts", s"$delaySec seconds")
    val c = clicks.select(col("user_id"), col("id").as("click_id"),
        col("ts").as("c_ts"))
      .withWatermark("c_ts", s"$delaySec seconds")
    v.join(c, expr(
        s"""v_ts < c_ts AND
           |c_ts <= v_ts + interval $windowSec seconds""".stripMargin)
        && v("user_id") === c("user_id"))
      .select(v("user_id"), col("view_id"), col("click_id"),
        (unix_micros(col("c_ts")) - unix_micros(col("v_ts"))).as("dt_us"))
  }
}
