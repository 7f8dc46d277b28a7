package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sessionization as TRUE streaming state — Spark's native
  * `session_window` aggregation (dynamic-gap session windows merged by
  * the state store) with a watermark bounding state: sessions finalize
  * and emit (append mode) once the watermark passes their close, so
  * state per key is O(open sessions), not O(history).
  *
  * Batch parity: [[graft.ops.WindowKernels.sessionize]] splits when a
  * gap is STRICTLY greater than the threshold, `session_window` merges
  * events strictly closer than the gap — the two agree except for
  * events at exactly the gap distance (pinned in StreamingSpec on
  * gap-free-boundary data).
  */
object StreamingSessions {

  /** Per-(keys, session) rollup of a streaming events frame. `tsCol`
    * must be the event-time TIMESTAMP column the watermark rides.
    */
  def sessionStats(events: DataFrame, tsCol: String, keys: Seq[String],
                   gap: String, watermarkDelay: String): DataFrame =
    events.withWatermark(tsCol, watermarkDelay)
      .groupBy((keys.map(col) :+ session_window(col(tsCol), gap)): _*)
      .agg(count(lit(1)).as("n_events"),
        min(unix_micros(col(tsCol))).as("t_start_us"),
        max(unix_micros(col(tsCol))).as("t_end_us"))
      .select(keys.map(col) ++ Seq(
        col("t_start_us"), col("t_end_us"), col("n_events"),
        (col("t_end_us") - col("t_start_us")).as("duration_us")): _*)
}
