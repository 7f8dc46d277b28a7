package graft.streaming

import graft.core.{Flags, Obs}
import graft.ops.{QcCheck, WindowKernels}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, Trigger}
import org.apache.spark.sql.types.StructType

/** The reference's "streaming" runtime is cron-driven re-runs over
  * sliding, overlapping time windows (`qc_historical/qc_historical.sh:70-100`,
  * `crontab/qc.sh:50-80`) — at-least-once, idempotent because flag writes
  * are last-writer-wins PATCHes keyed on observation id.
  *
  * Spark-native shape: Structured Streaming with `Trigger.AvailableNow`
  * (incremental batch, exactly the cron cadence), a watermark equal to
  * the stabilization lookback (`dt_stabilization` — the reference widens
  * its fetch window backwards by the same amount, `src/main.py:224-241`),
  * and `foreachBatch` so each micro-batch runs the *batch* QC chain —
  * window kernels included — then upserts flags. State never lives in
  * the stream: the overlap re-reads the lookback rows instead, exactly
  * like the reference, so restarts are trivially safe.
  */
object IncrementalQc {

  /** Per-batch QC: range check against broadcast config + time-window
    * checks computed inside the batch (the overlap guarantees lookback
    * context, reference §3.1 step 3).
    */
  def qcBatch(batch: DataFrame, conf: DataFrame): DataFrame = {
    val joined = batch.join(broadcast(conf), Seq(Obs.DatastreamId), "left")
      .withColumn("t_us", unix_micros(col(Obs.Time)))
    val w = Window.partitionBy(col(Obs.DatastreamId)).orderBy(col("t_us"), col(Obs.IotId))
    val ranged = joined
      .withColumn("flag_range",
        QcCheck("range",
          QcCheck.outOfRange(col(Obs.Result), col("qc_range_min"), col("qc_range_max")),
          Flags.Bad, onFalse = Some(Flags.Good), onNan = Some(Flags.NoQc)).flagCol)
    val flagged = WindowKernels.gradientOnto(ranged, "gradient",
        col(Obs.Result), col("t_us").cast("double") / 1e6, w)
      .withColumn("flag_gradient",
        QcCheck("gradient",
          QcCheck.outOfRange(col("gradient"), col("qc_gradient_min"), col("qc_gradient_max")),
          Flags.ProbablyBad, onFalse = Some(Flags.Good), onNan = Some(Flags.NoQc)).flagCol)
    flagged.withColumn(Obs.QcFlag, graft.core.Flags.worstWins(col("flag_range"), col("flag_gradient")))
  }

  /** Wire a parquet-directory stream of observations through per-batch QC
    * into `sink` (an idempotent upsert in production; a memory/file sink
    * in tests). `lookbackSec` == dt_stabilization: late rows within it
    * are still re-processed via the overlap, older ones are dropped.
    */
  def stream(spark: SparkSession, srcDir: String, schema: StructType,
             conf: DataFrame, lookbackSec: Long)(
             sink: (DataFrame, Long) => Unit): DataStreamWriter[org.apache.spark.sql.Row] = {
    spark.readStream.schema(schema).parquet(srcDir)
      .withWatermark(Obs.Time, s"$lookbackSec seconds")
      .writeStream
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, id: Long) =>
        sink(qcBatch(batch, conf), id)
      }
  }
}
