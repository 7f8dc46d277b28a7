package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StateOperatorProgress, StreamingQuery, StreamingQueryProgress}

/** Live state-store health as a QUERYABLE side output — the
  * `sim_index_health` shape applied to streams (reference pattern:
  * `qualityAssuranceTool` logs per-run QC counters; a long-lived ingest
  * needs the same numbers as a frame a dashboard can join/alert on,
  * not a log line).
  *
  * The round-11 soak proved the state plateau OFFLINE (30-min run,
  * plateau exactly flat at the watermark horizon); this surfaces the
  * identical signal LIVE: one row per stateful operator per micro-batch
  * from the engine's own `StreamingQueryProgress` — state rows, bytes,
  * watermark drops, and the RocksDB maintenance counters (changelog
  * replay, snapshot upload, compaction time) that distinguish "state is
  * bounded" from "state is quietly accumulating until the disk fills".
  *
  * Scale note: metrics are driver-resident (Spark keeps the last
  * `spark.sql.streaming.numRecentProgressUpdates` = 100 progress
  * objects); building a frame from them is O(operators × batches kept),
  * never a scan of the state itself — safe to call every batch at any
  * corpus scale.
  */
object StreamingHealth {

  /** One stateful operator's health at one micro-batch. Custom-metric
    * absence (e.g. HDFS-backed store has no RocksDB counters) → -1L,
    * NOT 0: zero is a real observation ("no compaction this batch"),
    * -1 means "store does not report this".
    */
  final case class StateHealth(
      batch_id: Long,
      op_idx: Int,
      operator_name: String,
      state_rows: Long,
      rows_updated: Long,
      rows_removed: Long,
      rows_dropped_by_watermark: Long,
      memory_used_bytes: Long,
      store_instances: Long,
      commit_ms: Long,
      // RocksDB maintenance signals (-1 on non-RocksDB providers):
      sst_file_bytes: Long,          // on-disk state footprint
      compaction_ms: Long,           // rocksdbTotalCompactionLatencyMs
      snapshot_files_copied: Long,   // changelog→snapshot upload activity
      snapshot_bytes_copied: Long,
      changelog_files_replayed: Long // restart-recovery cost signal
  )

  private def custom(o: StateOperatorProgress, key: String): Long = {
    val m = o.customMetrics
    if (m != null && m.containsKey(key)) m.get(key).longValue() else -1L
  }

  private def rows(p: StreamingQueryProgress): Seq[StateHealth] =
    p.stateOperators.toIndexedSeq.zipWithIndex.map { case (o, i) =>
      StateHealth(
        batch_id = p.batchId,
        op_idx = i,
        operator_name = o.operatorName,
        state_rows = o.numRowsTotal,
        rows_updated = o.numRowsUpdated,
        rows_removed = o.numRowsRemoved,
        rows_dropped_by_watermark = o.numRowsDroppedByWatermark,
        memory_used_bytes = o.memoryUsedBytes,
        store_instances = o.numStateStoreInstances,
        commit_ms = o.commitTimeMs,
        sst_file_bytes = custom(o, "rocksdbSstFileSize"),
        compaction_ms = custom(o, "rocksdbTotalCompactionLatencyMs"),
        snapshot_files_copied = custom(o, "rocksdbFilesCopied"),
        snapshot_bytes_copied = custom(o, "rocksdbBytesCopied"),
        changelog_files_replayed = custom(o, "rocksdbNumReplayChangelogFiles"))
    }

  /** Latest micro-batch's health: one row per stateful operator (empty
    * frame with the full schema if the query has not yet completed a
    * batch — callers can union/write it unconditionally).
    */
  def stateHealth(spark: SparkSession, q: StreamingQuery): DataFrame = {
    import spark.implicits._
    Option(q.lastProgress).map(rows).getOrElse(Nil).toDF()
  }

  /** The retained progress window (default last 100 micro-batches):
    * the trend frame — `state_rows` flat vs climbing IS the plateau
    * check the soak asserts, queryable while the stream runs.
    */
  def stateHealthHistory(spark: SparkSession, q: StreamingQuery): DataFrame = {
    import spark.implicits._
    q.recentProgress.toIndexedSeq.flatMap(rows).toDF()
  }

  /** Persist every micro-batch's health rows to a parquet table as the
    * query runs — the durable form of [[stateHealth]]: a dashboard
    * joins/alerts on `outPath` without touching the driver, and the
    * trend survives the driver that produced it (post-mortems read the
    * table of a dead ingest). Driver-side rows only (operators ×
    * batches). The parquet append is a BLOCKING Spark job, so it runs
    * on a dedicated single writer thread, NOT on the shared listener
    * bus: a bus callback that blocks delays event delivery to every
    * other listener, and an exception thrown into the bus kills
    * delivery with no handler. The single thread also serializes
    * appends (parquet append is not concurrent-writer safe), and a
    * failed write logs a warning and drops that batch's rows — the
    * health sink must never take down the stream it watches. Returns
    * the listener; pass it to `spark.streams.removeListener` when the
    * query stops (the writer thread is daemon and drains the queue).
    */
  def attachHealthSink(spark: SparkSession, queryId: java.util.UUID,
                       outPath: String)
      : org.apache.spark.sql.streaming.StreamingQueryListener = {
    import org.apache.spark.sql.streaming.StreamingQueryListener
    val exec = java.util.concurrent.Executors.newSingleThreadExecutor(
      (r: Runnable) => {
        val t = new Thread(r, "graft-health-sink")
        t.setDaemon(true)
        t
      })
    val listener = new StreamingQueryListener {
      override def onQueryStarted(
          e: StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryTerminated(
          e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
      override def onQueryProgress(
          e: StreamingQueryListener.QueryProgressEvent): Unit =
        if (e.progress.id == queryId && e.progress.stateOperators.nonEmpty) {
          // capture the rows HERE (cheap, driver-local) so the handed-off
          // task carries plain data, not the event object
          val batchRows = rows(e.progress)
          exec.submit(new Runnable {
            override def run(): Unit =
              try {
                import spark.implicits._
                batchRows.toDF().write.mode("append").parquet(outPath)
              } catch {
                case t: Throwable =>
                  org.apache.logging.log4j.LogManager
                    .getLogger(StreamingHealth.getClass)
                    .warn(s"health sink append to $outPath failed " +
                      s"(batch ${batchRows.headOption.map(_.batch_id)}): $t")
              }
          })
        }
    }
    spark.streams.addListener(listener)
    listener
  }
}
