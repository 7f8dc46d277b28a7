package graft.streaming

import graft.functions.TextAnalysis
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming exact deduplication for continuous ingestion: the
  * first-seen document per normalized-text fingerprint passes through,
  * later copies — in the same or any later micro-batch — are dropped.
  * This is the streaming face of [[graft.functions.Dedup.exact]]: the
  * batch operator marks duplicates after the fact; the stream never
  * lets them in.
  *
  * State shape: one state-store entry per DISTINCT fingerprint, hash-
  * partitioned across executors by Structured Streaming's dedup
  * operator — at ingest scale the state is the dedup index itself.
  * Unbounded retention in [[apply]]; when ingestion has event time,
  * [[withinWatermark]] bounds state to the watermark horizon — exactly
  * the retention window a production ingest pipeline negotiates
  * ("duplicates only ever arrive within N hours of the original").
  */
object StreamingDedup {

  /** Global dedup: state grows with distinct documents. */
  def apply(ds: DataFrame, textCol: String): DataFrame =
    ds.withColumn("fingerprint", TextAnalysis.fingerprint(col(textCol)))
      .dropDuplicates("fingerprint")

  /** Watermark-bounded dedup: duplicates are suppressed as long as they
    * arrive within `delay` of the watermark; state older than the
    * horizon is evicted, keeping the store size ∝ ingest-rate × delay
    * instead of corpus size.
    */
  def withinWatermark(ds: DataFrame, textCol: String, timeCol: String,
                      delay: String): DataFrame =
    ds.withColumn("fingerprint", TextAnalysis.fingerprint(col(textCol)))
      .withWatermark(timeCol, delay)
      .dropDuplicatesWithinWatermark("fingerprint")
}
