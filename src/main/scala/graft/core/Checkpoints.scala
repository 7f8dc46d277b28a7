package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.LogicalRDD

/** Explicit lifecycle for eager checkpoints in iterative DataFrame
  * algorithms (PageRank, k-core, LPA, near-dup clustering, BPE
  * training, ...).
  *
  * `Dataset.localCheckpoint(eager = true)` persists the materialized
  * RDD and nothing ever unpersists it: each loop iteration leaks one
  * frame, so a 3-iteration PageRank holds 5 frames of executor storage
  * until the DRIVER happens to GC the Dataset references and the
  * ContextCleaner gets around to the async unpersist — acceptable in a
  * short-lived job, unbounded in a long-lived session, and even within
  * one call the peak storage is `iters` frames when one would do. The
  * fix is the classic iterate-and-release pattern: checkpoint the new
  * frame (eager — its blocks are self-contained), THEN release the
  * superseded one.
  *
  * [[release]] is safe by construction: it unpersists only when the
  * frame's analyzed plan IS the checkpoint scan itself (the root is the
  * [[LogicalRDD]] a checkpoint returns). A derived frame (Project/Join
  * over the checkpoint) is left alone — releasing it must not reach
  * through to a parent another frame still needs, so callers can
  * release unconditionally in loop epilogues without tracking which
  * iteration was actually checkpointed.
  */
object Checkpoints {

  /** Eager checkpoint: truncates lineage and materializes now.
    * Reliable (HDFS-backed) when the caller configured a checkpoint
    * dir, local (executor-disk) otherwise — same dispatch every
    * iterative op here used inline before.
    */
  def eager(df: DataFrame, reliable: Boolean): DataFrame =
    if (reliable) df.checkpoint(true) else df.localCheckpoint(true)

  /** Unpersist the checkpoint blocks behind `df` IF `df` is itself a
    * checkpoint scan; no-op otherwise (see class doc). Non-blocking.
    *
    * release marks END OF LIFE: a local checkpoint's lineage is
    * truncated, so the dropped blocks were the only copy — the frame
    * (and anything derived from it that was not itself materialized)
    * must never be evaluated again. Callers therefore release only
    * frames that are provably dead: superseded loop iterations after
    * the successor's EAGER checkpoint completes, and helper frames the
    * returned result does not reference.
    */
  def release(df: DataFrame): Unit =
    df.queryExecution.analyzed match {
      case lr: LogicalRDD => lr.rdd.unpersist(blocking = false)
      case _ => ()
    }
}
