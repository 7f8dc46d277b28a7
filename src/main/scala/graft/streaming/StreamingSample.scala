package graft.streaming

import graft.functions.Sampling
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One candidate row routed to its stratum's sampler. */
final case class SampleIn(stratum: String, key: Long)

/** One current selection row: stratum, member key, its hash bucket,
  * 1-based rank within the stratum, and the emitting state version
  * (monotone per stratum — the latest version IS the selection).
  */
final case class SampleOut(stratum: String, key: Long, hb: Long,
                           rank: Int, ver: Long)

/** Streaming face of [[Sampling.fixedKPerStratum]]: maintain, per
  * stratum, the k rows FIRST in (hash-bucket, key) order over
  * everything ingested so far — the deterministic "uniform k per
  * group" under continuous arrival. Every micro-batch that changes a
  * stratum's selection re-emits the full k-row selection with a
  * bumped version (Update mode); consumers keep the max-version rows
  * per stratum, exactly like a serving df table over
  * [[StreamingRetrieval]]'s stats.
  *
  * State per stratum: the k (hash, key) pairs plus one version long —
  * BOUNDED BY k BY CONSTRUCTION, independent of ingest history (the
  * 20th twin, and the only one whose state bound is the operator's own
  * output size). Membership hashes with [[Sampling.hashBucketLocal]],
  * bit-identical to the batch Column form, so at any point the latest
  * selection equals `fixedKPerStratum` over exactly the rows ingested
  * — pinned at every micro-batch split in StreamingSampleSpec.
  * Re-ingested duplicates collapse (set semantics on (hash, key)).
  */
object StreamingSample {

  def step(k: Int, salt: String)(stratum: String, rows: Iterator[SampleIn],
      state: GroupState[(Seq[(Long, Long)], Long)]): Iterator[SampleOut] = {
    val (cur, ver) = state.getOption.getOrElse((Seq.empty[(Long, Long)], 0L))
    val merged = (cur ++ rows.map(r =>
        (Sampling.hashBucketLocal(r.key.toString, salt), r.key)))
      .distinct.sorted.take(k)
    if (merged == cur) {
      state.update((cur, ver))
      Iterator.empty
    } else {
      state.update((merged, ver + 1))
      merged.iterator.zipWithIndex.map { case ((h, key), i) =>
        SampleOut(stratum, key, h, i + 1, ver + 1)
      }
    }
  }

  /** Run with OutputMode.Update; latest version per stratum = the
    * current selection.
    */
  def monitor(ds: DataFrame, stratumCol: String, keyCol: String,
              k: Int, salt: String = "graft"): Dataset[SampleOut] = {
    import ds.sparkSession.implicits._
    ds.select(col(stratumCol).cast("string").as("stratum"),
        col(keyCol).cast("long").as("key"))
      .as[SampleIn]
      .groupByKey(_.stratum)
      .flatMapGroupsWithState(OutputMode.Update,
        GroupStateTimeout.NoTimeout)(step(k, salt))
  }
}
