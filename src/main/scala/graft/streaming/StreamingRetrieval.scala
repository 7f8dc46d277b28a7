package graft.streaming

import graft.functions.Retrieval
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One per-doc posting computed map-side (term + its in-doc tf). */
final case class PostingRow(term: String, tf: Long)

/** Refreshed index statistics for one term after a micro-batch:
  * df = documents containing the term so far, cf = total occurrences.
  */
final case class TermStat(term: String, df: Long, cf: Long)

/** Streaming face of the [[Retrieval]] inverted index: incremental
  * term-statistics maintenance over a document ingest stream. BM25
  * serving needs fresh df (idf) and collection frequencies; rebuilding
  * the index per ingest is the batch path — this monitor folds each
  * micro-batch's postings into keyed per-term state and emits the
  * refreshed (term, df, cf) rows (Update mode), which downstream
  * updates the serving df table.
  *
  * Shapes: the per-doc tf map is computed INSIDE the ingest tasks (a
  * HashMap fold over the doc's own terms — no pre-state shuffle, same
  * contract as the batch postings' map-side partial agg); the one
  * stateful stage partitions by term. State = 2 longs per distinct
  * term — Heaps-law sublinear in the corpus. Folds are additive, so
  * any micro-batch split yields the same final stats as the batch
  * index (StreamingRetrievalSpec pins stream == batch); exactly-once
  * sinks keep replays from double-counting, and doc-level re-ingest
  * dedup belongs upstream ([[StreamingDedup]] first-seen-wins).
  */
object StreamingRetrieval {

  /** The per-term fold (shared by the stream and the spec). */
  def step(key: String, rows: Iterator[PostingRow],
           state: GroupState[(Long, Long)]): Iterator[TermStat] = {
    var (df, cf) = state.getOption.getOrElse((0L, 0L))
    rows.foreach { r => df += 1; cf += r.tf }
    state.update((df, cf))
    Iterator.single(TermStat(key, df, cf))
  }

  /** `ds` is a (possibly streaming) frame with an id and a text column;
    * returns the per-term stat stream — run with OutputMode.Update.
    */
  def termStatsMonitor(ds: DataFrame, idCol: String,
                       textCol: String): Dataset[TermStat] = {
    import ds.sparkSession.implicits._
    ds.select(col(idCol).cast("long"),
        Retrieval.bigramTerms(col(textCol)))
      .as[(Long, Seq[String])]
      .flatMap { case (_, ts) =>
        val m = scala.collection.mutable.HashMap.empty[String, Long]
        ts.foreach(t => m.update(t, m.getOrElse(t, 0L) + 1L))
        m.iterator.map { case (t, c) => PostingRow(t, c) }
      }
      .groupByKey(_.term)
      .flatMapGroupsWithState(OutputMode.Update,
        GroupStateTimeout.NoTimeout)(step)
  }
}
