package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Streaming face of [[graft.ops.DataQuality]]: continuous rule
  * monitoring over an ingest stream. Each rule is a per-row violation
  * predicate; the monitor keeps running (rows seen, violations) per
  * rule — built-in streaming aggregation state of exactly #rules rows,
  * refreshed every micro-batch (Update mode). Sums are additive, so
  * the monitor's counters always equal the batch audit over the rows
  * seen (spec-pinned), and a dashboard alert is `ok = violations == 0`
  * read off the latest snapshot.
  */
object StreamingQuality {

  /** `rules` are (name, perRowViolationPredicate). */
  def violationMonitor(ds: DataFrame,
                       rules: Seq[(String, Column)]): DataFrame = {
    require(rules.nonEmpty)
    val entries = array(rules.map { case (n, p) =>
      struct(lit(n).as("rule"),
        when(p, 1L).otherwise(0L).as("viol"))
    }: _*)
    ds.select(explode(entries).as("r"))
      .select(col("r.rule").as("rule"), col("r.viol").as("viol"))
      .groupBy(col("rule"))
      .agg(count(lit(1)).as("n_rows"), sum(col("viol")).as("n_violations"))
  }
}
