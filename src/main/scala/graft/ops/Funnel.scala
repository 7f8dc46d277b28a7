package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Ordered-event funnel analysis: per key, the first occurrence of step 1,
  * then the first occurrence of step 2 at-or-after it, and so on — an event
  * only counts toward a stage if it happens at or after the previous stage
  * was reached (a 'click' before the first 'view' is not a funnel click).
  *
  * Scale shape: one chained min-aggregation per step, every shuffle on the
  * same key so the exchanges line up, and each later stage joins only the
  * survivors of the previous stage (monotonically shrinking frames, never a
  * row×row self-join of the event table). The heavy table is scanned once
  * per step with the step's type filter pushed to the scan.
  */
object Funnel {

  /** @param steps event-type values in funnel order (≥ 1)
    * @return one row per key that reached step 1: (key, t1..tN, stage)
    *   where tI is the µs/identity value of `tsCol` at which step I was
    *   first reached (null if never) and stage = deepest step reached.
    */
  def ordered(df: DataFrame, keyCol: String, typeCol: Column, tsCol: Column,
              steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    require(steps.distinct == steps, s"funnel steps must be distinct: $steps")
    val e = df.select(col(keyCol), typeCol.as("__type"), tsCol.as("__ts"))
    // each stage frame is consumed twice (next stage's lineage + the final
    // assembly join), but NOT cached: every stage ends in a groupBy —
    // an Exchange — and identical Exchange subtrees inside the one
    // assembled plan are planned once and shared (ReusedExchange), so
    // the heavy event table is still scanned once per step. Caching here
    // (the earlier shape) left per-stage frames pinned in executor
    // storage after return, leaking across a long-lived session.
    val first = e.filter(col("__type") === steps.head)
      .groupBy(col(keyCol)).agg(min(col("__ts")).as("t1"))
    val frames = steps.zipWithIndex.tail.scanLeft(first) {
      case (prev, (step, i)) =>
        e.filter(col("__type") === step)
          .join(prev.select(col(keyCol), col(s"t$i")), Seq(keyCol))
          .filter(col("__ts") >= col(s"t$i"))
          .groupBy(col(keyCol)).agg(min(col("__ts")).as(s"t${i + 1}"))
    }
    val joined = frames.tail.foldLeft(frames.head)((d, f) =>
      d.join(f, Seq(keyCol), "left"))
    val stage = (2 to steps.length).foldLeft(lit(1)) { (acc, i) =>
      when(col(s"t$i").isNotNull, i).otherwise(acc)
    }
    joined.withColumn("stage", stage)
  }
}
