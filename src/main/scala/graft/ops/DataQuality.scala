package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality audit (the Deequ/expectations shape): a
  * rule set over a table evaluates in ONE aggregation pass — every
  * rule is a pair of aggregate expressions (observed value, pass
  * predicate), so auditing a 100 TB table costs one scan with map-side
  * partial aggregation and a single 1-row reduce, no matter how many
  * rules run. Referential rules (orphan counts across tables) are
  * anti-join frames unioned onto the same (rule, value, ok) schema.
  *
  * Values are integers (micro-unit ratios or violation counts), so
  * audit outputs replay exactly in the oracle.
  */
object DataQuality {

  /** Evaluate rules (name, valueExpr, okExpr) — both aggregates — in
    * one pass. Returns (rule, value, ok) rows in rule order.
    */
  def audit(df: DataFrame, rules: Seq[(String, Column, Column)]): DataFrame = {
    require(rules.nonEmpty)
    val valCols = rules.zipWithIndex.map { case ((_, v, _), i) =>
      v.cast("long").as(s"__v$i") }
    val okCols = rules.zipWithIndex.map { case ((_, _, o), i) =>
      o.as(s"__o$i") }
    val all = valCols ++ okCols
    val one = df.agg(all.head, all.tail: _*)
    val entries = array(rules.zipWithIndex.map { case ((n, _, _), i) =>
      struct(lit(n).as("rule"), col(s"__v$i").as("value"),
        col(s"__o$i").as("ok")) }: _*)
    one.select(explode(entries).as("r"))
      .select(col("r.rule").as("rule"), col("r.value").as("value"),
        col("r.ok").as("ok"))
  }

  /** Completeness ratio in micro-units (1000000 = fully non-null). */
  def completenessMicro(c: Column): Column =
    call_function("div", count(c) * 1000000L, count(lit(1)))

  /** Count of rows violating lo <= c <= hi (nulls count as violations). */
  def boundViolations(c: Column, lo: Column, hi: Column): Column =
    count(lit(1)) - count(when(c >= lo && c <= hi, 1))

  /** Count of duplicate rows under the given key. */
  def dupCount(keys: Column*): Column =
    count(lit(1)) - countDistinct(keys.head, keys.tail: _*)

  /** Referential-integrity frame: rows of `child` whose `key` has no
    * match in `parent.pkey` (null-safe: null keys are orphans), as one
    * (rule, value, ok) row. The anti-join broadcasts the parent's
    * distinct keys when small; value = orphan count, ok = zero.
    */
  def refIntegrity(rule: String, child: DataFrame, key: Column,
                   parent: DataFrame, pkey: Column): DataFrame = {
    val orphans = child.select(key.as("__k"))
      .join(parent.select(pkey.as("__k")).distinct(), Seq("__k"), "left_anti")
    orphans.agg(count(lit(1)).as("value"))
      .select(lit(rule).as("rule"), col("value").cast("long").as("value"),
        (col("value") === 0L).as("ok"))
  }
}
