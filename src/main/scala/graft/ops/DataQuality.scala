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

  /** Pearson chi-square independence test of a binary `groupCol` (A/B
    * variant) against each category of `catCol` — the experiment-
    * readout primitive: for every category, the 2×2 table of
    * (variant) × (this category vs rest) and its χ² statistic in
    * micro-units via the per-cell form Σ(O·10⁶ − E_micro)² / E_micro
    * with E_micro = rowMargin·colMargin·10⁶ DIV N. Every step is
    * integer with a FIXED evaluation order, replayed verbatim by the
    * oracle (DECIMAL(38,0) sums ≡ DuckDB HUGEINT: (O·10⁶)² ≤ 10³⁰ at
    * 10⁹ rows — no overflow, no floats, no libm CDF; the statistic is
    * the deliverable, thresholds are the caller's).
    *
    * Returns per category: (category, a, b, c, d, chi2_micro) where
    * a/b = group-0/1 hits, c/d = group-0/1 misses; chi2_micro is null
    * when a margin is empty (the test is undefined).
    *
    * Scale shape: ONE partial-agg'd groupBy(category, group) collapses
    * the corpus to 2·|categories| rows; margins and N ride a window
    * over that tiny frame. Nothing else shuffles.
    */
  def chiSquareAB(df: DataFrame, groupCol: Column, catCol: Column): DataFrame = {
    val cnt = df.select(catCol.as("cat"),
        when(groupCol, 1L).otherwise(0L).as("g"))
      .groupBy(col("cat"), col("g")).agg(count(lit(1)).as("n"))
    // 2x2 per category: hits from this category's rows, misses from
    // the GLOBAL group totals (a 1-row frame — a per-category window
    // would lose a group the category never saw)
    val totals = cnt.agg(
      sum(when(col("g") === 0L, col("n")).otherwise(0L)).as("t0"),
      sum(when(col("g") === 1L, col("n")).otherwise(0L)).as("t1"))
    val byCat = cnt
      .groupBy(col("cat"))
      .agg(sum(when(col("g") === 0L, col("n")).otherwise(0L)).as("a"),
        sum(when(col("g") === 1L, col("n")).otherwise(0L)).as("b"))
      .crossJoin(broadcast(totals))
      .select(col("cat"), col("a"), col("b"),
        (col("t0") - col("a")).as("c"),
        (col("t1") - col("b")).as("d"))
    // per-cell chi-square: margins hits = a+b, misses = c+d,
    // group0 = a+c, group1 = b+d; E(cell) = rowM*colM*1e6 DIV N.
    // Fixed evaluation order, DECIMAL(38,0) intermediates.
    def cell(o: String, e: String) =
      s"(CAST($o AS DECIMAL(38,0)) * 1000000 - $e) * " +
        s"(CAST($o AS DECIMAL(38,0)) * 1000000 - $e) DIV nullif($e, 0)"
    byCat
      .withColumn("nn", expr("CAST(a AS DECIMAL(38,0)) + b + c + d"))
      .withColumn("ea", expr(
        "CAST(a+c AS DECIMAL(38,0)) * (a+b) * 1000000 DIV nn"))
      .withColumn("eb", expr(
        "CAST(b+d AS DECIMAL(38,0)) * (a+b) * 1000000 DIV nn"))
      .withColumn("ec", expr(
        "CAST(a+c AS DECIMAL(38,0)) * (c+d) * 1000000 DIV nn"))
      .withColumn("ed", expr(
        "CAST(b+d AS DECIMAL(38,0)) * (c+d) * 1000000 DIV nn"))
      .selectExpr("cat", "a", "b", "c", "d",
        s"""CAST(${cell("a", "ea")} + ${cell("b", "eb")}
           | + ${cell("c", "ec")} + ${cell("d", "ed")}
           | AS BIGINT) AS chi2_micro""".stripMargin)
  }

  /** Benford first-significant-digit audit (Benford 1938; Nigrini's
    * fraud-screen form): the observed first-digit distribution of a
    * positive measure vs the Benford expectation P(d) = log10(1+1/d).
    * First digits come from the integer micro quantization's decimal
    * string (integer-to-string is exact in any engine — never float
    * formatting); the expectation is integer too:
    * (log2q16(d+1) − log2q16(d))·10⁶ DIV log2q16(10), the same
    * portable Q16 log as the BM25 idf, so both engines derive the
    * SAME nine constants from the same recursion rather than trusting
    * a libm log10. Returns per digit (digit, n, observed_ppm,
    * expected_ppm, dev_ppm). Rows with non-positive micro value are
    * excluded (no first significant digit).
    *
    * Scale shape: one partial-agg'd groupBy(digit) → 9 rows; the Q16
    * logs run on the 9-row frame.
    */
  def benfordAudit(df: DataFrame, vMicroCol: Column): DataFrame = {
    val digits = df.select(vMicroCol.as("v")).filter(col("v") > 0L)
      .select(substring(col("v").cast("string"), 1, 1).cast("long")
        .as("digit"))
      .groupBy(col("digit")).agg(count(lit(1)).as("n"))
    val wAll = org.apache.spark.sql.expressions.Window.partitionBy(lit(1))
    digits
      .withColumn("total", sum(col("n")).over(wAll))
      .withColumn("observed_ppm",
        call_function("div", col("n") * 1000000L, col("total")))
      .withColumn("expected_ppm", call_function("div",
        (graft.functions.Portable.log2q16(col("digit") + 1L)
          - graft.functions.Portable.log2q16(col("digit"))) * 1000000L,
        graft.functions.Portable.log2q16(lit(10L))))
      .select(col("digit"), col("n"), col("observed_ppm"),
        col("expected_ppm"),
        (col("observed_ppm") - col("expected_ppm")).as("dev_ppm"))
  }
}
