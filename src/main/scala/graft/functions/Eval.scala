package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Model-evaluation statistics over scored corpora — the measurement
  * side of the curation loop (train → score → MEASURE → re-weight).
  */
object Eval {

  /** Exact tie-aware ROC-AUC (the Mann-Whitney U statistic) in pure
    * integer arithmetic: with per-distinct-score positive/negative
    * counts, U₂ = Σ_s pos_s·(2·negBelow(s) + neg_s) counts each
    * (pos, neg) pair twice for a win and once for a tie, so
    * AUC = U₂ / (2·nPos·nNeg) exactly — no trapezoids, no float
    * accumulation. Returns ONE row (n_pos, n_neg, u2, auc_ppm);
    * auc_ppm = U₂·500000 DIV (nPos·nNeg) stays inside int64 up to
    * ~4·10⁶ rows per class (beyond that, widen to per-bucket partial
    * ratios before this single-row step).
    *
    * Scale shape — no global sort, no single-partition window over row
    * counts: (1) one groupBy(s) collapses rows to distinct scores with
    * map-side partials; (2) scores range-bucket by value into
    * `nBuckets` coarse ranges; per-bucket negative totals (nBuckets
    * rows) take the ONE intentionally-serial prefix-sum window and
    * broadcast back as each bucket's base offset — the same two-phase
    * scan as [[Packing.packConcatSplit]]; (3) the within-bucket
    * cumulative window partitions BY BUCKET, so it parallelizes and no
    * task ever windows more than ~|distinct scores|/nBuckets rows.
    *
    * `labelCol` must be a boolean Column (true = positive).
    */
  def rocAuc(df: DataFrame, scoreCol: Column, labelCol: Column,
             nBuckets: Int = 32): DataFrame = {
    require(nBuckets > 0)
    val base = df.select(scoreCol.cast("long").as("s"),
      when(labelCol, 1L).otherwise(0L).as("y"))
    val g = base.groupBy(col("s")).agg(sum(col("y")).as("pos"),
      (count(lit(1)) - sum(col("y"))).as("neg"))
    val mm = g.agg(min(col("s")).as("lo"), max(col("s")).as("hi"))
    val gb = g.crossJoin(broadcast(mm))
      .withColumn("bucket",
        expr(s"(s - lo) DIV ((hi - lo) DIV $nBuckets + 1)"))
      .drop("lo", "hi")
    val wB = Window.orderBy(col("bucket").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val bucketBase = gb.groupBy(col("bucket")).agg(sum(col("neg")).as("bneg"))
      .withColumn("base_neg", coalesce(sum(col("bneg")).over(wB), lit(0L)))
      .select(col("bucket"), col("base_neg"))
    val wS = Window.partitionBy(col("bucket")).orderBy(col("s").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val cum = gb.join(broadcast(bucketBase), "bucket")
      .withColumn("cum_neg",
        col("base_neg") + coalesce(sum(col("neg")).over(wS), lit(0L)))
    cum.agg(sum(col("pos")).as("n_pos"), sum(col("neg")).as("n_neg"),
        sum(col("pos") * (lit(2L) * col("cum_neg") + col("neg"))).as("u2"))
      .select(col("n_pos"), col("n_neg"), col("u2"),
        when(col("n_pos") > 0L && col("n_neg") > 0L,
          expr("u2 * 500000 DIV (n_pos * n_neg)")).as("auc_ppm"))
  }
}
