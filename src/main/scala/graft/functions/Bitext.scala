package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Margin-based bitext mining (Artetxe & Schwenk 2019, "Margin-based
  * parallel corpus mining with multilingual sentence embeddings"): a
  * source and a target embedding collection are matched by RATIO-FREE
  * margin scoring — a candidate pair survives only when its similarity
  * stands out against the average of each endpoint's nearest-neighbor
  * similarities (absolute cosine alone over-pairs hub sentences; the
  * margin subtracts each vector's local similarity level). The published
  * pipeline runs the k-NN step on an approximate index; here the
  * candidate generator is the same random-hyperplane LSH bucketing the
  * embedding-dedup family uses (`Similarity.lshBucket`, native codegen'd
  * expr), so the mining never enumerates |A|x|B| pairs.
  *
  * Determinism/portability: cosines come from the pinned-fold
  * [[Similarity.cosine]] and are floor-quantized to integer micro-units
  * immediately — every downstream sum, mean and comparison is exact
  * integer arithmetic that the DuckDB oracle replays bit-for-bit
  * (truncating DIV on both engines). Ties rank by id.
  *
  * Scale shape: one map-side bucket assignment, a bucket equi-join with
  * the standard over-cap drop ([[SkewCap]] — near-duplicate hub buckets
  * would otherwise pair quadratically), then windows/groupBys
  * partitioned by endpoint over the CANDIDATE frame (bounded by
  * bucket-cap x corpus, linear in practice). Nothing broadcasts that
  * grows with the corpus.
  */
object Bitext {

  /** LSH plane count derived from the corpus size: the smallest p with
    * targetBucketSize · 2^p ≥ N, clamped to [4, 24] — i.e. enough
    * hyperplanes that the EXPECTED bucket holds ~targetBucketSize
    * vectors no matter how large the corpus grows. A fixed plane count
    * saturates: at 100× the data, 64 fixed buckets grew candidates only
    * 3.8× while the cap silently discarded a growing fraction of true
    * pairs (recall loss, measured round 10). Pure integer arithmetic —
    * the oracle replays it exactly (`QueriesEmb.autoPlanesSql`).
    * Example widths: 500 → 16 buckets (p=4), 2 000 → 64 (p=6),
    * 200 000 → 8 192 (p=13).
    */
  def autoPlanes(n: Long, targetBucketSize: Long = 32L): Int = {
    require(n >= 1 && targetBucketSize >= 1)
    var p = 0
    while (p < 24 && (targetBucketSize << p) < n) p += 1
    math.max(4, p)
  }

  /** Mine mutual-best margin pairs between the even-id half (source
    * side) and the odd-id half (target side) of `emb`.
    *
    * Per candidate pair (x, y) sharing an LSH bucket:
    *   margin_micro = cos_micro(x,y)
    *     − (Σ top-k fwd cos + Σ top-k bwd cos) DIV (k_fwd + k_bwd)
    * i.e. the "distance" margin form with both neighborhoods pooled into
    * one truncating integer mean. A pair is emitted when each endpoint
    * is the other's best margin match and the margin clears
    * `minMarginMicro`.
    *
    * `nPlanes` defaults to 0 = SELF-SCALING: [[autoPlanes]] of the
    * corpus count (one count job). Pass an explicit value only for
    * pinned test shapes; [[saturationStats]] makes any resulting recall
    * loss visible.
    */
  def minePairs(emb: DataFrame, idCol: String, embCol: String,
                nPlanes: Int = 0, dim: Int = 64, k: Int = 4,
                maxBucketSize: Long = 100L,
                minMarginMicro: Long = 0L,
                targetBucketSize: Long = 32L): DataFrame = {
    require(k >= 1)
    val np = if (nPlanes > 0) nPlanes
             else autoPlanes(emb.count(), targetBucketSize)
    val b0 = emb.select(col(idCol).cast("long").as("id"),
      col(embCol).as("e"),
      Similarity.lshBucket(col(embCol), np, dim).as("bucket"))
    val b = SkewCap.dropOverCap(b0, col("bucket"), maxBucketSize)
    val srcs = b.filter(pmod(col("id"), lit(2L)) === 0)
      .select(col("id").as("src_id"), col("e").as("ea"), col("bucket"))
    val tgts = b.filter(pmod(col("id"), lit(2L)) === 1)
      .select(col("id").as("tgt_id"), col("e").as("eb"), col("bucket"))
    val cand = srcs.join(tgts, "bucket")
      .select(col("src_id"), col("tgt_id"),
        floor(Similarity.cosine(col("ea"), col("eb")) * lit(1000000.0))
          .cast("long").as("cos_micro"))
    val wf = Window.partitionBy(col("src_id"))
      .orderBy(col("cos_micro").desc, col("tgt_id").asc)
    val wb = Window.partitionBy(col("tgt_id"))
      .orderBy(col("cos_micro").desc, col("src_id").asc)
    val ranked = cand
      .withColumn("rf", row_number().over(wf))
      .withColumn("rb", row_number().over(wb))
    // neighborhood level per endpoint: sum + count of its top-k cosines
    // (count < k at sparse buckets — the mean divides by what exists)
    val fwd = ranked.filter(col("rf") <= k).groupBy(col("src_id"))
      .agg(sum(col("cos_micro")).as("sf"), count(lit(1)).as("kf"))
    val bwd = ranked.filter(col("rb") <= k).groupBy(col("tgt_id"))
      .agg(sum(col("cos_micro")).as("sb"), count(lit(1)).as("kb"))
    val scored = ranked
      .join(fwd, "src_id").join(bwd, "tgt_id")
      .withColumn("margin_micro",
        col("cos_micro") - expr("(sf + sb) DIV (kf + kb)"))
    val wmf = Window.partitionBy(col("src_id"))
      .orderBy(col("margin_micro").desc, col("tgt_id").asc)
    val wmb = Window.partitionBy(col("tgt_id"))
      .orderBy(col("margin_micro").desc, col("src_id").asc)
    scored
      .withColumn("mf", row_number().over(wmf))
      .withColumn("mb", row_number().over(wmb))
      .filter(col("mf") === 1 && col("mb") === 1
        && col("margin_micro") >= minMarginMicro)
      .select(col("src_id"), col("tgt_id"), col("cos_micro"),
        col("margin_micro"))
  }

  /** The saturation metric for [[minePairs]]' bucket geometry — the
    * 1-row side output that makes recall loss VISIBLE instead of
    * silent: how many buckets hit the skew cap, how many vectors the
    * cap dropped, and the candidate volume the surviving buckets
    * generate. A healthy run has `buckets_at_cap` ≈ 0; a saturated one
    * (fixed planes on a 100× corpus) shows the dropped mass directly.
    * One map-side bucket assignment + one partial-agg'd groupBy over
    * bucket counts (bucket-scale, never corpus-scale state).
    *
    * `nPlanes = 0` derives the width via [[autoPlanes]] exactly as
    * [[minePairs]] does, so the stats describe the same geometry.
    */
  def saturationStats(emb: DataFrame, idCol: String, embCol: String,
                      nPlanes: Int = 0, dim: Int = 64,
                      maxBucketSize: Long = 100L,
                      targetBucketSize: Long = 32L): DataFrame = {
    val np = if (nPlanes > 0) nPlanes
             else autoPlanes(emb.count(), targetBucketSize)
    emb.select(Similarity.lshBucket(col(embCol), np, dim).as("bucket"))
      .groupBy(col("bucket")).agg(count(lit(1)).as("c"))
      .agg(lit(np).as("n_planes"),
        count(lit(1)).as("total_buckets"),
        sum(when(col("c") > maxBucketSize, 1L).otherwise(0L))
          .as("buckets_at_cap"),
        sum(when(col("c") > maxBucketSize, col("c")).otherwise(0L))
          .as("rows_dropped"),
        sum(when(col("c") <= maxBucketSize,
          col("c") * col("c")).otherwise(0L)).as("candidate_volume"))
  }

}

/** Embedding-collection audits (see also [[Similarity]] for search and
  * [[Pca]] for structure).
  */
object EmbAudit {

  /** Per-label centroid outliers — the embedding-quality audit that
    * catches mislabeled / off-topic members of a labeled collection
    * (cluster purity check; the embedding-space analog of the
    * quality-classifier audit). Components floor-quantize to Q14
    * integers (the PCA convention), the centroid is the truncating
    * integer mean per dimension, and each member scores the SIGNED
    * SQUARE of its cosine to its label's centroid in ppm —
    * sign(dot)·dot²·10⁶ DIV (‖v‖²·‖c‖²) — the sqrt-free monotone form
    * (a low score = far from the label's center). Bottom `k` per label
    * emitted with rank.
    *
    * Scale shape: one posexplode (×dim rows) into a (label, dim)
    * partial-agg'd groupBy builds the centroid table (|labels|·dim
    * rows — broadcastable at any corpus size), then the member scores
    * ride a broadcast join + one groupBy(vec). Integer end to end.
    */
  def centroidOutliers(emb: DataFrame, idCol: String, embCol: String,
                       labelCol: String, k: Int = 5): DataFrame = {
    require(k >= 1)
    val q = emb.select(col(idCol).cast("long").as("id"),
      col(labelCol).cast("long").as("label"),
      expr(s"transform($embCol, " +
        "x -> CAST(floor(CAST(x AS DOUBLE) * 16384.0) AS BIGINT))").as("q"))
    val ex = q.select(col("id"), col("label"),
      posexplode(col("q")).as(Seq("d", "v")))
    val cent = ex.groupBy(col("label"), col("d"))
      .agg(sum(col("v")).as("s"), count(lit(1)).as("n"))
      .select(col("label"), col("d"), expr("s DIV n").as("m"))
    val scored = ex.join(broadcast(cent), Seq("label", "d"))
      .groupBy(col("id"), col("label"))
      .agg(sum(col("v") * col("m")).as("dot"),
        sum(col("v") * col("v")).as("vv"),
        sum(col("m") * col("m")).as("cc"))
      .select(col("id"), col("label"),
        expr("""CAST(CASE WHEN dot < 0 THEN
                  -((CAST(dot AS DECIMAL(38,0)) * dot * 1000000)
                    DIV nullif(CAST(vv AS DECIMAL(38,0)) * cc, 0))
                ELSE
                  (CAST(dot AS DECIMAL(38,0)) * dot * 1000000)
                    DIV nullif(CAST(vv AS DECIMAL(38,0)) * cc, 0)
                END AS BIGINT)""").as("cos2_signed_ppm"))
    // NULLS LAST explicitly: the score is NULL when vv*cc = 0 (all-zero
    // quantized vector or zero centroid). Spark's default asc puts NULLs
    // FIRST, DuckDB's puts them LAST — a zero-norm member would otherwise
    // rank 1 here and rank last in the oracle. Pin the portable order.
    val w = Window.partitionBy(col("label"))
      .orderBy(col("cos2_signed_ppm").asc_nulls_last, col("id").asc)
    scored.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("label"), col("id").as("vec_id"),
        col("cos2_signed_ppm"), col("rnk"))
  }

  /** Truncation-fidelity audit (the Matryoshka question, Kusupati et
    * al. 2022: how much of each vector's direction survives keeping
    * only the leading `w` dimensions?). For a vector x and width w,
    * cos²(x, truncate_w(x)) = Σ_{i<w} x_i² / Σ x_i² exactly — no pair
    * enumeration, no second vector: the audit is per-row integer
    * arithmetic on Q14-quantized components, then one groupBy over the
    * width list. Per width: n vectors scored, mean and min cos² in ppm
    * (zero-norm vectors report NULL per-row and are excluded — count
    * carries the denominator). The serving-dimension choice (can the
    * ANN index store 16 of 64 dims?) reads straight off this table.
    */
  def truncationAudit(emb: DataFrame, embCol: String,
                      widths: Seq[Int] = Seq(8, 16, 32)): DataFrame = {
    require(widths.nonEmpty && widths.forall(_ >= 1))
    val q = emb.select(expr(s"transform($embCol, " +
      "x -> CAST(floor(CAST(x AS DOUBLE) * 16384.0) AS BIGINT))").as("qv"))
    def ss(c: String): String = s"aggregate($c, 0L, (a, v) -> a + v * v)"
    val terms = widths.map { w =>
      struct(lit(w).as("width"),
        expr(s"1000000 * ${ss(s"slice(qv, 1, $w)")} DIV " +
          s"nullif(${ss("qv")}, 0)").as("ppm"))
    }
    q.select(explode(array(terms: _*)).as("t"))
      .select(col("t.width").as("width"), col("t.ppm").as("ppm"))
      .groupBy(col("width"))
      .agg(count(col("ppm")).as("n"),
        expr("sum(ppm) DIV greatest(count(ppm), 1)").as("mean_cos2_ppm"),
        min(col("ppm")).as("min_cos2_ppm"))
  }
}
