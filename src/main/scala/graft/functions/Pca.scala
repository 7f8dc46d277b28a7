package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Principal component analysis over an embedding column — the
  * dimensionality-reduction member of the vector family (dataset
  * visualization, drift axes, whitening precursors).
  *
  * All-integer formulation so the DuckDB oracle replays it bit-exactly:
  * elements quantize by floor(x·2^14); the d×d scatter matrix
  * accumulates exact integer products; the leading eigenvector comes
  * from a FIXED number of integer power-iteration rounds (normalize by
  * max-|component| to 2^12 — no sqrt), so the result is deterministic
  * whether or not the iteration has converged; truncating integer
  * division is identical in Scala, Spark and DuckDB (all toward zero).
  *
  * Scale shape: ONE corpus scan builds the scatter — each row explodes
  * to the d(d+1)/2 upper-triangle pairs of its HOMOGENEOUS quantized
  * vector (a constant 1 appended, so Σq_i and n fall out of the same
  * aggregation as Σq_iq_j) and a partial-agg'd groupBy reduces them;
  * the shuffle carries only ~d²/2 rows per map partition regardless of
  * corpus size. Driver state is the d×d matrix (bounded by dimension,
  * never by data) and the 64-round loop is d² driver flops. The
  * projection pass is map-side with the eigenvector inlined as
  * literals. At d in the thousands the per-row explode (d²/2 pairs)
  * would move to a native outer-product accumulator expression; at the
  * corpus's d=64 the exploded pair stream stays whole-stage-codegen'd.
  *
  * Overflow budget (all BIGINT): |q| ≤ 2^15 for |x| < 2, so scatter
  * cells ≤ n·2^30 (n ≤ 2^33 keeps sums < 2^63), covariance cells
  * ≤ 2^30, matrix-vector terms ≤ 64·2^30·2^12 = 2^48, and the 2^12
  * renormalization multiply peaks at 2^60.
  */
object Pca {

  val QScale = 16384L  // 2^14 element quantization
  val VScale = 4096L   // 2^12 eigenvector normalization

  /** floor(x·2^14) quantization of an embedding element. */
  def quantize(x: Column): Column =
    floor(x.cast("double") * QScale.toDouble).cast("long")

  /** Upper-triangle scatter of the homogeneous quantized vectors:
    * rows (i, j, p = Σ_rows qh_i·qh_j) for 0 ≤ i ≤ j ≤ dim, where
    * qh = quantized embedding with a trailing constant 1 — so
    * p(i, dim) = Σ q_i and p(dim, dim) = n ride the same single
    * aggregation (homogeneous-coordinate trick; no second scan).
    */
  def scatterUpper(df: DataFrame, embCol: String, dim: Int): DataFrame = {
    val qh = concat(transform(col(embCol), quantize(_)), array(lit(1L)))
    df.select(qh.as("qh"))
      .select(posexplode(col("qh")).as(Seq("i", "qi")), col("qh"))
      .select(col("i"), col("qi"), posexplode(col("qh")).as(Seq("j", "qj")))
      .filter(col("j") >= col("i"))
      .groupBy(col("i"), col("j"))
      .agg(sum(col("qi") * col("qj")).as("p"))
  }

  /** Leading eigenvector of the (integer-centered) covariance of the
    * quantized embeddings: `rounds` fixed power-iteration rounds on
    * C_ij = S_ij/n, where S is the mean-centered scatter rebuilt
    * exactly from raw moments (S_ij = P_ij − m_i·s_j − m_j·s_i +
    * n·m_i·m_j with truncated integer means m = s/n). Returns
    * (v, m, n): the sign-fixed eigenvector (first nonzero component
    * positive, components scaled to max |v_i| = 2^12), the integer
    * means, and the row count.
    */
  def leadingEigen(df: DataFrame, embCol: String, dim: Int,
                   rounds: Int): (Array[Long], Array[Long], Long) = {
    val upper = scatterUpper(df, embCol, dim).collect()
    val p = Array.ofDim[Long](dim + 1, dim + 1)
    upper.foreach { r =>
      val (i, j) = (r.getInt(0), r.getInt(1))
      p(i)(j) = r.getLong(2); p(j)(i) = r.getLong(2)
    }
    val n = p(dim)(dim)
    require(n > 0, "PCA over an empty frame")
    val s = Array.tabulate(dim)(i => p(i)(dim))
    val m = s.map(_ / n) // truncating integer mean, both engines
    val c = Array.tabulate(dim, dim) { (i, j) =>
      (p(i)(j) - m(i) * s(j) - m(j) * s(i) + n * m(i) * m(j)) / n
    }
    var v = Array.fill(dim)(VScale)
    for (_ <- 1 to rounds) {
      val w = Array.tabulate(dim)(i =>
        (0 until dim).map(j => c(i)(j) * v(j)).sum)
      val mx = w.map(math.abs).max
      if (mx != 0L) v = w.map(wi => wi * VScale / mx)
    }
    val lead = v.find(_ != 0L).getOrElse(1L)
    if (lead < 0L) v = v.map(-_)
    (v, m, n)
  }

  /** Per-row projection onto the leading principal component:
    * proj = Σ_i (q_i − m_i)·v_i — map-side, eigenvector and means
    * inlined as literals (the codebook-broadcast pattern).
    */
  def project(df: DataFrame, embCol: String, v: Array[Long],
              m: Array[Long]): Column =
    v.indices.map { d =>
      (quantize(element_at(col(embCol), d + 1)) - lit(m(d))) * lit(v(d))
    }.reduce(_ + _)
}
