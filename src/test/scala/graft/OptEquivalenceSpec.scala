package graft

import graft.functions.{Similarity, Train}
import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

/** Round-15 optimization equivalence pins: every rewrite that changed an
  * operator's internals for job-count/pass-count reasons must produce
  * BIT-IDENTICAL results to the shape it replaced. Each test here keeps
  * the replaced algorithm alive as an inline reference implementation —
  * if the optimized path ever drifts, the diff is visible here first
  * (the oracle gate would also catch it, but one query later and with
  * less context).
  */
class OptEquivalenceSpec extends SparkSpec with Matchers {

  private def emb = spark.read
    .parquet("/root/testdata/sf0.01/embeddings.parquet")

  test("batched PQ codebook training == per-subspace sequential training") {
    val (m, subDim, k, iters) = (8, 8, 8, 2)
    // reference: the pre-r15 shape — m independent trainIvfCentroids
    // calls, one per subspace slice (3 driver jobs each)
    val reference = (0 until m).map { s =>
      Similarity.trainIvfCentroids(
        emb.select(col("vec_id"),
          slice(col("embedding"), s * subDim + 1, subDim).as("__sub")),
        "vec_id", "__sub", k, iters, subDim)
    }.toArray
    // optimized: one seeds job + one aggregation job per iteration for
    // ALL subspaces
    val batched = Similarity.trainPqCodebooks(
      emb.select(col("vec_id"), col("embedding")),
      "vec_id", "embedding", m, subDim, k, iters)
    batched.length shouldBe reference.length
    batched.zip(reference).zipWithIndex.foreach { case ((b, r), s) =>
      assert(b.toSeq == r.toSeq, s"subspace $s codebook drifted")
    }
  }

  test("pocket perceptron fused grad+acc pass == sequential two-pass loop") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    // reference: the pre-r15 loop — per round one gradient aggregate
    // over w_{r-1} THEN one accuracy aggregate over w_r (2 jobs/round)
    val (minTok, maxTok, minAlphaQ10, rounds, lrDen) = (20L, 70L, 700L, 32, 8L)
    val feats = Train.FeatureExprs.zipWithIndex
      .map { case (e, j) => s"CAST($e AS BIGINT) AS x$j" }
    val feat = docs
      .select(
        graft.functions.TextAnalysis.wsTokenCount(col("text"))
          .cast("long").as("nt"),
        org.apache.spark.sql.functions.length(col("text"))
          .cast("long").as("nc"),
        org.apache.spark.sql.functions.length(
          regexp_replace(col("text"), "[^A-Za-z]", ""))
          .cast("long").as("na"))
      .selectExpr(feats :+
        (s"CASE WHEN nt >= $minTok AND nt <= $maxTok AND " +
          s"na * 1024 DIV greatest(nc, 1) >= $minAlphaQ10 " +
          "THEN CAST(1 AS BIGINT) ELSE CAST(-1 AS BIGINT) END AS y"): _*)
      .localCheckpoint()
    val n = feat.count()
    def zExpr(w: Array[Long]): String =
      w.zipWithIndex.map { case (wj, j) => s"CAST($wj AS BIGINT) * x$j" }
        .mkString(" + ")
    def signMatches(w: Array[Long]): String =
      s"(CASE WHEN ${zExpr(w)} >= 0 THEN 1 ELSE -1 END) = y"
    def accOf(w: Array[Long]): Long = feat
      .selectExpr(s"coalesce(sum(CASE WHEN ${signMatches(w)} THEN 1 " +
        "ELSE 0 END), 0) AS ok")
      .first().getLong(0)
    val w = Array.fill(5)(0L)
    var bestAcc = accOf(w)
    var bestW = w.clone()
    var bestRound = 0
    for (r <- 1 to rounds) {
      val grads = feat.selectExpr((0 until 5).map(j =>
        s"coalesce(sum(CASE WHEN NOT (${signMatches(w)}) THEN y * x$j " +
          s"ELSE CAST(0 AS BIGINT) END), 0) AS g$j"): _*).first()
      (0 until 5).foreach(j => w(j) += grads.getLong(j) / lrDen)
      val a = accOf(w)
      if (a > bestAcc) { bestAcc = a; bestW = w.clone(); bestRound = r }
    }
    val expected = Seq(bestRound.toLong, n, bestAcc,
      bestW(0), bestW(1), bestW(2), bestW(3), bestW(4))
    val got = Train.pocketPerceptron(docs, "doc_id", "text")
      .collect().head.toSeq
    got shouldBe expected
  }
}
