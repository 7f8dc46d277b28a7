package graft

import graft.functions.Similarity
import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

/** The four declared PQ-brute forms (sim_pq_topk/search/rerank/
  * rerank_search) are Θ(Q·N) by design; above QueriesEmb.DeclaredBruteSwap
  * (50k corpus rows) they transparently serve from an auto-geometry
  * IVF-PQ index instead of being hand-excluded from scaled sweeps.
  * This spec pins the swap: geometry decides, the output schema is
  * stable across it, and the served answers are the IVF-PQ twin's.
  */
class BruteSwapSpec extends SparkSpec with Matchers {
  import spark.implicits._

  private lazy val bigDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_bruteswap_").toString
    // 50_100 synthetic vectors (just over the bound), deterministic
    val dim = 64
    spark.range(50100).select($"id".as("vec_id"),
      transform(sequence(lit(0), lit(dim - 1)),
        d => sin($"id" * (d + lit(1)) * 0.37)).as("embedding"))
      .withColumn("embedding", $"embedding".cast("array<float>"))
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    dir
  }

  /** An INDEPENDENTLY built auto-geometry IVF-PQ index over the same
    * corpus, in its own temp dir: training is deterministic, so the
    * served answers must equal a direct search/rerank of this index
    * row for row — the content check that catches any wiring drift in
    * ivfPqServe (wrong rename, stale index dir, parameter skew).
    */
  private lazy val refIx: String = {
    val ix = java.nio.file.Files
      .createTempDirectory("graft_bruteswap_refix_").toString
    val emb = spark.read.parquet(s"$bigDir/embeddings.parquet")
    Similarity.writeIvfPqIndex(emb, "vec_id", "embedding", ix,
      nCoarse = 0, coarseIters = 2, m = 8, subDim = 8, nCentroids = 8,
      pqIters = 2, dim = 64)
    ix
  }

  /** Rows as comparable tuples; scores via doubleToLongBits so the
    * all-zero vector's NaN cosine (vec_id 0: sin(0)=0 every dim)
    * compares equal instead of failing Set equality on NaN != NaN.
    */
  private def rows4(df: org.apache.spark.sql.DataFrame, simCol: String) =
    df.collect().map(r => (r.getLong(r.fieldIndex("query_id")),
      r.getLong(r.fieldIndex("match_id")), r.getInt(r.fieldIndex("rank")),
      java.lang.Double.doubleToLongBits(r.getDouble(r.fieldIndex(simCol)))))
      .toSet

  test("above the bound: declared sim_pq_topk serves from the IVF-PQ index, schema stable") {
    val out = SparkEntry.queries("sim_pq_topk")(spark, bigDir)
    out.columns.toSeq shouldBe Seq("query_id", "match_id", "rank", "sim_pq")
    val emb = spark.read.parquet(s"$bigDir/embeddings.parquet")
    val q = emb.filter($"vec_id" % 50 === 0)
    val n = emb.count()
    n should be > 50000L
    // derived geometry at this width: 128 lists (pow2floor(sqrt(50100)) = 128)
    Similarity.autoCoarseLists(n) shouldBe 128
    out.count() shouldBe q.count() * 10
    // content parity: the served answers ARE the auto-geometry IVF-PQ
    // search's — row for row against an independently built index
    val direct = Similarity.searchIvfPqIndex(spark, refIx, q,
      "vec_id", "embedding", k = 10, nProbe = 2)
    rows4(out, "sim_pq") shouldBe rows4(direct, "sim_ivfpq")
  }

  test("rerank form swaps too and keeps (query_id, match_id, rank, sim)") {
    val out = SparkEntry.queries("sim_pq_rerank")(spark, bigDir)
    out.columns.toSeq shouldBe Seq("query_id", "match_id", "rank", "sim")
    val emb = spark.read.parquet(s"$bigDir/embeddings.parquet")
    val q = emb.filter($"vec_id" % 50 === 0)
    out.count() shouldBe q.count() * 10
    // content parity vs a direct rerank of the independent index
    val direct = Similarity.rerankIvfPqIndex(spark, refIx, emb, q,
      "vec_id", "embedding", k = 10, candK = 50, nProbe = 2)
    rows4(out, "sim") shouldBe rows4(direct, "sim")
  }

  test("oracleSqlFor swaps exactly the five geometry-swapping oracles above the bound") {
    val base = SparkEntry.oracleSql
    val small = SparkEntry.oracleSqlFor(spark, "/root/testdata/sf0.001")
    small shouldBe base
    val swapped = SparkEntry.oracleSqlFor(spark, bigDir)
    swapped.keySet shouldBe base.keySet
    val five = Set("sim_pq_topk", "sim_pq_search", "sim_pq_rerank",
      "sim_pq_rerank_search", "sim_ivfpq_rerank")
    five.foreach { n => swapped(n) should not be base(n) }
    (base.keySet -- five).foreach { n => swapped(n) shouldBe base(n) }
  }

  test("below the bound: the brute path still runs (oracle anchor unchanged)") {
    // sf0.001 (500 vectors) stays on the exact-PQ path — pinned by the
    // oracle gate (compare.py hash-match); here just assert it executes
    // the brute form's full result shape
    val out = SparkEntry.queries("sim_pq_topk")(spark, "/root/testdata/sf0.001")
    out.columns.toSeq shouldBe Seq("query_id", "match_id", "rank", "sim_pq")
    out.count() should be > 0L
  }
}
