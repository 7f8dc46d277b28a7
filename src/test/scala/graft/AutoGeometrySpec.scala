package graft

import graft.functions.{Bitext, Similarity}
import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

/** Self-scaling ANN/LSH index geometry (round 11): the derived widths,
  * their exact values at the corpus sizes the oracles replay, and the
  * corpus-count guards that stop the O(Q·N) brute twins from running
  * at cluster scale by accident.
  */
class AutoGeometrySpec extends SparkSpec with Matchers {
  import spark.implicits._

  test("autoCoarseLists: pow2floor(floor(sqrt(N))), floored at 8") {
    Similarity.autoCoarseLists(1L) shouldBe 8
    Similarity.autoCoarseLists(63L) shouldBe 8
    Similarity.autoCoarseLists(256L) shouldBe 16
    Similarity.autoCoarseLists(500L) shouldBe 16 // sf0.001 / sf0.01
    Similarity.autoCoarseLists(2000L) shouldBe 32 // sf0.1
    Similarity.autoCoarseLists(20000L) shouldBe 128 // sf1 scale dir
    Similarity.autoCoarseLists(200000L) shouldBe 256 // sf10 (century)
    Similarity.autoCoarseLists(1000000000L) shouldBe 16384
    // exact-square boundary: sqrt is correctly rounded in IEEE double
    Similarity.autoCoarseLists(1024L * 1024L) shouldBe 1024
    Similarity.autoCoarseLists(1024L * 1024L - 1L) shouldBe 512
    // the one-shard ceiling: the trainer's plan-literal/driver-collect
    // design holds to 65536 lists; beyond sqrt(N) > 65536 the
    // documented architecture is sharded indexes, not a wider trainer
    Similarity.autoCoarseLists(1000000000000L) shouldBe 65536
    Similarity.autoCoarseLists(Long.MaxValue / 4) shouldBe 65536
  }

  test("autoShards: one level up from autoCoarseLists, same discipline") {
    // dim 64: maxLists 65536, a shard is full at 65536^2 ~ 4.295e9
    val full64 = 65536L * 65536L
    Similarity.autoShards(1L) shouldBe 1
    Similarity.autoShards(200000L) shouldBe 1 // sf10: one shard suffices
    Similarity.autoShards(full64) shouldBe 1
    Similarity.autoShards(full64 + 1) shouldBe 2
    Similarity.autoShards(10000000000L) shouldBe 4 // 1e10 -> ceil 3 -> pow2 4
    Similarity.autoShards(100000000000L) shouldBe 32 // 1e11
    // wider embeddings shrink the per-shard plan-literal budget:
    // dim 1024 -> maxLists 4096, maxShardN ~ 1.67e7, so 1e9 vectors
    // already need 64 shards where dim-64 needed one
    Similarity.autoShards(1000000000L, dim = 1024) shouldBe 64
    // pow2 count: a future doubling moves each id to {old, old+n},
    // never an arbitrary re-deal
    for (n <- Seq(full64 + 1, full64 * 3, full64 * 5 + 17)) {
      val s = Similarity.autoShards(n)
      java.lang.Long.highestOneBit(s.toLong) shouldBe s.toLong
      // enough width that no shard re-crosses the per-shard ceiling
      (n + s - 1) / s should be <= full64
    }
  }

  test("sharded index: nShards=0 derives on write, search discovers width from layout") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val dir = java.nio.file.Files.createTempDirectory("graft_autoshard_").toString
    // at fixture scale autoShards derives 1 — the contract under test is
    // the derive-on-write + discover-on-serve loop, not the width itself
    Similarity.writeIvfPqIndexSharded(emb, "vec_id", "embedding", dir)
    val q = emb.filter($"vec_id" % 100 === 0)
    val auto = Similarity.searchIvfPqIndexSharded(spark, dir, 0, q,
      "vec_id", "embedding", 5)
    val explicit = Similarity.searchIvfPqIndexSharded(spark, dir, 1, q,
      "vec_id", "embedding", 5)
    auto.collect().map(_.toString).sorted shouldBe
      explicit.collect().map(_.toString).sorted
    auto.count() should be > 0L
    // occupancy audit green at the derived width: lists match the
    // auto-geometry rule (500 vecs -> 16) and no seed-collapse-style
    // degeneracy (the sf10 class of bug the health report exists for)
    val health = Similarity.indexHealthSharded(spark, dir, 1).collect()(0)
    val nLists = health.getLong(health.fieldIndex("n_lists"))
    val used = health.getLong(health.fieldIndex("lists_used"))
    nLists shouldBe Similarity.autoCoarseLists(emb.count()).toLong
    used should be > nLists / 2
  }

  test("derivation invariants hold across the N range (dense sweep)") {
    // pow2 result, floor 8, never more than sqrt(N) for N >= 64, and
    // monotone nondecreasing in N — the properties a sizing rule must
    // keep for "grow the corpus, never shrink the index" operations
    var prevC = 0
    var prevP = 0
    var n = 1L
    while (n < 3000000L) {
      val c = Similarity.autoCoarseLists(n)
      assert(java.lang.Integer.bitCount(c) == 1 && c >= 8)
      if (n >= 64) assert(c <= math.sqrt(n.toDouble) + 1e-9)
      assert(c >= prevC, s"autoCoarseLists not monotone at $n")
      prevC = c
      val p = graft.functions.Bitext.autoPlanes(n)
      assert(p >= 4 && p <= 24)
      // enough buckets for the target occupancy (or the hard clamp)
      assert(p == 24 || (32L << p) >= n)
      // never overshoots: one plane fewer would under-bucket (unless
      // the [4,24] clamp decided)
      assert(p == 4 || p == 24 || (32L << (p - 1)) < n)
      assert(p >= prevP, s"autoPlanes not monotone at $n")
      prevP = p
      n += 1 + n / 13 // dense at small N, geometric at large
    }
  }

  test("autoPlanes: smallest p with target*2^p >= N, clamped to [4, 24]") {
    Bitext.autoPlanes(1L) shouldBe 4
    Bitext.autoPlanes(500L) shouldBe 4 // 32*16 = 512 >= 500
    Bitext.autoPlanes(513L) shouldBe 5
    Bitext.autoPlanes(2000L) shouldBe 6 // sf0.1 -> 64 buckets
    Bitext.autoPlanes(200000L) shouldBe 13 // century -> 8192 buckets
    Bitext.autoPlanes(Long.MaxValue) shouldBe 24 // hard clamp
    Bitext.autoPlanes(100L, targetBucketSize = 1L) shouldBe 7
  }

  test("brute-force twins refuse a cluster-scale corpus loudly, naming " +
    "the persisted-index alternative") {
    // counting a range is instant; the guard must fire BEFORE any
    // scoring work, so no embedding data is ever needed
    val big = spark.range(0L, Similarity.MaxBruteCorpus + 1)
      .toDF("vec_id").withColumn("embedding", array(lit(1.0f)))
    val q = big.limit(1)
    val e = intercept[IllegalArgumentException] {
      Similarity.bruteForceTopK(big, q, "vec_id", "embedding", k = 5)
    }
    e.getMessage should include("searchIvfPqIndex")
    e.getMessage should include("bruteForceTopK")

    // the tightened bound fires for every guarded form
    val small = spark.range(0L, 100L)
      .toDF("vec_id").withColumn("embedding", array(lit(1.0f)))
    intercept[IllegalArgumentException] {
      Similarity.quantizedTopK(small, q, "vec_id", "embedding", k = 2,
        maxCorpus = 10L)
    }.getMessage should include("quantizedTopK")
    intercept[IllegalArgumentException] {
      Similarity.binaryTopK(small, q, "vec_id", "embedding", k = 2,
        maxCorpus = 10L)
    }.getMessage should include("binaryTopK")
    intercept[IllegalArgumentException] {
      Similarity.binaryRerankTopK(small, q, "vec_id", "embedding", k = 2,
        maxCorpus = 10L)
    }.getMessage should include("binaryRerankTopK")
    intercept[IllegalArgumentException] {
      Similarity.pqTopK(small, q, "vec_id", "embedding", k = 2,
        maxCorpus = 10L)
    }.getMessage should include("searchPqIndex")

    // the train-in-query IVF-PQ form trains a full k-means per call —
    // same guard discipline, naming the train-once persisted path
    val eIvfPq = intercept[IllegalArgumentException] {
      Similarity.ivfPqTopK(small, q, "vec_id", "embedding", k = 2,
        maxCorpus = 10L)
    }
    eIvfPq.getMessage should include("ivfPqTopK")
    eIvfPq.getMessage should include("writeIvfPqIndex")
    eIvfPq.getMessage should include("searchIvfPqIndex")
  }

  test("maxCorpus = Long.MaxValue is an explicit opt-out: the guard " +
    "count is SKIPPED, not just allowed to pass") {
    // poison pill: ANY evaluation of this corpus raises — so if the
    // guard ran its eager count() the builder would throw here, and
    // the opt-out path stays fully lazy (build the plan, run nothing)
    val poisoned = spark.range(0L, 4L).toDF("vec_id")
      .withColumn("embedding", array(lit(1.0f)))
      .filter(raise_error(lit("guard must not count")).isNull)
    val q = spark.range(0L, 1L).toDF("vec_id")
      .withColumn("embedding", array(lit(1.0f)))
    noException should be thrownBy Similarity.bruteForceTopK(
      poisoned, q, "vec_id", "embedding", k = 2, maxCorpus = Long.MaxValue)
    // default bound on the same corpus DOES count — and hits the pill
    intercept[Exception] {
      Similarity.bruteForceTopK(poisoned, q, "vec_id", "embedding", k = 2)
    }.getMessage should include("guard must not count")
  }

  test("auto-width IVF-PQ index: derived geometry persists and serves " +
    "identically to the explicit width") {
    val dir = "/root/testdata/sf0.001"
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val queries = emb.filter(col("vec_id") % 100 === 0)
    val n = emb.count()
    val expected = Similarity.autoCoarseLists(n)
    expected shouldBe 16

    val ixAuto = java.nio.file.Files.createTempDirectory("graft_ivfpq_auto").toString
    Similarity.writeIvfPqIndex(emb, "vec_id", "embedding", ixAuto,
      nCoarse = 0, coarseIters = 1, m = 8, subDim = 8, nCentroids = 4,
      pqIters = 1, dim = 64)
    val ixExpl = java.nio.file.Files.createTempDirectory("graft_ivfpq_expl").toString
    Similarity.writeIvfPqIndex(emb, "vec_id", "embedding", ixExpl,
      nCoarse = expected, coarseIters = 1, m = 8, subDim = 8,
      nCentroids = 4, pqIters = 1, dim = 64)

    def res(ix: String) = Similarity
      .searchIvfPqIndex(spark, ix, queries, "vec_id", "embedding",
        k = 5, nProbe = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2),
        r.getDouble(3))).toSet
    res(ixAuto) shouldBe res(ixExpl)

    // the persisted coarse matrix actually has the derived width
    val meta = spark.read.parquet(s"$ixAuto/meta").collect()(0)
    val coarse = meta.getSeq[Double](meta.fieldIndex("coarse"))
    coarse.length shouldBe expected * 64
  }

  test("k-means seeding survives banded/sparse id spaces: a shard-offset " +
    "corpus still trains the full derived width (sf10 century-sweep find)") {
    val base = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    // MakeScale's id layout — copy c's ids shifted by c·10⁹, so the id
    // space is 4 narrow bands in a 3·10⁹-wide range. The old range-
    // stride seed rule picked positions ∝ (max-min)/k; in this layout
    // almost none exist, the seed set collapsed to ~2 rows, and every
    // "IVF" index silently served near-brute-force streams.
    val banded = (0 until 4).map(c =>
      base.select((col("vec_id") + lit(c.toLong * 1000000000L)).as("vec_id"),
        col("embedding"))).reduce(_ unionAll _)
    val n = banded.count()
    val expected = Similarity.autoCoarseLists(n)
    expected should be >= 32
    val ix = java.nio.file.Files.createTempDirectory("graft_ivfpq_band").toString
    Similarity.writeIvfPqIndex(banded, "vec_id", "embedding", ix,
      nCoarse = 0, coarseIters = 1, m = 8, subDim = 8, nCentroids = 4,
      pqIters = 1, dim = 64)
    // the persisted coarse matrix carries the FULL derived width (the
    // collapsed rule shipped 2·64 doubles here) ...
    val meta = spark.read.parquet(s"$ix/meta").collect()(0)
    meta.getSeq[Double](meta.fieldIndex("coarse")).length shouldBe expected * 64
    // ... and the lists are genuinely occupied (duplicate-vector seeds
    // lose every first-best tie, so a handful may sit empty — but a
    // collapsed trainer would show lists_used ≈ 2)
    val health = Similarity.indexHealth(spark, ix).collect()(0)
    health.getLong(health.fieldIndex("lists_used")) should
      be >= (expected / 2).toLong
  }

  test("sharded IVF-PQ: disjoint per-shard indexes at per-shard derived " +
    "widths; 1-shard degenerate form == the single index") {
    val dir = "/root/testdata/sf0.001"
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val queries = emb.filter(col("vec_id") % 100 === 0)

    val ix2 = java.nio.file.Files.createTempDirectory("graft_ivfpq_sh2").toString
    Similarity.writeIvfPqIndexSharded(emb, "vec_id", "embedding", ix2,
      nShards = 2, nCoarse = 0, coarseIters = 1, m = 8, subDim = 8,
      nCentroids = 4, pqIters = 1, dim = 64)
    // each shard holds exactly its id slice, and its coarse matrix has
    // the width derived from the SHARD's count, not the corpus's
    val n = emb.count()
    (0 until 2).foreach { sh =>
      val ids = spark.read.parquet(s"$ix2/shard=$sh/codes")
        .select("match_id").as[Long].collect()
      ids.foreach(id => (id % 2) shouldBe sh.toLong)
      val shardN = emb.filter(col("vec_id") % 2 === sh).count()
      val meta = spark.read.parquet(s"$ix2/shard=$sh/meta").collect()(0)
      meta.getSeq[Double](meta.fieldIndex("coarse")).length shouldBe
        Similarity.autoCoarseLists(shardN) * 64
      ids.length.toLong shouldBe shardN
    }
    shardedStructure(ix2, queries, n)

    // nShards = 1 is EXACTLY the single index under shard=0
    val ix1 = java.nio.file.Files.createTempDirectory("graft_ivfpq_sh1").toString
    Similarity.writeIvfPqIndexSharded(emb, "vec_id", "embedding", ix1,
      nShards = 1, nCoarse = 0, coarseIters = 1, m = 8, subDim = 8,
      nCentroids = 4, pqIters = 1, dim = 64)
    val sharded1 = Similarity.searchIvfPqIndexSharded(spark, ix1, 1,
      queries, "vec_id", "embedding", k = 5, nProbe = 2)
      .collect().map(_.toSeq).toSet
    val single = Similarity.searchIvfPqIndex(spark, s"$ix1/shard=0",
      queries, "vec_id", "embedding", k = 5, nProbe = 2)
      .collect().map(_.toSeq).toSet
    sharded1 shouldBe single
  }

  test("sharded IVF-PQ at 4 shards: concurrent build ≡ per-shard " +
    "sequential builds; fan-out search ≡ one global re-rank of the " +
    "per-shard streams; negative ids land in a shard (pmod)") {
    val dir = "/root/testdata/sf0.001"
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val queries = emb.filter(col("vec_id") % 100 === 0)
    val nShards = 4

    // concurrent build (the production path: one builder thread per
    // shard, jobs overlap on the shared scheduler)
    val ixP = java.nio.file.Files.createTempDirectory("graft_ivfpq_p4").toString
    Similarity.writeIvfPqIndexSharded(emb, "vec_id", "embedding", ixP,
      nShards = nShards, nCoarse = 0, coarseIters = 1, m = 8, subDim = 8,
      nCentroids = 4, pqIters = 1, dim = 64)
    // sequential twin: each shard built alone through the single-index
    // writer on the same pmod slice — byte-identical artifacts prove
    // the threaded build races nothing (training state is per-thread)
    val ixS = java.nio.file.Files.createTempDirectory("graft_ivfpq_s4").toString
    (0 until nShards).foreach { sh =>
      Similarity.writeIvfPqIndex(
        emb.filter(pmod(col("vec_id"), lit(nShards)) === sh),
        "vec_id", "embedding", s"$ixS/shard=$sh", nCoarse = 0,
        coarseIters = 1, m = 8, subDim = 8, nCentroids = 4, pqIters = 1,
        dim = 64)
    }
    (0 until nShards).foreach { sh =>
      def codes(ix: String) = spark.read.parquet(s"$ix/shard=$sh/codes")
        .collect().map(_.toSeq).sortBy(_.head.asInstanceOf[Long])
      codes(ixP) shouldBe codes(ixS)
      def meta(ix: String) = spark.read.parquet(s"$ix/shard=$sh/meta")
        .collect().map(_.toSeq)
      meta(ixP) shouldBe meta(ixS)
    }
    // disjoint coverage at 4 shards: every corpus id in EXACTLY one shard
    val perShardIds = (0 until nShards).map(sh =>
      spark.read.parquet(s"$ixP/shard=$sh/codes")
        .select("match_id").as[Long].collect().toSet)
    perShardIds.map(_.size).sum.toLong shouldBe emb.count()
    perShardIds.reduce(_ ++ _).size.toLong shouldBe emb.count()

    // fan-out search == collect every shard's probe stream through the
    // PUBLIC per-shard search (rank cut disabled by a huge k), then
    // rank ONCE globally — catches the classic sharding bug of cutting
    // top-k per shard before the merge
    val k = 5
    val fan = Similarity.searchIvfPqIndexSharded(spark, ixP, nShards,
      queries, "vec_id", "embedding", k = k, nProbe = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3)))
    val allCands = (0 until nShards).flatMap(sh =>
      Similarity.searchIvfPqIndex(spark, s"$ixP/shard=$sh", queries,
        "vec_id", "embedding", k = Int.MaxValue, nProbe = 2)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(3))))
    val expected = allCands.groupBy(_._1).toSeq.flatMap { case (q, cands) =>
      cands.sortBy(c => (-c._3, c._2)).take(k).zipWithIndex
        .map { case ((_, m, s), i) => (q, m, i + 1, s) }
    }
    fan.sortBy(r => (r._1, r._3)) shouldBe expected.sortBy(r => (r._1, r._3))

    // pmod, not %: negative ids must land in a shard, not silently
    // vanish from the "disjoint partition"
    val neg = (-20 until 20).map(i =>
      (i.toLong, Array.tabulate(64)(d => math.sin(i * 17.0 + d).toFloat)))
      .toDF("vec_id", "embedding")
    val ixN = java.nio.file.Files.createTempDirectory("graft_ivfpq_neg").toString
    Similarity.writeIvfPqIndexSharded(neg, "vec_id", "embedding", ixN,
      nShards = 4, nCoarse = 0, coarseIters = 1, m = 8, subDim = 8,
      nCentroids = 4, pqIters = 1, dim = 64)
    val covered = (0 until 4).flatMap(sh =>
      spark.read.parquet(s"$ixN/shard=$sh/codes")
        .select("match_id").as[Long].collect()).toSet
    covered shouldBe (-20 until 20).map(_.toLong).toSet
  }

  private def shardedStructure(ix: String,
                               queries: org.apache.spark.sql.DataFrame,
                               n: Long): Unit = {
    val res = Similarity.searchIvfPqIndexSharded(spark, ix, 2, queries,
      "vec_id", "embedding", k = 5, nProbe = 2).collect()
    val byQ = res.groupBy(_.getLong(0))
    byQ.size shouldBe queries.count()
    byQ.values.foreach { rows =>
      rows.length shouldBe 5 // full top-k served
      rows.map(_.getInt(2)).sorted shouldBe (1 to 5) // contiguous ranks
      // the merge is GLOBAL: sims nonincreasing in rank order
      val sims = rows.sortBy(_.getInt(2)).map(_.getDouble(3))
      sims.zip(sims.tail).foreach { case (a, b) => a should be >= b }
    }
    // candidates come from BOTH shards somewhere in the result set
    res.map(_.getLong(1) % 2).toSet shouldBe Set(0L, 1L)
  }
}
