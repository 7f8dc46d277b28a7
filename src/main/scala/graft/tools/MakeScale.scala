package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-trajectory data generator: replicate a testdata directory k×
  * with shifted keys, producing a larger scale factor with the SAME
  * per-copy statistical structure — so a per-query bench at the two
  * sizes measures how each plan's cost actually grows with data volume
  * (`sbt 'runMain graft.tools.MakeScale /root/testdata/sf0.1 /tmp/graft_sf0.3 3'`).
  *
  * Shape-preserving rules:
  *   - fact keys (orders/lineitem/events/docs/embeddings + their FKs)
  *     shift by copy·10^9, so joins stay 1:1 per copy and never cross
  *     copies; `nation`/`region` dimensions stay single-copy.
  *   - `documents.text` gets a per-copy suffix on EVERY token (copy 0
  *     unchanged): within-copy duplicate/near-dup structure is
  *     preserved exactly while no shingle matches across copies —
  *     without this, k identical corpora make every dedup pair query
  *     grow O(k²·n), measuring the mutation rather than the plan.
  *   - `embeddings.embedding` is circularly rotated by the copy index
  *     (norm- and within-copy-cosine-preserving; cross-copy cosines
  *     decorrelate) for the same reason.
  */
object MakeScale {

  private val Off = 1000000000L

  def main(args: Array[String]): Unit = {
    require(args.length == 3, "usage: MakeScale <srcDir> <dstDir> <k>")
    val (src, dst, k) = (args(0), args(1), args(2).toInt)
    require(k >= 1)
    val spark = graft.core.Sessions.local()
    try generate(spark, src, dst, k) finally spark.stop()
  }

  def generate(spark: SparkSession, src: String, dst: String, k: Int): Unit = {
    def rd(name: String): DataFrame = spark.read.parquet(s"$src/$name.parquet")
    /** Fact tables write MULTI-FILE: the crossJoin expansion inherits the
      * 1-file source's single partition, and a single ~100 MB parquet is
      * ONE input split — every downstream query whose heavy compute rides
      * the scan stage (per-row cosines, regex chains) then serializes on
      * one core at exactly the scale factor meant to measure parallelism
      * (found by the round-12 sf10 sweep: two >20-minute single-task
      * stages in a 32-core run). A real 100 TB table is thousands of
      * files; the scale fixture must look like one.
      */
    def wrFact(df: DataFrame, name: String): Unit =
      df.repartition(32).write.mode("overwrite").parquet(s"$dst/$name.parquet")
    // dimensions stay single-copy AND single-file: the multi-file rule
    // above is about fact-scan parallelism; 32 tiny files per 5-row
    // dimension just adds a shuffle and file-listing noise
    def wrDim(df: DataFrame, name: String): Unit =
      df.coalesce(1).write.mode("overwrite").parquet(s"$dst/$name.parquet")

    // dimensions: single copy
    wrDim(rd("region"), "region")
    wrDim(rd("nation"), "nation")

    /** k copies with the long key columns shifted by copy·Off — one scan
      * crossJoined with `range(k)` (a broadcast of k ids), NOT a k-way
      * union: at k=1000 a union re-plans and re-scans the source 1000×,
      * while this shape is a single map-side expansion.
      */
    def copies(df: DataFrame, keyCols: Seq[String])
              (mutate: DataFrame => DataFrame = identity): DataFrame = {
      val spark = df.sparkSession
      val expanded = df.crossJoin(
        broadcast(spark.range(k).toDF("__copy")))
      val shifted = keyCols.foldLeft(expanded) {
        (d, kc) => d.withColumn(kc, col(kc) + col("__copy") * lit(Off))
      }
      mutate(shifted).drop("__copy")
    }

    wrFact(copies(rd("customer"), Seq("c_custkey"))(), "customer")
    wrFact(copies(rd("supplier"), Seq("s_suppkey"))(), "supplier")
    wrFact(copies(rd("part"), Seq("p_partkey"))(), "part")
    wrFact(copies(rd("orders"), Seq("o_orderkey", "o_custkey"))(), "orders")
    wrFact(copies(rd("lineitem"), Seq("l_orderkey", "l_partkey", "l_suppkey"))(),
      "lineitem")
    wrFact(copies(rd("events"), Seq("event_id", "user_id"))(), "events")

    wrFact(copies(rd("documents"), Seq("doc_id")) { d =>
      d.withColumn("text", when(col("__copy") === 0, col("text"))
          .otherwise(concat_ws(" ", transform(split(col("text"), "\\s+"),
            w => concat(w, lit("_"), col("__copy").cast("string"))))))
        .withColumn("n_chars", length(col("text")))
    }, "documents")

    // per-copy deterministic ±1 sign pattern: norms and WITHIN-copy
    // cosines are exactly preserved (s_i·x_i · s_i·y_i = x_i·y_i) while
    // cross-copy dots decorrelate under the differing patterns. The
    // earlier circular rotation was identity once copy ≥ dim (64) — at
    // k=1000 that made 94% of copies exact duplicates of copy 0 and a
    // near-dup bench would measure the generator artifact, not the plan.
    wrFact(copies(rd("embeddings"), Seq("vec_id")) { d =>
      d.withColumn("embedding", when(col("__copy") === 0, col("embedding"))
        .otherwise(transform(col("embedding"), (x, i) =>
          // xxhash64 bit per (copy, element): a linear-arithmetic "hash"
          // mod 2 collapses to parity and gives only TWO patterns
          x * (lit(1.0f) - lit(2.0f) *
            pmod(xxhash64(col("__copy"), i), lit(2L)).cast("float")))))
    }, "embeddings")
  }
}
