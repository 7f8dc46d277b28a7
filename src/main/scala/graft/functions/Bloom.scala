package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bloom filter (Bloom 1970) as a first-class distributed primitive:
  * the compact membership structure a 100 TB decontamination pass wants
  * when the reference set is too large to broadcast verbatim but its
  * BITS are not — 2²⁰ bits is 128 KiB regardless of how many n-grams
  * went in, vs megabytes for the exact fingerprint set.
  *
  * Portability contract (the whole filter must replay bit-exactly in
  * the DuckDB oracle):
  *   - one 60-bit base hash per key: first 15 hex chars of md5 —
  *     the same md5-prefix family as [[Dedup.baseHash]]/[[Sampling]];
  *   - k probe positions by Kirsch-Mitzenmacher double hashing
  *     (Kirsch & Mitzenmacher 2006: pos_i = h1 + i·h2 mod m, with h2
  *     forced odd so probes cycle the full power-of-two table);
  *   - the bit array is a DataFrame of (word_idx, bits): m/32 BIGINT
  *     words (32 bits per word: DuckDB's checked `<<` rejects a
  *     signed 1<<63, the same trap the binary-quantization codes hit) built by one partial-agg'd groupBy — bit_or of 1<<bit
  *     collapses map-side, so building over 10¹² members shuffles at
  *     most m/32 rows per input partition.
  *
  * Probing is k broadcast hash joins of the m/32-row word table into
  * the probe scan — entirely map-side, no shuffle of the probed data,
  * no groupBy: a missing word row means all-zero bits, so a left join
  * with a null-safe bit test decides membership per probe.
  */
object Bloom {

  /** 60-bit md5-prefix hash (15 hex chars < 2^60, always positive). */
  def hash60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  private def positions(key: Column, logM: Int, k: Int): Seq[Column] = {
    val m = 1L << logM
    val h = hash60(key)
    val h1 = pmod(h, lit(m))
    // >> logM keeps h2 independent of h1's bits; ·2+1 forces odd
    val h2 = shiftrightunsigned(h, logM) * lit(2L) + lit(1L)
    (0 until k).map(i => pmod(h1 + lit(i.toLong) * h2, lit(m)))
  }

  /** Build the filter over the (not necessarily distinct) keys of
    * `keyCol`: returns (word_idx, bits) with word_idx = pos >> 5 and
    * bit pos & 31 set for every probe position of every key. Only words
    * with at least one set bit are materialized.
    */
  def build(df: DataFrame, keyCol: Column, logM: Int, k: Int): DataFrame = {
    require(logM >= 6 && logM <= 40, s"logM out of range: $logM")
    require(k >= 1 && k <= 8, s"k out of range: $k")
    val pos = explode(array(positions(keyCol, logM, k): _*)).as("pos")
    df.select(pos)
      .groupBy(expr("pos DIV 32").as("word_idx"))
      .agg(bit_or(call_function("shiftleft", lit(1L),
        (col("pos") % 32L).cast("int"))).as("bits"))
  }

  /** Membership probe: appends BOOLEAN `hitCol` to `df` — true iff all
    * k probe bits of `keyCol` are set in `bloom` (false positives at
    * the filter's designed rate; never false negatives). `bloom` is
    * broadcast k times; each join is map-side.
    */
  def probe(df: DataFrame, keyCol: Column, bloom: DataFrame,
            logM: Int, k: Int, hitCol: String): DataFrame = {
    val ps = positions(keyCol, logM, k)
    val probed = ps.zipWithIndex.foldLeft(
      df.select(col("*") +: ps.zipWithIndex.map { case (p, i) =>
        p.as(s"__bp$i") }: _*)) { case (acc, (_, i)) =>
      acc.join(
          broadcast(bloom.select(col("word_idx").as(s"__bw$i"),
            col("bits").as(s"__bb$i"))),
          expr(s"__bp$i DIV 32") === col(s"__bw$i"), "left")
        .withColumn(s"__bh$i",
          coalesce(col(s"__bb$i").bitwiseAND(call_function("shiftleft",
            lit(1L), (col(s"__bp$i") % 32L).cast("int"))), lit(0L)) =!= 0L)
        .drop(s"__bw$i", s"__bb$i")
    }
    probed
      .withColumn(hitCol,
        (0 until k).map(i => col(s"__bh$i")).reduce(_ && _))
      .drop((0 until k).flatMap(i => Seq(s"__bp$i", s"__bh$i")): _*)
  }

  /** Bloom-gated decontamination audit over aligned fixed-length
    * passages (the [[TextAnalysis.decontaminate]] corpus shape): build
    * the filter from the benchmark's stride-1 windows, probe every
    * corpus passage, verify probe hits against the exact fingerprint
    * set, and report per document how the compact filter would have
    * decided vs ground truth:
    * (doc_id, n_passages, bloom_hits, exact_hits, false_pos,
    *  contaminated, bloom_drop).
    *
    * The exact-verification join is the point: it measures the filter's
    * realized false-positive count IN the query (bloom_hits −
    * exact_hits), so the oracle pins both the bit arithmetic and the
    * designed FP behavior. At production scale the exact set is the
    * part that outgrows a broadcast — the filter's m/32 words never do.
    */
  def bloomDecontaminate(corpus: DataFrame, benchmark: DataFrame,
                         idCol: String, textCol: String,
                         passageLen: Int = 8, logM: Int = 20,
                         k: Int = 3): DataFrame = {
    val bench = benchmark
      .select(explode(Dedup.shingles(col(textCol), passageLen)).as("g"))
      .distinct()
    val bloom = bloomTable(bench, logM, k)
    val pass = TextAnalysis.passages(corpus, idCol, textCol, passageLen)
    val probed = probe(pass, col("passage"), bloom, logM, k, "bloom_hit")
    val exact = bench.select(md5(col("g")).as("__fp"))
    val verified = probed
      .join(broadcast(exact), md5(col("passage")) === col("__fp"),
        "left")
      .withColumn("exact_hit", col("__fp").isNotNull)
    verified.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_passages"),
        sum(when(col("bloom_hit"), 1L).otherwise(0L)).as("bloom_hits"),
        sum(when(col("exact_hit"), 1L).otherwise(0L)).as("exact_hits"))
      .select(col("doc_id"), col("n_passages"), col("bloom_hits"),
        col("exact_hits"),
        (col("bloom_hits") - col("exact_hits")).as("false_pos"),
        (col("exact_hits") > 0L).as("contaminated"),
        (col("bloom_hits") > 0L).as("bloom_drop"))
  }

  /** The built word table for `bench`'s `g` column, cached: the build
    * side is shared by the probe joins (k references) — without the
    * cache each broadcast re-aggregates the benchmark scan.
    */
  private def bloomTable(bench: DataFrame, logM: Int, k: Int): DataFrame =
    build(bench, col("g"), logM, k).cache()
}
