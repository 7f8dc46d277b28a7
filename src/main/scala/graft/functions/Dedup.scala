package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines: exact,
  * n-gram-Jaccard, MinHash+LSH banding, and SimHash.
  *
  * Scale design: every variant reduces near-dup discovery to *equi-joins
  * on derived keys* (fingerprint, shingle, band bucket) — shuffle-by-key
  * is the only data movement, never an O(n²) cross join. Frequent-shingle
  * skew is capped with a document-frequency filter before the self-join.
  */
object Dedup {

  /** Distinct 3-word shingles per document (1-based positions). Docs with
    * fewer than k words yield an empty set (guard: Spark `sequence(1, 0)`
    * would count *down*).
    */
  def shingles(text: Column, k: Int = 3): Column = {
    val words = TextAnalysis.wsTokens(TextAnalysis.normalized(text))
    when(size(words) < k, array().cast("array<string>")).otherwise(
      array_distinct(
        transform(sequence(lit(1), size(words) - (k - 1)),
          i => concat_ws(" ", (0 until k).map(j => element_at(words, i + j)): _*))))
  }

  /** Exact dedup: group by fingerprint, canonical = min id. Returns
    * (id, fingerprint, canonical_id, group_size, is_duplicate).
    */
  def exact(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val fp = df.withColumn("fingerprint", TextAnalysis.fingerprint(col(textCol)))
    val groups = fp.groupBy("fingerprint")
      .agg(min(col(idCol)).as("canonical_id"), count(lit(1)).as("group_size"))
    fp.join(groups, Seq("fingerprint"))
      .withColumn("is_duplicate", col(idCol) =!= col("canonical_id"))
  }

  /** Exact n-gram-Jaccard near-dup pairs via an inverted shingle index:
    * explode distinct shingles, self-join on shingle (df-filtered to cap
    * skew), count co-occurrences, Jaccard = co / (|A| + |B| − co).
    * Exact (not approximate): any pair with J > 0 shares ≥1 shingle.
    * Returns (id_a, id_b, jaccard) with id_a < id_b and jaccard ≥ tau.
    *
    * @param maxShingleDf drop shingles appearing in more than this many
    *   docs (skew cap; boilerplate shingles explode the join otherwise).
    *   Pass Long.MaxValue for fully-exact semantics.
    */
  def ngramJaccardPairs(df: DataFrame, idCol: String, textCol: String,
                        tau: Double, k: Int = 3,
                        maxShingleDf: Long = Long.MaxValue): DataFrame = {
    val sh = df.select(col(idCol).as("id"), explode(shingles(col(textCol), k)).as("shingle"))
    val sizes = sh.groupBy("id").agg(count(lit(1)).as("n_shingles"))
    val filtered =
      if (maxShingleDf == Long.MaxValue) sh
      else {
        val dfreq = sh.groupBy("shingle").agg(count(lit(1)).as("df"))
          .filter(col("df") <= maxShingleDf)
        sh.join(dfreq.select("shingle"), Seq("shingle"))
      }
    val a = filtered.withColumnRenamed("id", "id_a")
    val b = filtered.withColumnRenamed("id", "id_b")
    val co = a.join(b, Seq("shingle")).filter(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b").agg(count(lit(1)).as("co"))
    co.join(broadcast(sizes).withColumnRenamed("id", "id_a")
        .withColumnRenamed("n_shingles", "na"), Seq("id_a"))
      .join(broadcast(sizes).withColumnRenamed("id", "id_b")
        .withColumnRenamed("n_shingles", "nb"), Seq("id_b"))
      .withColumn("jaccard", col("co").cast("double") /
        (col("na") + col("nb") - col("co")).cast("double"))
      .filter(col("jaccard") >= tau)
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("jaccard"))
  }

  // ---- MinHash ----------------------------------------------------------
  // Base shingle hash: first 8 hex chars of md5 (32 bits, engine-portable),
  // then K independent affine permutations (a_k·h + b_k) mod P. Coefficient
  // sizes keep every product < 2^53 so no engine can overflow (DuckDB
  // raises on BIGINT overflow; Java wraps — neither may happen).
  val MinhashP = 4294967311L // smallest prime > 2^32
  val MinhashK = 16
  def hashCoeffA(i: Int): Long = 1000003L + 7919L * i
  def hashCoeffB(i: Int): Long = 104729L + 524287L * i

  /** 32-bit portable base hash of a string column. */
  def baseHash(c: Column): Column = conv(substring(md5(c), 1, 8), 16, 10).cast("long")

  def minhashSignature(text: Column, k: Int = MinhashK): Column = {
    val sh = shingles(text)
    val hs = transform(sh, s => baseHash(s))
    array((0 until k).map { i =>
      array_min(transform(hs, h =>
        pmod(h * hashCoeffA(i) + hashCoeffB(i), lit(MinhashP))))
    }: _*)
  }

  /** LSH banding: split the K-wide signature into `bands` bands of
    * K/bands rows each; band key = md5 of the joined band values. Docs
    * sharing any (band_idx, band_key) are near-dup candidates — the
    * bucket-join is an equi-join, the scale path for 100 TB dedup.
    * Returns (id, band_idx, band_key).
    */
  def minhashBands(df: DataFrame, idCol: String, textCol: String,
                   k: Int = MinhashK, bands: Int = 4): DataFrame = {
    val r = k / bands
    val sig = df.select(col(idCol).as("id"), minhashSignature(col(textCol), k).as("sig"))
    val bandRows = (0 until bands).map { b =>
      sig.select(col("id"), lit(b).as("band_idx"),
        md5(concat_ws("_", (0 until r).map(i => element_at(col("sig"), b * r + i + 1)): _*))
          .as("band_key"))
    }
    bandRows.reduce(_ unionByName _)
  }

  /** Candidate pairs from shared LSH buckets, verified with exact Jaccard. */
  def minhashNearDupPairs(df: DataFrame, idCol: String, textCol: String,
                          tau: Double, k: Int = MinhashK, bands: Int = 4): DataFrame = {
    val b = minhashBands(df, idCol, textCol, k, bands)
    val cand = b.as("x").join(b.as("y"), Seq("band_idx", "band_key"))
      .filter(col("x.id") < col("y.id"))
      .select(col("x.id").as("id_a"), col("y.id").as("id_b")).distinct()
    val sh = df.select(col(idCol).as("id"), shingles(col(textCol)).as("sh"))
    cand.join(sh.select(col("id").as("id_a"), col("sh").as("sh_a")), Seq("id_a"))
      .join(sh.select(col("id").as("id_b"), col("sh").as("sh_b")), Seq("id_b"))
      .withColumn("jaccard",
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b"))).cast("double"))
      .filter(col("jaccard") >= tau)
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("jaccard"))
  }

  // ---- SimHash ----------------------------------------------------------

  /** 32-bit SimHash over shingle base-hashes: bit i of the result is set
    * when Σ_shingles (2·bit_i(h) − 1) > 0. Hamming-close simhashes ≈
    * near-dup texts.
    */
  def simhash32(text: Column): Column = {
    val hs = transform(shingles(text), s => baseHash(s))
    val bits = (0 until 32).map { i =>
      val vote = aggregate(hs, lit(0L),
        (acc, h) => acc + (shiftright(h, i) % 2) * 2 - 1)
      when(vote > 0, lit(1L << i)).otherwise(lit(0L))
    }
    bits.reduce(_ + _)
  }
}
