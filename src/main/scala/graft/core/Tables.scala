package graft.core

import org.apache.spark.sql.DataFrame

/** Bucketed-at-rest table layout — the co-location lever for repeated
  * big-big equi-joins and aggregations at 100 TB: both sides bucketed
  * (and sorted) on the join key read straight into a sort-merge join
  * with NO Exchange and NO per-query Sort; the one-time shuffle happens
  * at write time instead of on every query.
  *
  * (Reference counterpart: the TimescaleDB hypertables the reference
  * writes into are chunked by time+stream — `crontab/sta_raw_to_sta_prod
  * _transfer 1.sh:37-44`; bucketing is the Spark-native equivalent of
  * that at-rest partitioning.)
  */
object Tables {

  /** Write `df` as a bucketed, sorted parquet table. `path` keeps the
    * files external (e.g. a temp dir in tests); bucket count should be
    * sized so one bucket ≈ one task's worth of data at the target scale.
    */
  def writeBucketed(df: DataFrame, table: String, path: String,
                    keys: Seq[String], buckets: Int,
                    sortCols: Seq[String] = Seq.empty): Unit = {
    require(keys.nonEmpty, "bucketing needs at least one key")
    val sorted = if (sortCols.isEmpty) keys else sortCols
    df.write.mode("overwrite")
      .option("path", path)
      .bucketBy(buckets, keys.head, keys.tail: _*)
      .sortBy(sorted.head, sorted.tail: _*)
      .format("parquet")
      .saveAsTable(table)
  }
}
