package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Hot-key skew caps, computed WITHOUT colocating the hot key.
  *
  * The trap this exists to avoid: `count().over(Window.partitionBy(key))`
  * must shuffle every row of a key onto one task before the cap filter
  * can drop it — at corpus scale a boilerplate shingle or empty-document
  * fingerprint with 10⁹ occurrences is a straggler/OOM on exactly the
  * input the cap is meant to defend against.
  *
  * The scale-safe shape is two-phase:
  *   1. `groupBy(key).count()` — map-side partial aggregation collapses
  *      the hot key to one row per input partition BEFORE the shuffle,
  *      so no task ever holds more than (#partitions) rows of any key;
  *   2. the over-cap key set (tiny by construction — these are the few
  *      pathological keys) broadcasts back as a `left_anti` join, so the
  *      hot rows are dropped map-side and never enter a key shuffle.
  *
  * At bench SF this plans the input twice (count pass + anti-join pass)
  * where the window form scanned once; at 100 TB the second scan is
  * noise next to a single task receiving a hot key's entire partition.
  */
object SkewCap {

  /** The keys of `df` occurring more than `cap` times — one partial-agg
    * shuffle of (key, count) rows; output is tiny (only pathological
    * keys survive the filter).
    */
  def overCapKeys(df: DataFrame, key: Column, cap: Long): DataFrame =
    df.groupBy(key.as("__cap_key")).agg(count(lit(1)).as("__cap_n"))
      .filter(col("__cap_n") > cap)
      .select(col("__cap_key"))

  /** Conf key: set `false` to route the anti-join through a shuffle
    * instead of a broadcast (see [[dropOverCap]] sizing contract).
    */
  val BroadcastConf = "graft.skewCap.broadcast"

  /** Drop every row whose `key` occurs more than `cap` times in `df`,
    * without ever colocating a hot key (see object doc). Null-safe on
    * the key (null keys group together, matching the window form's
    * null-partition semantics). `cap == Long.MaxValue` is the identity.
    *
    * Sizing contract: the over-cap key set broadcasts, and its size is
    * bounded by |df| / cap keys (each needs > cap rows), NOT by "a few
    * pathological keys" — a small cap over a heavy-tailed vocabulary
    * (say cap=20 over 10¹² shingle rows) can produce a set that OOMs
    * the driver. Choose cap so that (|df| / cap) × key-width fits
    * comfortably in driver memory, or set `graft.skewCap.broadcast`
    * to `false`: the cap then plans as a shuffle merge anti-join —
    * hot LEFT keys colocate on one task, but a sort-merge drop streams
    * and spills, so it degrades gracefully (a straggler) where an
    * oversized broadcast fails hard.
    */
  def dropOverCap(df: DataFrame, key: Column, cap: Long): DataFrame =
    if (cap == Long.MaxValue) df
    else {
      val over = overCapKeys(df, key, cap)
      val useBroadcast =
        df.sparkSession.conf.getOption(BroadcastConf).forall(_.toBoolean)
      val right = if (useBroadcast) broadcast(over) else over.hint("merge")
      df.join(right, key <=> col("__cap_key"), "left_anti")
    }
}
