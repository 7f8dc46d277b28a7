package graft

import graft.core.Tables
import org.apache.spark.sql.functions._

/** Z-order clustering = multi-dimensional file skipping: after one
  * write-time shuffle, per-file [min, max] footprints are tight in
  * EVERY z dimension, so a predicate on any z column prunes files. A
  * single-column time sort serves only time predicates — every file
  * spans the full user range.
  */
class ZOrderSpec extends SparkSpec {

  private def fileFootprints(dir: String, cols: Seq[String]): Seq[Map[String, (Long, Long)]] =
    new java.io.File(dir).listFiles().filter(_.getName.endsWith(".parquet")).toSeq
      .map { f =>
        val r = spark.read.parquet(f.getAbsolutePath)
          .agg(cols.flatMap(c => Seq(min(col(c)), max(col(c)))).head,
            cols.flatMap(c => Seq(min(col(c)), max(col(c)))).tail: _*)
          .collect()(0)
        cols.zipWithIndex.map { case (c, i) =>
          c -> (r.getLong(2 * i), r.getLong(2 * i + 1))
        }.toMap
      }

  private def filesHit(fps: Seq[Map[String, (Long, Long)]],
                       pred: Map[String, (Long, Long)]): Int =
    fps.count(fp => pred.forall { case (c, (lo, hi)) =>
      val (fLo, fHi) = fp(c); fHi >= lo && fLo <= hi
    })

  test("z-order prunes files on both dimensions; a time sort only on time") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_zorder").toString
    // t_us: epoch-µs long regardless of how the vintage of events.parquet
    // encodes ts (TIMESTAMP(NANOS)-as-long under nanosAsLong, or native µs)
    val raw = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    val tUs = graft.core.Obs.rawTsToEpochUs(raw.schema)
    val events = raw.select(col("user_id"), tUs.as("t_us"), col("value"))
    val nFiles = 8

    Tables.writeZOrdered(events, s"$dir/z", Seq("user_id", "t_us"), files = nFiles)
    events.repartitionByRange(nFiles, col("t_us")).sortWithinPartitions("t_us")
      .write.mode("overwrite").parquet(s"$dir/linear")

    val zFps = fileFootprints(s"$dir/z", Seq("user_id", "t_us"))
    val lFps = fileFootprints(s"$dir/linear", Seq("user_id", "t_us"))
    assert(zFps.size == nFiles && lFps.size == nFiles)

    val (uLo, uHi, tLo, tHi) = {
      val r = events.agg(min($"user_id"), max($"user_id"), min($"t_us"), max($"t_us"))
        .collect()(0)
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    }
    // a narrow slice in each dimension (~1/8 of the range)
    val userPred = Map("user_id" -> (uLo, uLo + (uHi - uLo) / 8))
    val timePred = Map("t_us" -> (tLo, tLo + (tHi - tLo) / 8))

    // user-only predicate: the time-sorted layout cannot skip anything
    // (every file spans all users); z-order must skip files
    val zUser = filesHit(zFps, userPred)
    val lUser = filesHit(lFps, userPred)
    assert(lUser == nFiles, s"time-sorted layout unexpectedly pruned users: $lUser")
    assert(zUser < lUser, s"z-order should prune user-range reads: $zUser vs $lUser")

    // time-only predicate: the time sort is optimal; z-order must still
    // skip SOME files (the cost of serving both dimensions)
    val zTime = filesHit(zFps, timePred)
    assert(zTime < nFiles, s"z-order should still prune time-range reads: $zTime")

    // correctness: the clustered copy is the same table
    val zRead = spark.read.parquet(s"$dir/z")
    assert(zRead.count() == events.count())
    assert(zRead.agg(sum($"user_id"), sum($"t_us")).collect()(0) ==
      events.agg(sum($"user_id"), sum($"t_us")).collect()(0))
  }

  test("compaction: size-driven rewrite collapses a small-file directory") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_compact").toString
    val events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    events.repartition(64).write.parquet(s"$dir/shattered")

    val perFile = new java.io.File(s"$dir/shattered").listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.length()).sum / 64
    val (before, after) = graft.core.Tables.compact(
      spark, s"$dir/shattered", s"$dir/compacted", targetFileBytes = perFile * 16)
    assert(before == 64, s"expected 64 shattered files, saw $before")
    assert(after <= 8 && after >= 1, s"expected <=8 compacted files, saw $after")

    val a = spark.read.parquet(s"$dir/compacted")
    assert(a.count() == events.count())
    assert(a.agg(sum($"event_id")).collect()(0) ==
      events.agg(sum($"event_id")).collect()(0))
  }
}
