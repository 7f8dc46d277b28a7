package graft

import graft.streaming.{StreamingDedup, StreamingHealth}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

/** The live state-health side output tracks a PLANTED state trajectory:
  * a growth phase (all-fresh keys inside the watermark horizon — state
  * must climb batch over batch) followed by a horizon advance (eviction
  * — state must fall), both read back from the queryable frame rather
  * than raw progress objects, plus the RocksDB maintenance counters the
  * dashboard alert needs (sst bytes, compaction, snapshot upload).
  */
class StreamingHealthSpec extends SparkSpec with Matchers {
  import spark.implicits._

  test("stateHealth tracks planted growth, then eviction; RocksDB " +
    "maintenance counters are reported") {
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[(Long, String, Long)]
    val src = mem.toDS().toDF("doc_id", "text", "ts_s")
      .withColumn("event_time", timestamp_seconds(col("ts_s")))
    val out = StreamingDedup.withinWatermark(
      src, "text", "event_time", "600 seconds")
    val q = out.writeStream.format("noop").outputMode("append").start()
    try {
      // ---- growth phase: 5 batches × 100 fresh fingerprints, event
      // time pinned inside the horizon → nothing can be evicted
      var id = 0L
      val perBatch = 100
      val growth = (0 until 5).map { b =>
        mem.addData((0 until perBatch).map(i => (id + i, s"doc ${id + i}", 10L + b)))
        q.processAllAvailable()
        id += perBatch
        val h = StreamingHealth.stateHealth(spark, q)
          .select("state_rows", "memory_used_bytes", "operator_name",
            "sst_file_bytes", "compaction_ms", "snapshot_files_copied",
            "changelog_files_replayed")
          .as[(Long, Long, String, Long, Long, Long, Long)].collect()
        h.length shouldBe 1 // one stateful operator → one row
        h.head
      }
      // the health frame's state_rows climbs with the planted keys,
      // ending at exactly the fed distinct-fingerprint count
      val rows = growth.map(_._1)
      rows shouldBe rows.sorted
      rows.last shouldBe 500L
      rows.head should be < rows.last
      growth.last._2 should be > 0L // memory accounted
      growth.last._3.toLowerCase should include("dedup")
      // RocksDB provider: maintenance counters REPORTED (>= 0), not the
      // -1 "store does not expose this" sentinel
      growth.last._4 should be >= 0L
      growth.last._5 should be >= 0L
      growth.last._6 should be >= 0L
      growth.last._7 should be >= 0L

      // ---- eviction phase: jump event time far past the horizon; the
      // watermark advances and the old fingerprints age out
      mem.addData(Seq((id, s"doc $id", 100000L)))
      q.processAllAvailable()
      mem.addData(Seq((id + 1, s"doc ${id + 1}", 100001L)))
      q.processAllAvailable()
      val after = StreamingHealth.stateHealth(spark, q)
        .select("state_rows").as[Long].collect().head
      after should be < 500L

      // ---- the history frame carries the whole trajectory: its
      // per-batch state_rows maxima contain both the climb and the drop
      val hist = StreamingHealth.stateHealthHistory(spark, q)
        .groupBy("batch_id").agg(max("state_rows").as("r"))
        .orderBy("batch_id").select("r").as[Long].collect()
      // peak = the 500 planted keys, +1..2 for the horizon-advance rows
      // ingested in the batch BEFORE their watermark evicts the backlog
      hist.max should be >= 500L
      hist.max should be <= 502L
      hist.last should be < 500L
    } finally q.stop()
  }

  test("attachHealthSink persists per-batch health rows to a parquet " +
    "table the trend survives in") {
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[(Long, String, Long)]
    val src = mem.toDS().toDF("doc_id", "text", "ts_s")
      .withColumn("event_time", timestamp_seconds(col("ts_s")))
    val out = StreamingDedup.withinWatermark(
      src, "text", "event_time", "600 seconds")
    val q = out.writeStream.format("noop").outputMode("append").start()
    val health = java.nio.file.Files
      .createTempDirectory("graft_health").toString + "/t"
    val listener = StreamingHealth.attachHealthSink(spark, q.id, health)
    try {
      var id = 0L
      (0 until 4).foreach { b =>
        mem.addData((0 until 50).map(i => (id + i, s"d ${id + i}", 10L + b)))
        q.processAllAvailable()
        id += 50
      }
      // listener events are async: wait for all four batches to land
      val deadline = System.nanoTime() + 30L * 1000000000L
      def batches(): Long =
        try spark.read.parquet(health).select("batch_id").distinct().count()
        catch { case _: Exception => 0L }
      while (batches() < 4 && System.nanoTime() < deadline)
        Thread.sleep(100)
      val t = spark.read.parquet(health)
      t.select("batch_id").distinct().count() shouldBe 4L
      // the persisted trend carries the same growth the live frame saw
      val byBatch = t.groupBy("batch_id").agg(max("state_rows").as("r"))
        .orderBy("batch_id").select("r").as[Long].collect()
      byBatch shouldBe byBatch.sorted
      byBatch.last shouldBe 200L
    } finally {
      q.stop()
      spark.streams.removeListener(listener)
    }
  }

  test("attachHealthSink survives a checkpoint-recovery restart: batch " +
    "ids in the parquet history stay contiguous and dupe-free across " +
    "the stop/resume boundary") {
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[(Long, String, Long)]
    val src = mem.toDS().toDF("doc_id", "text", "ts_s")
      .withColumn("event_time", timestamp_seconds(col("ts_s")))
    val out = StreamingDedup.withinWatermark(
      src, "text", "event_time", "600 seconds")
    val ckpt = java.nio.file.Files.createTempDirectory("health_ckpt").toString
    val sink = java.nio.file.Files.createTempDirectory("health_sink").toString
    val health = java.nio.file.Files
      .createTempDirectory("graft_health_restart").toString + "/t"
    def start() = out.writeStream.format("parquet")
      .option("path", sink).option("checkpointLocation", ckpt)
      .outputMode("append").start()

    var q = start()
    // the PERSISTENT query id (q.id) survives a checkpoint restart —
    // runId changes per run, id does not — so ONE listener keyed on it
    // keeps matching the resumed query
    val listener = StreamingHealth.attachHealthSink(spark, q.id, health)
    def landedBatches(): Long =
      try spark.read.parquet(health).select("batch_id").distinct().count()
      catch { case _: Exception => 0L }
    def awaitLanded(n: Long): Unit = {
      val deadline = System.nanoTime() + 30L * 1000000000L
      while (landedBatches() < n && System.nanoTime() < deadline)
        Thread.sleep(100)
    }
    try {
      var id = 0L
      def feed(batches: Int): Unit = (0 until batches).foreach { b =>
        mem.addData((0 until 50).map(i => (id + i, s"d ${id + i}", 10L)))
        q.processAllAvailable()
        id += 50
      }
      feed(3)
      awaitLanded(3)
      val preRestart = landedBatches()
      preRestart should be >= 3L
      // restart: stop cold (offsets+commits flushed by
      // processAllAvailable), resume from the checkpoint, keep feeding
      q.stop()
      q = start()
      feed(3)
      awaitLanded(preRestart + 3)

      val t = spark.read.parquet(health)
      val ids = t.select("batch_id").as[Long].distinct()
        .collect().sorted.toSeq
      ids.length.toLong should be >= (preRestart + 3)
      // contiguous: no gap across the restart boundary (batch numbering
      // resumes from the checkpoint, it does not reset or skip)
      ids shouldBe (ids.head to ids.last)
      // dupe-free: a committed batch's health rows land exactly once
      // per stateful operator, even though the listener outlived a
      // query restart
      val dupes = t.groupBy("batch_id", "op_idx")
        .agg(count(lit(1)).as("n")).filter(col("n") > 1).count()
      dupes shouldBe 0L
      // and the state itself recovered: post-restart batches report the
      // pre-restart fingerprints still in the store (state_rows carries
      // past the boundary, it does not restart from zero)
      val lastRows = t.orderBy(col("batch_id").desc)
        .select("state_rows").as[Long].head()
      lastRows shouldBe 300L
    } finally {
      q.stop()
      spark.streams.removeListener(listener)
    }
  }

  test("stateHealth on a not-yet-started query is an EMPTY frame with " +
    "the full schema (unconditional union/write safety)") {
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[(Long, String, Long)]
    val src = mem.toDS().toDF("doc_id", "text", "ts_s")
      .withColumn("event_time", timestamp_seconds(col("ts_s")))
    val q = StreamingDedup.withinWatermark(src, "text", "event_time", "60 seconds")
      .writeStream.format("noop").outputMode("append").start()
    try {
      val h = StreamingHealth.stateHealth(spark, q)
      h.columns should contain allOf ("batch_id", "state_rows",
        "memory_used_bytes", "sst_file_bytes", "compaction_ms")
      h.count() shouldBe 0L
    } finally q.stop()
  }
}
