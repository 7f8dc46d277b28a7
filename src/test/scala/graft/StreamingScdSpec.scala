package graft

import graft.ops.WindowKernels
import graft.streaming.StreamingScd
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

/** Streaming SCD2 closed intervals == the batch kernel's non-null-to
  * rows over the same data, pinned across micro-batch splits.
  */
class StreamingScdSpec extends SparkSpec with Matchers {
  import spark.implicits._

  // (iot_id, t_us, v, ds)
  private val rows = Seq(
    (1L, 10L, "a", 5L), (2L, 20L, "a", 5L), // [10, 30) a x2
    (3L, 30L, "b", 5L),                     // [30, 45) b x1
    (4L, 45L, "a", 5L), (5L, 50L, "a", 5L), // open: a
    (6L, 10L, "x", 9L), (7L, 12L, "y", 9L)  // ds 9: [10, 12) x, open y
  )

  private def batchClosed: Set[(Long, String, Long, Long, Long)] =
    WindowKernels.scd2Intervals(
        rows.toDF("iot_id", "t_us", "v", "datastream_id"),
        Seq("datastream_id"), col("t_us"), col("iot_id"), col("v"))
      .filter(col("valid_to_us").isNotNull)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet

  private def streamed(splitAt: Int): Set[(Long, String, Long, Long, Long)] = {
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[(Long, Long, String, Long)]
    val out = StreamingScd.scdMonitor(
      mem.toDS().toDF("iot_id", "t_us", "v", "datastream_id"),
      "datastream_id", "t_us", "iot_id", "v")
    val name = s"scd_stream_$splitAt"
    val q = out.writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      mem.addData(rows.take(splitAt))
      q.processAllAvailable()
      mem.addData(rows.drop(splitAt))
      q.processAllAvailable()
      spark.table(name).collect().map(r => (r.getLong(0), r.getString(1),
        r.getLong(2), r.getLong(3), r.getLong(4))).toSet
    } finally q.stop()
  }

  test("closed intervals == batch kernel, every split point") {
    val expect = batchClosed
    expect should contain((5L, "a", 10L, 30L, 2L)) // sanity
    (1 to 6).foreach { at =>
      withClue(s"split at $at: ") { streamed(at) shouldBe expect }
    }
  }

  test("same-value re-arrival bumps the open interval, no flicker") {
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[(Long, Long, String, Long)]
    val out = StreamingScd.scdMonitor(
      mem.toDS().toDF("iot_id", "t_us", "v", "datastream_id"),
      "datastream_id", "t_us", "iot_id", "v")
    val q = out.writeStream.format("memory").queryName("scd_flicker")
      .outputMode("append").start()
    try {
      mem.addData(Seq((1L, 10L, "a", 1L)))
      q.processAllAvailable()
      mem.addData(Seq((2L, 20L, "a", 1L))) // same value: no emission
      q.processAllAvailable()
      spark.table("scd_flicker").count() shouldBe 0L
      mem.addData(Seq((3L, 30L, "b", 1L))) // change: closes [10, 30) n=2
      q.processAllAvailable()
      val got = spark.table("scd_flicker").collect()
      got.length shouldBe 1
      (got(0).getLong(2), got(0).getLong(3), got(0).getLong(4)) shouldBe
        ((10L, 30L, 2L))
    } finally q.stop()
  }
}
