package graft

import graft.streaming.StreamingTransitions
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

/** Streaming transition counts: latest emission per (stream, pair),
  * summed across streams, equals the batch matrix over the CLOSED
  * transitions — at every micro-batch split point.
  */
class StreamingTransitionsSpec extends SparkSpec with Matchers {
  import spark.implicits._

  // (iot_id, t_us, typ, ds)
  private val rows = Seq(
    (1L, 10L, "view", 5L), (2L, 20L, "click", 5L),
    (3L, 30L, "view", 5L), (4L, 40L, "click", 5L),
    (5L, 50L, "buy", 5L),
    (6L, 10L, "view", 9L), (7L, 20L, "view", 9L)
  )

  // batch reference: closed transitions only (no END rows)
  private def batchClosed: Map[(String, String), Long] = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"ds").orderBy($"t_us", $"iot_id")
    rows.toDF("iot_id", "t_us", "typ", "ds")
      .withColumn("nxt", lead($"typ", 1).over(w))
      .filter($"nxt".isNotNull)
      .groupBy($"typ", $"nxt").count()
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
  }

  private def streamed(splitAt: Int): Map[(String, String), Long] = {
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[(Long, Long, String, Long)]
    val out = StreamingTransitions.monitor(
      mem.toDS().toDF("iot_id", "t_us", "typ", "ds"),
      "ds", "t_us", "iot_id", "typ")
    val name = s"trans_stream_$splitAt"
    val q = out.writeStream.format("memory").queryName(name)
      .outputMode("update").start()
    try {
      mem.addData(rows.take(splitAt))
      q.processAllAvailable()
      mem.addData(rows.drop(splitAt))
      q.processAllAvailable()
      // latest emission per (stream, pair), then sum across streams
      spark.table(name)
        .withColumn("__i", monotonically_increasing_id())
        .withColumn("__rn", row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy($"datastream_id", $"from_type", $"to_type")
            .orderBy($"__i".desc)))
        .filter($"__rn" === 1)
        .groupBy($"from_type", $"to_type")
        .agg(sum($"n").as("n"))
        .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
        .toMap
    } finally q.stop()
  }

  test("batch reference sanity") {
    batchClosed shouldBe Map(
      ("view", "click") -> 2L, ("click", "view") -> 1L,
      ("click", "buy") -> 1L, ("view", "view") -> 1L)
  }

  test("summed latest emissions == batch closed matrix, every split") {
    val expect = batchClosed
    (0 to rows.length).foreach { at =>
      withClue(s"split at $at: ") { streamed(at) shouldBe expect }
    }
  }
}
