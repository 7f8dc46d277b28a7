package graft

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
import graft.core.{Flags, Obs}
import graft.sources.PatchSink
import graft.streaming.IncrementalQc
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import java.net.InetSocketAddress

/** O2/O3 — incremental QC as Structured Streaming (reference cron
  * windows, `qc_historical.sh` / `crontab/qc.sh`): AvailableNow trigger,
  * per-batch QC chain, idempotent flag upserts.
  */
class StreamingSpec extends SparkSpec {
  import spark.implicits._

  test("availableNow stream runs the QC chain per batch and terminates") {
    val dir = java.nio.file.Files.createTempDirectory("stream_src").toString
    // a small observations batch: 2 streams, some values out of bounds
    val obs = (0 until 40).map { i =>
      (i.toLong, if (i % 7 == 0) 99.0 else 10.0 + i % 3,
        new java.sql.Timestamp(1700000000000L + i * 60000L), (i % 2).toLong)
    }.toDF(Obs.IotId, Obs.Result, Obs.Time, Obs.DatastreamId)
    obs.write.mode("overwrite").parquet(dir)

    val conf = Seq((0L, 5.0, 50.0, -1.0, 1.0), (1L, 5.0, 50.0, -1.0, 1.0))
      .toDF(Obs.DatastreamId, "qc_range_min", "qc_range_max",
        "qc_gradient_min", "qc_gradient_max")

    var rows = 0L
    var bad = 0L
    val q = IncrementalQc.stream(spark, dir, obs.schema, conf, lookbackSec = 1200L) {
      (batch, _) =>
        rows += batch.count()
        bad += batch.filter(col(Obs.QcFlag) === Flags.Bad).count()
    }.start()
    q.awaitTermination(60000)
    assert(rows == 40)
    assert(bad == 6) // 99.0 out of (5,50) at i % 7 == 0 => i in {0,7,...,35}
    // i=0: also true => 6 values: 0,7,14,21,28,35
  }

  test("re-running the stream over the same data is idempotent (last-writer-wins)") {
    val dir = java.nio.file.Files.createTempDirectory("stream_src2").toString
    val obs = (0 until 10).map { i =>
      (i.toLong, 10.0, new java.sql.Timestamp(1700000000000L + i * 1000L), 0L)
    }.toDF(Obs.IotId, Obs.Result, Obs.Time, Obs.DatastreamId)
    obs.write.mode("overwrite").parquet(dir)
    val conf = Seq((0L, 5.0, 50.0, -1.0, 1.0))
      .toDF(Obs.DatastreamId, "qc_range_min", "qc_range_max",
        "qc_gradient_min", "qc_gradient_max")

    val state = scala.collection.mutable.Map.empty[Long, Byte] // upsert sink
    def run(): Unit = {
      val q = IncrementalQc.stream(spark, dir, obs.schema, conf, 1200L) { (batch, _) =>
        batch.select(col(Obs.IotId), col(Obs.QcFlag)).collect()
          .foreach(r => state(r.getLong(0)) = r.getByte(1)) // last writer wins
      }.start()
      q.awaitTermination(60000)
    }
    run()
    val after1 = state.toMap
    run() // second pass over identical data
    assert(state.toMap == after1 && state.size == 10)
  }

  test("stream → QC → live $batch PATCH: re-delivered overlap window converges (cron lifecycle)") {
    // the reference's §3.3 lifecycle end to end: micro-batches flow
    // through the QC chain and PATCH flags to a live $batch endpoint;
    // the cron overlap re-delivers a window and the server must converge
    // to the same flags (last-writer-wins upserts keyed on iot_id)
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    val bodies = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    server.createContext("/batch", new HttpHandler {
      override def handle(ex: HttpExchange): Unit = {
        bodies.add(new String(ex.getRequestBody.readAllBytes(), "UTF-8"))
        val resp = """{"responses":[]}""".getBytes("UTF-8")
        ex.sendResponseHeaders(200, resp.length)
        val os = ex.getResponseBody
        try os.write(resp) finally os.close()
        ex.close()
      }
    })
    server.start()
    val url = s"http://127.0.0.1:${server.getAddress.getPort}/batch"
    try {
      val dir = java.nio.file.Files.createTempDirectory("stream_patch").toString
      val obs = (0 until 12).map { i =>
        (i.toLong, if (i % 4 == 0) 99.0 else 10.0,
          new java.sql.Timestamp(1700000000000L + i * 60000L), 0L)
      }.toDF(Obs.IotId, Obs.Result, Obs.Time, Obs.DatastreamId)
      obs.write.mode("overwrite").parquet(dir)
      val conf = Seq((0L, 5.0, 50.0, -1000.0, 1000.0))
        .toDF(Obs.DatastreamId, "qc_range_min", "qc_range_max",
          "qc_gradient_min", "qc_gradient_max")

      def run(): Unit = {
        val q = IncrementalQc.stream(spark, dir, obs.schema, conf, 1200L) { (batch, _) =>
          PatchSink.httpBatchSink(batch, url, batchSize = 5)
        }.start()
        q.awaitTermination(60000)
      }
      // last-writer-wins replay of what the server stores
      def serverState(): Map[Long, Int] = {
        val pat = """"url":"Observations\((\d+)\)","body":\{"resultQuality":(\d+)\}""".r
        val st = scala.collection.mutable.Map.empty[Long, Int]
        bodies.toArray.map(_.toString).foreach { b =>
          pat.findAllMatchIn(b).foreach(m => st(m.group(1).toLong) = m.group(2).toInt)
        }
        st.toMap
      }

      run()
      val firstBodies = bodies.size()
      val afterFirst = serverState()
      assert(afterFirst.size == 12, s"12 observations patched, got ${afterFirst.size}")
      // out-of-range rows carry the BAD wire code, distinct from the rest
      val badWire = afterFirst(0L)
      assert(afterFirst(4L) == badWire && afterFirst(8L) == badWire && afterFirst(1L) != badWire)

      // cron overlap: the same window re-delivered as a NEW file => a new
      // micro-batch re-QCs the rows and PATCHes again
      obs.coalesce(1).write.mode("append").parquet(dir)
      run()
      assert(bodies.size() > firstBodies, "overlap re-delivery must actually re-patch")
      assert(serverState() == afterFirst, "re-delivered flags must converge (idempotent)")
    } finally server.stop(0)
  }
}
