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

  test("session_window streaming == batch sessionize on finalized sessions") {
    import graft.streaming.StreamingSessions
    val dir = java.nio.file.Files.createTempDirectory("stream_sess").toString
    val base = 1700000000000L
    // two users, sessions split by gaps far from the 30 s boundary
    val events = Seq(
      ("u1", 0L), ("u1", 5000L), ("u1", 9000L),      // session 1 (3 events)
      ("u1", 120000L), ("u1", 125000L),              // session 2 (2 events)
      ("u2", 1000L),                                  // session (1 event)
      ("u2", 200000L), ("u2", 201000L), ("u2", 202000L) // session (3 events)
    ).map { case (u, off) => (u, new java.sql.Timestamp(base + off)) }
    spark.createDataFrame(events).toDF("user", "ts")
      .repartition(1).write.mode("overwrite").parquet(dir)
    // a far-future event in a SECOND file: its batch pushes the
    // watermark past every real session so append mode finalizes them
    Seq(("zz", new java.sql.Timestamp(base + 86400000L))).toDF("user", "ts")
      .repartition(1).write.mode("append").parquet(dir)

    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("user",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("ts",
        org.apache.spark.sql.types.TimestampType)))
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(dir)
    val out = StreamingSessions.sessionStats(stream, "ts", Seq("user"),
      gap = "30 seconds", watermarkDelay = "0 seconds")
    val q = out.writeStream.format("memory").queryName("sess_out")
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination(120000)

    val streamed = spark.table("sess_out")
      .filter($"user" =!= "zz") // the watermark-pusher's own session never finalizes
      .collect()
      .map(r => (r.getString(0), r.getAs[Long]("t_start_us"),
        r.getAs[Long]("t_end_us"), r.getAs[Long]("n_events"),
        r.getAs[Long]("duration_us"))).toSet
    val batchDf = events.toDF("user", "ts")
      .withColumn("t_us", unix_micros($"ts"))
    val sess = graft.ops.WindowKernels.sessionize(
      batchDf, Seq("user"), $"t_us", gapUs = 30000000L)
    val batch = graft.ops.WindowKernels.sessionStats(sess, Seq("user"), $"t_us")
      .collect()
      .map(r => (r.getString(0), r.getAs[Long]("t_start_us"),
        r.getAs[Long]("t_end_us"), r.getAs[Long]("n_events"),
        r.getAs[Long]("duration_us"))).toSet
    assert(streamed == batch)
    assert(batch.size == 4)
  }

  test("streaming funnel == batch funnel across a micro-batch split") {
    import graft.streaming.{FunnelEvent, StreamingFunnel}
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val steps = Seq("view", "click", "purchase")
    val events = Seq(
      FunnelEvent(1L, "view", 10L), FunnelEvent(1L, "click", 20L),
      FunnelEvent(1L, "purchase", 30L),                    // full funnel
      FunnelEvent(2L, "click", 5L), FunnelEvent(2L, "view", 10L),
      FunnelEvent(2L, "click", 40L),                       // pre-view click ignored
      FunnelEvent(3L, "view", 10L),                        // stops at stage 1
      FunnelEvent(4L, "purchase", 10L))                    // never viewed: no rows
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[FunnelEvent]
    val out = StreamingFunnel(mem.toDS(), steps)
    val q = out.writeStream.format("memory").queryName("funnel_stream")
      .outputMode("append").start()
    try {
      // split MID-FUNNEL for keys 1 and 2: stage times must carry in state
      mem.addData(events.take(4))
      q.processAllAvailable()
      mem.addData(events.drop(4))
      q.processAllAvailable()
      val streamed = spark.table("funnel_stream")
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
      val batch = graft.ops.Funnel.ordered(
        events.toDF().select($"key", $"etype", $"tUs"),
        "key", $"etype", $"tUs", steps)
        .collect().flatMap { r =>
          (1 to steps.length).flatMap { i =>
            if (r.isNullAt(i)) None else Some((r.getLong(0), i, r.getLong(i)))
          }
        }.toSet
      assert(streamed == batch)
      assert(streamed.contains((1L, 3, 30L)) && streamed.contains((2L, 2, 40L)))
      assert(!streamed.exists(_._1 == 4L))
    } finally q.stop()
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
