package graft

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
import graft.core.Obs
import graft.sources.PatchSink
import graft.sources.sta.StaHttp
import org.apache.spark.sql.functions._

import java.net.InetSocketAddress
import java.util.concurrent.atomic.AtomicInteger

/** S1/S4 live-transport tests against an in-JVM loopback HTTP server:
  * paged GET (`@iot.nextLink`) with retry on 5xx, per-datastream
  * partition fan-out, server-side `$filter` + reader-side pushed-filter
  * enforcement, and the `$batch` PATCH write-back (reference
  * `get_with_retry` src/main.py:107-118, `get_all_data` 350-364,
  * `patch_qc_flags` 854-859).
  */
class StaHttpSpec extends SparkSpec {

  // ---- loopback STA server ----------------------------------------------

  private def obsJson(id: Long, t: String, result: Double): String =
    s"""{"@iot.id":$id,"result":$result,"phenomenonTime":"$t","resultQuality":0,
       |"FeatureOfInterest":{"@iot.id":5,"feature":{"coordinates":[2.9,51.2]}}}""".stripMargin

  private def dsJson(dsId: Long, obs: Seq[String]): String =
    s"""{"@iot.id":$dsId,"description":"d$dsId",
       |"unitOfMeasurement":{"name":"u"},
       |"ObservedProperty":{"@iot.id":9,"name":"temp"},
       |"Sensor":{"name":"s"},
       |"Observations":[${obs.mkString(",")}]}""".stripMargin

  // datastream 1: 3 observations over 2 pages; datastream 2: 2 observations
  private val ds1page1 = Seq(
    obsJson(11, "2024-01-01T00:00:00Z", 1.0), obsJson(12, "2024-01-01T00:10:00Z", 2.0))
  private val ds1page2 = Seq(obsJson(13, "2024-01-01T00:20:00Z", 3.0))
  private val ds2obs = Seq(
    obsJson(21, "2024-01-01T01:00:00Z", 4.0), obsJson(22, "2024-01-01T01:10:00Z", 5.0))

  private def respond(ex: HttpExchange, code: Int, body: String): Unit = {
    val bytes = body.getBytes("UTF-8")
    ex.sendResponseHeaders(code, bytes.length)
    val os = ex.getResponseBody
    try os.write(bytes) finally os.close()
    ex.close()
  }

  private def withServer(test: (String, java.util.concurrent.ConcurrentLinkedQueue[String],
                                AtomicInteger,
                                java.util.concurrent.ConcurrentLinkedQueue[String]) => Unit): Unit = {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    val patched = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val urls = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val flaked = new java.util.concurrent.ConcurrentHashMap[String, Boolean]()
    val requests = new AtomicInteger(0)
    val port = server.getAddress.getPort
    val base = s"http://127.0.0.1:$port/sta"

    server.createContext("/sta", new HttpHandler {
      override def handle(ex: HttpExchange): Unit = {
        requests.incrementAndGet()
        val q = Option(ex.getRequestURI.getRawQuery).getOrElse("")
        val decoded = java.net.URLDecoder.decode(q, "UTF-8")
        urls.add(decoded)
        // every distinct URL fails once with 503 before serving (retry path)
        if (flaked.putIfAbsent(decoded, true) == null) { respond(ex, 503, "flaky"); return }
        val dsMatch = "Datastream/id eq (\\d+)".r.findFirstMatchIn(decoded).map(_.group(1).toLong)
        val page2 = decoded.contains("page=2")
        val body = dsMatch match {
          case Some(1L) if !page2 =>
            // nextLink keeps the original query and adds the page marker
            s"""{"Datastreams":[${dsJson(1, ds1page1)}],
               |"@iot.nextLink":"$base?page=2&${StaHttp.enc("$filter=Datastream/id eq 1")}"}""".stripMargin
          case Some(1L) => s"""{"Datastreams":[${dsJson(1, ds1page2)}]}"""
          case Some(2L) => s"""{"Datastreams":[${dsJson(2, ds2obs)}]}"""
          case _ => s"""{"Datastreams":[${dsJson(1, ds1page1 ++ ds1page2)},${dsJson(2, ds2obs)}]}"""
        }
        respond(ex, 200, body)
      }
    })
    server.createContext("/batch", new HttpHandler {
      override def handle(ex: HttpExchange): Unit = {
        patched.add(new String(ex.getRequestBody.readAllBytes(), "UTF-8"))
        respond(ex, 200, """{"responses":[]}""")
      }
    })
    server.start()
    try test(base, patched, requests, urls) finally server.stop(0)
  }

  // ---- specs ------------------------------------------------------------

  test("http transport: per-datastream partitions, nextLink paging, 503 retry") {
    withServer { (base, _, _, _) =>
      val df = spark.read.format("graft.sources.sta")
        .option("path", base).option("transport", "http")
        .option("datastreams", "1,2").load()
      assert(df.rdd.getNumPartitions == 2) // one task per datastream
      val rows = df.select(Obs.IotId, Obs.DatastreamId, Obs.Result)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sortBy(_._1)
      assert(rows.map(_._1).toSeq == Seq(11L, 12L, 13L, 21L, 22L)) // both pages, both streams
      assert(rows.filter(_._2 == 1L).map(_._3).sum == 6.0)
    }
  }

  test("http transport: pushed time filter enforced end-to-end") {
    withServer { (base, _, _, _) =>
      val df = spark.read.format("graft.sources.sta")
        .option("path", base).option("transport", "http")
        .option("datastreams", "1,2").load()
      val cut = java.sql.Timestamp.valueOf("2024-01-01 00:15:00")
      val late = df.filter(col(Obs.Time) > lit(cut))
      assert(late.count() == 3) // obs 13 (ds1 page 2) + 21, 22
    }
  }

  test("$batch PATCH write-back batches per partition with wire codes") {
    withServer { (base, patched, _, _) =>
      import spark.implicits._
      val flagged = Seq((11L, graft.core.Flags.Bad), (12L, graft.core.Flags.Good),
        (13L, graft.core.Flags.Bad)).toDF(Obs.IotId, Obs.QcFlag)
        .withColumn(Obs.QcFlag, col(Obs.QcFlag).cast("tinyint"))
        .repartition(1)
      PatchSink.httpBatchSink(flagged, base.replace("/sta", "/batch"), batchSize = 2)
      val bodies = patched.toArray.map(_.toString)
      assert(bodies.length == 2, s"expected 2 batches, got ${bodies.length}") // 3 rows, batchSize 2
      val all = bodies.mkString
      assert(all.contains("Observations(11)") && all.contains("Observations(13)"))
      assert(all.contains("\"method\":\"patch\""))
    }
  }

  test("golden end-to-end: loopback FROST → HTTP source (pushed time " +
    "filter) → full §3.1 QC chain → $batch PATCH sink, equal to the " +
    "captured-file batch path") {
    withServer { (base, patched, _, urls) =>
      import graft.pipeline.QcMain
      import graft.ops.Geo
      // ---- LIVE path: HTTP source with a pushed time filter feeding
      // the whole lifecycle in one lineage
      val cut = java.sql.Timestamp.valueOf("2024-01-01 00:15:00")
      val live = spark.read.format("graft.sources.sta")
        .option("path", base).option("transport", "http")
        .option("datastreams", "1,2").load()
        .filter(col(Obs.Time) > lit(cut))
      val cfg = QcMain.Config(
        rangeBounds = Map(1L -> (0.0, 2.5), 2L -> (0.0, 4.5)),
        regions = Seq(Geo.BoxRegion("NORTH SEA", "SOUTHERN BIGHT",
          51.0, 52.0, 2.5, 3.5)))
      val (flaggedLive, _) = QcMain.runFrom(spark, live, cfg)
      val liveFlags = flaggedLive.select(col(Obs.IotId), col("flag"))
        .collect().map(r => r.getLong(0) -> r.getByte(1)).toMap
      flaggedLive.unpersist()
      // the time filter REACHED the server as OData (source pushdown in
      // the same run as the sink below, not a separate spec)
      assert(urls.toArray.exists(_.toString.contains("phenomenonTime gt")),
        s"no pushed time filter on the wire: ${urls.toArray.mkString(" | ")}")
      // only the filter-admitted rows flow through: 13 (ds1 page 2 —
      // so paging composed with pushdown too), 21, 22
      assert(liveFlags.keySet == Set(13L, 21L, 22L))
      // flags are non-degenerate: the range config splits good from bad
      assert(liveFlags(21L) != liveFlags(22L))

      // ---- live sink: the same flagged frame PATCHes back via $batch
      PatchSink.httpBatchSink(
        flaggedLive.withColumn(Obs.QcFlag, col("flag")).repartition(1),
        base.replace("/sta", "/batch"), batchSize = 2)
      val patchOps = "\"url\":\"Observations\\((\\d+)\\)\",\"body\":\\{\"resultQuality\":(\\d+)".r
        .findAllMatchIn(patched.toArray.mkString)
        .map(m => m.group(1).toLong -> m.group(2).toInt).toMap

      // ---- BATCH path: the identical payload as a captured response
      // file (what the same $filter query would have captured), through
      // the file entry + the patch-file sink
      val fixture = java.nio.file.Files.createTempFile("sta_golden", ".json")
      java.nio.file.Files.writeString(fixture,
        s"""{"Datastreams":[${dsJson(1, ds1page2)},${dsJson(2, ds2obs)}]}""")
      val patchDir = java.nio.file.Files.createTempDirectory("golden_patch").toString
      val (flaggedFile, _) = QcMain.run(spark, fixture.toString, cfg,
        patchOut = Some(patchDir))
      val fileFlags = flaggedFile.select(col(Obs.IotId), col("flag"))
        .collect().map(r => r.getLong(0) -> r.getByte(1)).toMap
      flaggedFile.unpersist()

      // the two transports agree flag-for-flag…
      assert(liveFlags == fileFlags,
        s"live=$liveFlags file=$fileFlags")
      // …and sink-for-sink: the wire PATCH ops equal the patch file
      val fileOps = spark.read.json(patchDir)
        .collect().map(r => r.getLong(r.fieldIndex("id")) ->
          r.getLong(r.fieldIndex("resultQuality")).toInt).toMap
      assert(patchOps == fileOps, s"wire=$patchOps file=$fileOps")
      assert(patchOps.keySet == Set(13L, 21L, 22L))
    }
  }

  test("get retries 5xx then fails fast on 4xx") {
    withServer { (base, _, requests, _) =>
      val before = requests.get()
      StaHttp.get(s"$base?probe=1") // 503 once, then 200
      assert(requests.get() - before == 2)
      intercept[StaHttp.HttpFailure] {
        // /nope has no context → 404 from the server → fail fast
        StaHttp.get(s"http://127.0.0.1:${new java.net.URI(base).getPort}/nope")
      }
    }
  }
}
