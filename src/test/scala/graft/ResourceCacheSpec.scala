package graft

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import graft.sources.ResourceCache
import org.scalatest.funsuite.AnyFunSuite

import java.net.InetSocketAddress
import java.nio.file.Files
import java.util.concurrent.atomic.AtomicInteger

/** Driver-side resource download-and-cache (the `get_elev_netcdf` /
  * `get_ne_10m_shp` lifecycle) against an in-JVM loopback HTTP server:
  * download once, serve every later call from disk, heal corrupted
  * cache entries, never cache a checksum-failed body.
  */
class ResourceCacheSpec extends AnyFunSuite {

  private val body = "fake-bathymetry-grid-bytes".getBytes("UTF-8")

  private def withServer(failFirst: Int = 0)(test: (String, AtomicInteger) => Unit): Unit = {
    val hits = new AtomicInteger(0)
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/grid.nc", (ex: HttpExchange) => {
      val n = hits.incrementAndGet()
      if (n <= failFirst) {
        ex.sendResponseHeaders(503, -1); ex.close()
      } else {
        ex.sendResponseHeaders(200, body.length)
        val os = ex.getResponseBody
        try os.write(body) finally os.close()
        ex.close()
      }
    })
    server.start()
    try test(s"http://127.0.0.1:${server.getAddress.getPort}/grid.nc", hits)
    finally server.stop(0)
  }

  test("downloads once, then serves from cache without touching the network") {
    withServer() { (url, hits) =>
      val dir = Files.createTempDirectory("graft_res").toString
      val sum = ResourceCache.sha256Hex(body)
      val p1 = ResourceCache.fetch(url, dir, "grid.nc", Some(sum))
      assert(Files.readAllBytes(p1).sameElements(body) && hits.get() == 1)
      val p2 = ResourceCache.fetch(url, dir, "grid.nc", Some(sum))
      assert(p2 == p1 && hits.get() == 1) // cache hit: no second request
    }
  }

  test("5xx retries then succeeds; corrupted cache entry re-downloads") {
    withServer(failFirst = 2) { (url, hits) =>
      val dir = Files.createTempDirectory("graft_res").toString
      val sum = ResourceCache.sha256Hex(body)
      val p = ResourceCache.fetch(url, dir, "grid.nc", Some(sum))
      assert(Files.readAllBytes(p).sameElements(body) && hits.get() == 3)
      // corrupt the cached file: the checksum miss must trigger a re-fetch
      Files.write(p, "torn-partial-write".getBytes)
      val p2 = ResourceCache.fetch(url, dir, "grid.nc", Some(sum))
      assert(Files.readAllBytes(p2).sameElements(body) && hits.get() == 4)
    }
  }

  test("checksum mismatch on download fails and caches nothing") {
    withServer() { (url, _) =>
      val dir = Files.createTempDirectory("graft_res")
      intercept[IllegalArgumentException](
        ResourceCache.fetch(url, dir.toString, "grid.nc",
          Some("00" * 32)))
      // nothing (not even a .part temp) may be left behind
      assert(Files.list(dir).count() == 0)
    }
  }

  test("no checksum: plain existence is a cache hit") {
    withServer() { (url, hits) =>
      val dir = Files.createTempDirectory("graft_res").toString
      ResourceCache.fetch(url, dir, "grid.nc")
      ResourceCache.fetch(url, dir, "grid.nc")
      assert(hits.get() == 1)
    }
  }
}
