package graft.sources

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.security.MessageDigest

/** Driver-side download-and-cache for static reference resources — the
  * bathymetry grid and land shapefile the QC pipeline needs on every run
  * (reference `get_elev_netcdf` / `get_ne_10m_shp` calls,
  * `/root/reference/src/main.py:560,577,595`: ensure the file exists in
  * a local `resources/` folder, downloading once if missing).
  *
  * Semantics:
  *   - cache hit (file exists and matches the expected checksum, when
  *     given) → returns the path, no network touched;
  *   - miss → GET with [[graft.sources.sta.StaHttp]]-style retry, write
  *     to a temp file, verify the checksum BEFORE the atomic move into
  *     place — a torn or corrupted download can never be half-cached;
  *   - checksum mismatch on an existing file → re-download (a partial
  *     file from a killed previous run heals instead of poisoning every
  *     later run).
  *
  * Driver-only by design: reference resources are single files loaded
  * once and broadcast (via GridLoader / PolygonTable); executors never
  * fetch.
  */
object ResourceCache {

  def sha256Hex(bytes: Array[Byte]): String =
    MessageDigest.getInstance("SHA-256").digest(bytes)
      .map(b => f"${b & 0xff}%02x").mkString

  private def ok(p: Path, sha256: Option[String]): Boolean =
    Files.isRegularFile(p) && sha256.forall(
      _.equalsIgnoreCase(sha256Hex(Files.readAllBytes(p))))

  /** Ensure `url`'s content exists at `localFolder/fileName` and return
    * the path. `sha256` (hex) pins the content when given — checked on
    * both cache hits and fresh downloads.
    */
  def fetch(url: String, localFolder: String, fileName: String,
            sha256: Option[String] = None, retries: Int = 3): Path = {
    val dir = Paths.get(localFolder)
    Files.createDirectories(dir)
    val target = dir.resolve(fileName)
    if (ok(target, sha256)) return target

    var attempt = 0
    var lastErr = ""
    while (attempt < retries) {
      try {
        val conn = java.net.URI.create(url).toURL.openConnection()
          .asInstanceOf[java.net.HttpURLConnection]
        conn.setConnectTimeout(10000)
        conn.setReadTimeout(120000)
        val code = conn.getResponseCode
        if (code >= 200 && code < 300) {
          val in = conn.getInputStream
          val bytes = try in.readAllBytes() finally in.close()
          sha256.foreach { want =>
            val got = sha256Hex(bytes)
            require(want.equalsIgnoreCase(got),
              s"checksum mismatch for $url: expected $want, got $got")
          }
          val tmp = Files.createTempFile(dir, s".$fileName.", ".part")
          try {
            Files.write(tmp, bytes)
            Files.move(tmp, target, StandardCopyOption.REPLACE_EXISTING,
              StandardCopyOption.ATOMIC_MOVE)
          } finally Files.deleteIfExists(tmp)
          return target
        }
        val err = conn.getErrorStream
        if (err != null) {
          try { err.readAllBytes(); () } catch { case _: java.io.IOException => }
          finally err.close()
        }
        conn.disconnect()
        lastErr = s"HTTP $code"
        if (code < 500 && code != 429)
          throw new IllegalStateException(s"$lastErr for $url")
      } catch {
        case e: IllegalStateException => throw e
        case e: IllegalArgumentException => throw e // checksum mismatch: don't retry
        case e: java.io.IOException => lastErr = e.toString
      }
      attempt += 1
      if (attempt < retries) Thread.sleep(200L * attempt)
    }
    throw new IllegalStateException(s"download failed after $retries tries ($lastErr) for $url")
  }
}
