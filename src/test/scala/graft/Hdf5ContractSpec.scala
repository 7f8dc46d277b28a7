package graft

import java.nio.file.{Files, Paths}
import org.scalatest.matchers.should.Matchers

/** The CONTRACT for the HDF5 profile the reader does NOT support
  * (round-12 verdict #6, "close the profile" arm): each remaining
  * unsupported form must fail LOUDLY — an exception naming the
  * limitation (and the `nccopy` escape hatch where one exists) —
  * never a misparse. Every test here takes a file the reader decodes
  * happily, corrupts exactly one structural byte into the unsupported
  * form, and pins the refusal text.
  *
  * Enumerated hatches (the reader's full out-of-scope list lives in
  * the `Hdf5Reader` scaladoc):
  *   - filtered link fractal heaps (FRHP I/O filter length > 0)
  *   - filtered huge objects (type-2/4 huge v2 B-trees)
  *   - external links (link type 64)
  *   - files >= 2 GiB (in-memory reader)
  *   - indirect-within-indirect heap rows, shared-message superblock
  *     extensions, unknown filters: pinned by GeoLoadersSpec fixtures
  */
class Hdf5ContractSpec extends SparkSpec with Matchers {

  private val lat = Array(10.0, 10.5, 11.0, 11.5)
  private val lon = Array(20.0, 20.25, 20.5, 20.75, 21.0)
  private val packed = Array.tabulate(20)(k => ((k * 0.5 - 1.0 - 2.0) / 0.5).toFloat)
  private val atts = Seq("scale_factor" -> 0.5, "add_offset" -> 2.0)

  /** A dense-root fixture with an indirect huge link (has FRHP + both
    * v2 B-trees), written fresh per test so byte surgery can't leak.
    */
  private def denseFixture(): String = {
    val p = Files.createTempFile("graft_h5contract", ".nc").toString
    MiniHdf5.writeGridV2(p, "temperature", lat, lon, packed,
      chunkRows = 3, chunkCols = 2, deflate = false, shuffle = false,
      atts = atts, denseRoot = true, denseIdWide = true, denseIdLen = 16,
      denseExtraLinks = 1, hugeNames = Set("x00"), hugeIndirect = true,
      softLinks = Seq(("al", "/lat")))
    // sanity: the uncorrupted form decodes
    assert(graft.sources.geo.Hdf5Reader.open(p).datasets.contains("x00"))
    p
  }

  private def indexOfBytes(hay: Array[Byte], needle: Array[Byte],
                           from: Int = 0): Int = {
    var i = from
    while (i <= hay.length - needle.length) {
      if (needle.indices.forall(j => hay(i + j) == needle(j))) return i
      i += 1
    }
    -1
  }

  private def corrupt(p: String)(mutate: Array[Byte] => Unit): String = {
    val bytes = Files.readAllBytes(Paths.get(p))
    mutate(bytes)
    val out = Files.createTempFile("graft_h5corrupt", ".nc")
    Files.write(out, bytes)
    out.toString
  }

  test("filtered link heap (FRHP io-filter length > 0) refuses loudly") {
    val p = denseFixture()
    val bad = corrupt(p) { b =>
      val at = indexOfBytes(b, "FRHP".getBytes("US-ASCII"))
      at should be > 0
      // FRHP: sig(4) version(1) heapIdLen(2) ioFilterLen(2) — set the
      // filter length's low byte
      b(at + 7) = 1
    }
    val e = intercept[IllegalArgumentException](
      graft.sources.geo.Hdf5Reader.open(bad))
    e.getMessage should include("filtered link heap unsupported")
  }

  test("filtered huge objects (type-2/4 huge v2 B-tree) refuse in the " +
    "type check, naming expected types") {
    val p = denseFixture()
    val bad = corrupt(p) { b =>
      // the huge-object index is the BTHD with type byte 1 (the name
      // index is type 5); flip it to 2 = "huge filtered indirect"
      var at = indexOfBytes(b, "BTHD".getBytes("US-ASCII"))
      var found = false
      while (at >= 0 && !found) {
        if (b(at + 5) == 1) { b(at + 5) = 2; found = true }
        else at = indexOfBytes(b, "BTHD".getBytes("US-ASCII"), at + 1)
      }
      found shouldBe true
    }
    val e = intercept[IllegalArgumentException](
      graft.sources.geo.Hdf5Reader.open(bad))
    e.getMessage should include("v2 B-tree type 2")
  }

  test("external links (link type 64) refuse loudly, naming the " +
    "nccopy flatten hatch") {
    val p = denseFixture()
    val bad = corrupt(p) { b =>
      // the soft link message for "al": version 1, flags 0x08 (type
      // field present, 1-byte name length), type 1, len 2, 'a', 'l' —
      // rewrite the type byte to 64 (external link)
      val at = indexOfBytes(b,
        Array[Byte](1, 0x08, 1, 2, 'a'.toByte, 'l'.toByte))
      at should be > 0
      b(at + 2) = 64
    }
    val e = intercept[IllegalArgumentException](
      graft.sources.geo.Hdf5Reader.open(bad))
    e.getMessage should include("external links")
    e.getMessage should include("nccopy")
  }

  test("files >= 2 GiB refuse up front (in-memory reader), naming the " +
    "subsetting hatches") {
    val p = Files.createTempFile("graft_h5big", ".nc").toString
    val raf = new java.io.RandomAccessFile(p, "rw")
    try raf.setLength(Int.MaxValue.toLong + 1) // sparse: no real 2 GiB
    finally raf.close()
    val e = intercept[IllegalArgumentException](
      graft.sources.geo.Hdf5Reader.open(p))
    e.getMessage should include("< 2 GiB")
    e.getMessage should include("nccopy")
  }
}
