package graft

import java.nio.{ByteBuffer, ByteOrder}

/** Test-only netCDF-4-style HDF5 encoder, written byte-by-byte from the
  * public HDF5 File Format Specification (independently of
  * `Hdf5Reader`'s parsing code): superblock v0, v1 object headers,
  * an old-style root group (Symbol Table message → v1 B-tree → SNOD →
  * local heap), and three datasets — `lat` (f64), `lon` (f64), and a
  * 2-D f32 grid variable, either contiguous ([[writeGrid]]) or chunked
  * with shuffle+deflate filters and decoding-convention attributes
  * ([[writeGridChunked]]). These are the layout profiles netcdf-c emits
  * for small and for real (compressed) grids, which is exactly what the
  * reader claims to support.
  */
object MiniHdf5 {

  /** Bob Jenkins' lookup3 `hashlittle` (public domain) — the name hash
    * HDF5 stores in v2 B-tree link-name records. The reader enumerates
    * without hash lookups, but the fixture writes the REAL hash so a
    * hash-based search would find these records too. Pinned by the
    * published self-test vectors in `Lookup3HashSpec`.
    */
  private[graft] def lookup3(key: Array[Byte], init: Int = 0): Int = {
    def rot(x: Int, k: Int) = Integer.rotateLeft(x, k)
    var a = 0xdeadbeef + key.length + init
    var b = a; var c = a
    var off = 0; var len = key.length
    def word(i: Int, n: Int): Int = {
      var v = 0; var j = n - 1
      while (j >= 0) { v = (v << 8) | (key(i + j) & 0xff); j -= 1 }
      v
    }
    while (len > 12) {
      a += word(off, 4); b += word(off + 4, 4); c += word(off + 8, 4)
      a -= c; a ^= rot(c, 4); c += b
      b -= a; b ^= rot(a, 6); a += c
      c -= b; c ^= rot(b, 8); b += a
      a -= c; a ^= rot(c, 16); c += b
      b -= a; b ^= rot(a, 19); a += c
      c -= b; c ^= rot(b, 4); b += a
      off += 12; len -= 12
    }
    if (len > 0) {
      if (len > 8) {
        a += word(off, 4); b += word(off + 4, 4); c += word(off + 8, len - 8)
      } else if (len > 4) {
        a += word(off, 4); b += word(off + 4, len - 4)
      } else a += word(off, len)
      c ^= b; c -= rot(b, 14)
      a ^= c; a -= rot(c, 11)
      b ^= a; b -= rot(a, 25)
      c ^= b; c -= rot(b, 16)
      a ^= c; a -= rot(c, 4)
      b ^= a; b -= rot(a, 14)
      c ^= b; c -= rot(b, 24)
    }
    c
  }

  /** Shared v2 B-tree emitter, any depth — node capacity geometry per
    * the spec (and the library): 10-byte node frame, child pointer =
    * 8 (address) + maxNrecSize + (child internal: cumMaxNrecSize of the
    * child depth). Depth = smallest whose cumulative capacity holds the
    * records; records distribute in order with one separator record
    * between children; every node owns `nodeSize` bytes of file space.
    */
  private final class Bt2(nodeSize: Int, recSize: Int, btType: Int,
                          nRecs: Int) {
    private def log2Floor(v: Long): Int =
      63 - java.lang.Long.numberOfLeadingZeros(v)
    private val maxLeaf = (nodeSize - 10L) / recSize
    require(maxLeaf > 0, s"B-tree node size $nodeSize too small")
    val maxNrecSize: Int = log2Floor(maxLeaf) / 8 + 1
    private val maxNrecAt = scala.collection.mutable.ArrayBuffer(maxLeaf)
    private val cumMax = scala.collection.mutable.ArrayBuffer(maxLeaf)
    private val cumSz = scala.collection.mutable.ArrayBuffer(0)
    private def ensureDepth(d: Int): Unit = while (cumMax.length <= d) {
      val u = cumMax.length
      val ptr = 8 + maxNrecSize + cumSz(u - 1)
      val mn = (nodeSize - 10L - ptr) / (recSize + ptr)
      require(mn > 0, s"node size $nodeSize too small for depth $u")
      maxNrecAt += mn
      cumMax += (mn + 1) * cumMax(u - 1) + mn
      cumSz += log2Floor(cumMax(u)) / 8 + 1
    }
    val depth: Int = {
      var d = 0
      while (cumMax(d) < nRecs) { d += 1; ensureDepth(d) }
      d
    }
    private case class N(recs: Seq[Int], kids: Seq[N]) {
      def nNodes: Int = 1 + kids.map(_.nNodes).sum
      def nRecsTot: Long = recs.length + kids.map(_.nRecsTot).sum
    }
    private def build(idx: Seq[Int], d: Int): N =
      if (d == 0) N(idx, Nil)
      else {
        val cap = cumMax(d - 1)
        var c = 2
        while (c - 1 + c * cap < idx.length) c += 1
        require(c - 1 <= maxNrecAt(d), "B-tree shape overflow")
        val childRecs = idx.length - (c - 1)
        val base = childRecs / c; val extra = childRecs % c
        var pos = 0
        val groups = (0 until c).map { g =>
          val sz = base + (if (g < extra) 1 else 0)
          val kid = idx.slice(pos, pos + sz); pos += sz
          val sep = if (g < c - 1) { val s = idx(pos); pos += 1; s } else -1
          (kid, sep)
        }
        N(groups.init.map(_._2), groups.map(g => build(g._1, d - 1)))
      }
    private val root = build(0 until nRecs, depth)
    val nodesLen: Int = root.nNodes * nodeSize
    val rootNrec: Int = root.recs.length

    /** BTHD bytes pointing at `rootAddr` (checksum structural). */
    def header(rootAddr: Long): Array[Byte] = {
      val b = ByteBuffer.allocate(40).order(ByteOrder.LITTLE_ENDIAN)
      b.put("BTHD".getBytes("US-ASCII")); b.put(0.toByte)
      b.put(btType.toByte)
      b.putInt(nodeSize)
      b.putShort(recSize.toShort)
      b.putShort(depth.toShort)
      b.put(100.toByte); b.put(40.toByte) // split / merge percents
      b.putLong(rootAddr)
      b.putShort(rootNrec.toShort)
      b.putLong(nRecs.toLong)
      b.putInt(0)
      val out = new Array[Byte](b.position()); b.rewind(); b.get(out); out
    }

    /** Emit every node starting at `nodesAddr` (children DFS after
      * their parent); `recBytes(buf, k)` writes record k's bytes.
      */
    def emit(buf: ByteBuffer, nodesAddr: Long,
             recBytes: (ByteBuffer, Int) => Unit): Unit = {
      def putUintLE(v: Long, nB: Int): Unit =
        (0 until nB).foreach(i => buf.put(((v >>> (8 * i)) & 0xff).toByte))
      def emitN(n: N, d: Int, addr: Long): Unit = {
        buf.position(addr.toInt)
        buf.put((if (d == 0) "BTLF" else "BTIN").getBytes("US-ASCII"))
        buf.put(0.toByte); buf.put(btType.toByte)
        n.recs.foreach(recBytes(buf, _))
        if (d > 0) {
          var ca = addr + nodeSize
          n.kids.foreach { k =>
            buf.putLong(ca)
            putUintLE(k.recs.length.toLong, maxNrecSize)
            if (d >= 2) putUintLE(k.nRecsTot, cumSz(d - 1))
            ca += k.nNodes.toLong * nodeSize
          }
        }
        buf.putInt(0) // checksum (structural)
        if (d > 0) {
          var ca = addr + nodeSize
          n.kids.foreach { k =>
            emitN(k, d - 1, ca); ca += k.nNodes.toLong * nodeSize
          }
        }
      }
      emitN(root, depth, nodesAddr)
    }
  }

  def writeGrid(path: String, varName: String,
                lat: Array[Double], lon: Array[Double],
                values: Array[Float],
                softLink: Option[(String, String)] = None): Unit = {
    require(values.length == lat.length * lon.length)

    def align8(n: Int): Int = (n + 7) & ~7

    // ---- layout plan (addresses fixed up front) ----
    val superblock = 96
    val rootHdr = superblock                   // 16 prefix + (8+16) symtab msg
    val rootHdrLen = 16 + 24
    val heapHdr = rootHdr + rootHdrLen         // 32-byte local heap header
    // heap data: off 0 = "" (root link), then the entry names (plus the
    // soft-link target string, stored like a name), 8-aligned
    val names = Seq(varName, "lat", "lon").sorted // SNOD entries sort by name
    val entries = (names ++ softLink.map(_._1)).sorted
    val nameOffs = scala.collection.mutable.LinkedHashMap.empty[String, Int]
    var heapOff = 8
    entries.foreach { n => nameOffs(n) = heapOff; heapOff += align8(n.length + 1) }
    val softValOff = softLink.map { case (_, target) =>
      val off = heapOff; heapOff += align8(target.length + 1); off
    }
    val heapDataLen = align8(heapOff)
    val heapData = heapHdr + 32
    val btree = heapData + heapDataLen         // 24 + key/child/key = 48
    val snod = btree + 48                      // 8 + entries×40
    val snodLen = 8 + entries.length * 40
    // dataset headers: prefix 16 + dataspace msg + datatype msg + layout msg
    def dsHdrLen(ndims: Int) = 16 + (8 + align8(8 + ndims * 8)) + (8 + 24) + (8 + 24)
    val hdrAddrs = scala.collection.mutable.LinkedHashMap.empty[String, Int]
    var cursor = snod + snodLen
    names.foreach { n =>
      hdrAddrs(n) = cursor
      cursor += dsHdrLen(if (n == varName) 2 else 1)
    }
    val dataAddrs = scala.collection.mutable.LinkedHashMap.empty[String, Int]
    names.foreach { n =>
      dataAddrs(n) = cursor
      cursor += align8(dataBytes(n))
    }
    def dataBytes(n: String): Int =
      if (n == varName) values.length * 4
      else if (n == "lat") lat.length * 8 else lon.length * 8
    val eof = cursor

    val buf = ByteBuffer.allocate(eof).order(ByteOrder.LITTLE_ENDIAN)
    val Undef = -1L

    // ---- superblock v0 ----
    buf.put(Array[Byte](0x89.toByte, 'H', 'D', 'F', 0x0d, 0x0a, 0x1a, 0x0a))
    buf.put(0.toByte)       // superblock version
    buf.put(0.toByte)       // free-space version
    buf.put(0.toByte)       // root symbol table version
    buf.put(0.toByte)       // reserved
    buf.put(0.toByte)       // shared header message version
    buf.put(8.toByte)       // size of offsets
    buf.put(8.toByte)       // size of lengths
    buf.put(0.toByte)       // reserved
    buf.putShort(4)         // group leaf node k
    buf.putShort(16)        // group internal node k
    buf.putInt(0)           // file consistency flags
    buf.putLong(0L)         // base address
    buf.putLong(Undef)      // free-space info
    buf.putLong(eof.toLong) // end of file
    buf.putLong(Undef)      // driver info
    // root symbol table entry (cache type 0 → reader uses the message)
    buf.putLong(0L); buf.putLong(rootHdr.toLong)
    buf.putInt(0); buf.putInt(0)
    buf.putLong(0L); buf.putLong(0L) // scratch

    // ---- root object header v1: one Symbol Table message ----
    def msgHeader(typ: Int, size: Int): Unit = {
      buf.putShort(typ.toShort); buf.putShort(size.toShort)
      buf.put(0.toByte); buf.put(0.toByte); buf.put(0.toByte); buf.put(0.toByte)
    }
    assert(buf.position() == rootHdr)
    buf.put(1.toByte); buf.put(0.toByte) // version, reserved
    buf.putShort(1)                      // message count
    buf.putInt(1)                        // reference count
    buf.putInt(24)                       // header data size
    buf.putInt(0)                        // pad to 8-align the messages
    msgHeader(0x0011, 16)
    buf.putLong(btree.toLong)
    buf.putLong(heapHdr.toLong) // the heap HEADER address, not its data segment

    // ---- local heap ----
    assert(buf.position() == heapHdr)
    buf.put("HEAP".getBytes("US-ASCII"))
    buf.put(0.toByte); buf.put(0.toByte); buf.put(0.toByte); buf.put(0.toByte)
    buf.putLong(heapDataLen.toLong) // data segment size
    buf.putLong(heapDataLen.toLong) // free list head (≥ size = none)
    buf.putLong(heapData.toLong)    // data segment address
    assert(buf.position() == heapData)
    val heapSeg = new Array[Byte](heapDataLen)
    nameOffs.foreach { case (n, off) =>
      System.arraycopy(n.getBytes("US-ASCII"), 0, heapSeg, off, n.length)
    }
    softLink.foreach { case (_, target) =>
      System.arraycopy(target.getBytes("US-ASCII"), 0, heapSeg,
        softValOff.get, target.length)
    }
    buf.put(heapSeg)

    // ---- group B-tree v1 (level 0, one SNOD child) ----
    assert(buf.position() == btree)
    buf.put("TREE".getBytes("US-ASCII"))
    buf.put(0.toByte)  // node type: group
    buf.put(0.toByte)  // level: leaf
    buf.putShort(1)    // entries used
    buf.putLong(Undef); buf.putLong(Undef) // siblings
    buf.putLong(nameOffs(entries.head).toLong) // key 0
    buf.putLong(snod.toLong)                   // child 0
    buf.putLong(nameOffs(entries.last).toLong) // key 1

    // ---- SNOD with the entries (name-sorted; a soft link is cache
    // type 2 with its link-value heap offset in scratch word 0) ----
    assert(buf.position() == snod)
    buf.put("SNOD".getBytes("US-ASCII"))
    buf.put(1.toByte); buf.put(0.toByte)
    buf.putShort(entries.length.toShort)
    entries.foreach { n =>
      val isSoft = softLink.exists(_._1 == n)
      buf.putLong(nameOffs(n).toLong)
      buf.putLong(if (isSoft) Undef else hdrAddrs(n).toLong)
      buf.putInt(if (isSoft) 2 else 0); buf.putInt(0)
      buf.putLong(if (isSoft) softValOff.get.toLong else 0L)
      buf.putLong(0L)
    }
    buf.position(snod + snodLen)

    // ---- dataset object headers ----
    names.foreach { n =>
      val twoD = n == varName
      val ndims = if (twoD) 2 else 1
      assert(buf.position() == hdrAddrs(n))
      val spaceData = align8(8 + ndims * 8)
      buf.put(1.toByte); buf.put(0.toByte)
      buf.putShort(3)
      buf.putInt(1)
      buf.putInt((8 + spaceData) + (8 + 24) + (8 + 24))
      buf.putInt(0)
      // dataspace v1
      msgHeader(0x0001, spaceData)
      buf.put(1.toByte)            // version
      buf.put(ndims.toByte)        // dimensionality
      buf.put(0.toByte)            // flags: no max dims
      buf.put(0.toByte); buf.putInt(0) // reserved ×5
      if (twoD) { buf.putLong(lat.length.toLong); buf.putLong(lon.length.toLong) }
      else buf.putLong((if (n == "lat") lat.length else lon.length).toLong)
      // datatype: IEEE float, little-endian
      val f32 = twoD
      msgHeader(0x0003, 24)
      buf.put(0x11.toByte)         // version 1, class 1 (float)
      buf.put(0x20.toByte)         // bit field: LE, implied-msb mantissa norm
      buf.put((if (f32) 31 else 63).toByte) // sign bit position
      buf.put(0.toByte)
      buf.putInt(if (f32) 4 else 8)
      buf.putShort(0)              // bit offset
      buf.putShort((if (f32) 32 else 64).toShort) // precision
      buf.put((if (f32) 23 else 52).toByte)  // exponent location
      buf.put((if (f32) 8 else 11).toByte)   // exponent size
      buf.put(0.toByte)                      // mantissa location
      buf.put((if (f32) 23 else 52).toByte)  // mantissa size
      buf.putInt(if (f32) 127 else 1023)     // exponent bias
      // pad datatype data to 24
      buf.putInt(0)
      // data layout v3, contiguous
      msgHeader(0x0008, 24)
      buf.put(3.toByte); buf.put(1.toByte)
      buf.putLong(dataAddrs(n).toLong)
      buf.putLong(dataBytes(n).toLong)
      buf.putInt(0); buf.putShort(0) // pad 18 → 24
    }

    // ---- raw data ----
    names.foreach { n =>
      buf.position(dataAddrs(n))
      if (n == varName) values.foreach(buf.putFloat)
      else if (n == "lat") lat.foreach(buf.putDouble)
      else lon.foreach(buf.putDouble)
    }

    java.nio.file.Files.write(java.nio.file.Paths.get(path), buf.array())
  }

  /** Chunked + (optionally) shuffle/deflate-filtered variant, with
    * netCDF decoding-convention attributes on the grid variable. The
    * `packed` values are written raw; a correct reader must apply
    * `atts`' scale_factor/add_offset/_FillValue itself. Chunk grid may
    * not divide the dims — edge chunks are written full-size with
    * padding, as HDF5 does.
    */
  def writeGridChunked(path: String, varName: String,
                       lat: Array[Double], lon: Array[Double],
                       packed: Array[Float],
                       chunkRows: Int, chunkCols: Int,
                       deflate: Boolean, shuffle: Boolean,
                       atts: Seq[(String, Double)]): Unit = {
    val nLat = lat.length; val nLon = lon.length
    require(packed.length == nLat * nLon)
    def align8(n: Int): Int = (n + 7) & ~7
    val Undef = -1L

    // ---- chunk payloads, filters applied in write order ----
    val nCr = (nLat + chunkRows - 1) / chunkRows
    val nCc = (nLon + chunkCols - 1) / chunkCols
    val chunkList = for (cr <- 0 until nCr; cc <- 0 until nCc) yield {
      val full = ByteBuffer.allocate(chunkRows * chunkCols * 4)
        .order(ByteOrder.LITTLE_ENDIAN)
      for (i <- 0 until chunkRows; j <- 0 until chunkCols) {
        val gi = cr * chunkRows + i; val gj = cc * chunkCols + j
        full.putFloat(if (gi < nLat && gj < nLon) packed(gi * nLon + gj) else 0f)
      }
      var data = full.array()
      if (shuffle) { // byte transpose: all byte-0s, then byte-1s, …
        val es = 4; val n = data.length / es
        val out = new Array[Byte](data.length)
        for (i <- 0 until n; j <- 0 until es) out(j * n + i) = data(i * es + j)
        data = out
      }
      if (deflate) {
        val d = new java.util.zip.Deflater()
        d.setInput(data); d.finish()
        val tmp = new Array[Byte](data.length * 2 + 64)
        val m = d.deflate(tmp); d.end()
        data = java.util.Arrays.copyOf(tmp, m)
      }
      (cr * chunkRows.toLong, cc * chunkCols.toLong, data)
    }

    // ---- filter pipeline v1 sizing (names padded to 8, client pad) ----
    final case class F(id: Int, name: String, client: Seq[Int])
    val filters = (if (shuffle) Seq(F(2, "shuffle", Seq(4))) else Nil) ++
      (if (deflate) Seq(F(1, "deflate", Seq(6))) else Nil)
    def fEntryLen(f: F): Int =
      8 + align8(f.name.length + 1) + 4 * f.client.length +
        (if (f.client.length % 2 == 1) 4 else 0)
    val fltDataLen = if (filters.isEmpty) 0 else 8 + filters.map(fEntryLen).sum
    // attribute v1: fixed header 8 + padded name + datatype(24) +
    // scalar dataspace(8) + f64 value(8)
    def attLen(name: String): Int = 8 + align8(name.length + 1) + 24 + 8 + 8

    // ---- layout plan ----
    val superblock = 96
    val rootHdr = superblock
    val rootHdrLen = 16 + 24
    val heapHdr = rootHdr + rootHdrLen
    val names = Seq(varName, "lat", "lon").sorted
    val nameOffs = scala.collection.mutable.LinkedHashMap.empty[String, Int]
    var heapOff = 8
    names.foreach { n => nameOffs(n) = heapOff; heapOff += align8(n.length + 1) }
    val heapDataLen = align8(heapOff)
    val heapData = heapHdr + 32
    val btree = heapData + heapDataLen
    val snod = btree + 48
    val coordHdrLen = 16 + (8 + 16) + (8 + 24) + (8 + 24)
    val varMsgsLen = (8 + 24) + (8 + 24) + (8 + 24) +
      (if (filters.isEmpty) 0 else 8 + fltDataLen) +
      atts.map(a => 8 + attLen(a._1)).sum
    val hdrAddrs = scala.collection.mutable.LinkedHashMap.empty[String, Int]
    var cursor = snod + 128
    names.foreach { n =>
      hdrAddrs(n) = cursor
      cursor += (if (n == varName) 16 + varMsgsLen else coordHdrLen)
    }
    val keyLen = 8 + 3 * 8 // size+mask, (rank+1) offsets
    val chunkBtree = cursor
    cursor += 24 + chunkList.length * (keyLen + 8) + keyLen
    val chunkAddrs = chunkList.map { c =>
      val a = cursor; cursor += c._3.length; a }
    cursor = align8(cursor)
    val latAddr = cursor; cursor += nLat * 8
    val lonAddr = cursor; cursor += nLon * 8
    val eof = cursor

    val buf = ByteBuffer.allocate(eof).order(ByteOrder.LITTLE_ENDIAN)

    def msgHeader(typ: Int, size: Int): Unit = {
      buf.putShort(typ.toShort); buf.putShort(size.toShort)
      buf.put(0.toByte); buf.put(0.toByte); buf.put(0.toByte); buf.put(0.toByte)
    }
    def putPaddedName(n: String): Unit = {
      val bytes = n.getBytes("US-ASCII")
      buf.put(bytes)
      (bytes.length until align8(bytes.length + 1)).foreach(_ => buf.put(0.toByte))
    }
    def putFloatDatatype(f32: Boolean): Unit = { // 24 bytes incl padding
      buf.put(0x11.toByte)
      buf.put(0x20.toByte)
      buf.put((if (f32) 31 else 63).toByte)
      buf.put(0.toByte)
      buf.putInt(if (f32) 4 else 8)
      buf.putShort(0)
      buf.putShort((if (f32) 32 else 64).toShort)
      buf.put((if (f32) 23 else 52).toByte)
      buf.put((if (f32) 8 else 11).toByte)
      buf.put(0.toByte)
      buf.put((if (f32) 23 else 52).toByte)
      buf.putInt(if (f32) 127 else 1023)
      buf.putInt(0)
    }

    // ---- superblock v0 + root STE ----
    buf.put(Array[Byte](0x89.toByte, 'H', 'D', 'F', 0x0d, 0x0a, 0x1a, 0x0a))
    buf.put(0.toByte); buf.put(0.toByte); buf.put(0.toByte); buf.put(0.toByte)
    buf.put(0.toByte)
    buf.put(8.toByte); buf.put(8.toByte); buf.put(0.toByte)
    buf.putShort(4); buf.putShort(16)
    buf.putInt(0)
    buf.putLong(0L); buf.putLong(Undef); buf.putLong(eof.toLong); buf.putLong(Undef)
    buf.putLong(0L); buf.putLong(rootHdr.toLong)
    buf.putInt(0); buf.putInt(0)
    buf.putLong(0L); buf.putLong(0L)

    // ---- root object header: Symbol Table message ----
    assert(buf.position() == rootHdr)
    buf.put(1.toByte); buf.put(0.toByte)
    buf.putShort(1); buf.putInt(1); buf.putInt(24); buf.putInt(0)
    msgHeader(0x0011, 16)
    buf.putLong(btree.toLong); buf.putLong(heapHdr.toLong)

    // ---- local heap ----
    assert(buf.position() == heapHdr)
    buf.put("HEAP".getBytes("US-ASCII"))
    buf.putInt(0)
    buf.putLong(heapDataLen.toLong); buf.putLong(heapDataLen.toLong)
    buf.putLong(heapData.toLong)
    val heapSeg = new Array[Byte](heapDataLen)
    nameOffs.foreach { case (n, off) =>
      System.arraycopy(n.getBytes("US-ASCII"), 0, heapSeg, off, n.length) }
    buf.put(heapSeg)

    // ---- group B-tree + SNOD ----
    assert(buf.position() == btree)
    buf.put("TREE".getBytes("US-ASCII"))
    buf.put(0.toByte); buf.put(0.toByte)
    buf.putShort(1)
    buf.putLong(Undef); buf.putLong(Undef)
    buf.putLong(nameOffs(names.head).toLong)
    buf.putLong(snod.toLong)
    buf.putLong(nameOffs(names.last).toLong)
    assert(buf.position() == snod)
    buf.put("SNOD".getBytes("US-ASCII"))
    buf.put(1.toByte); buf.put(0.toByte)
    buf.putShort(names.length.toShort)
    names.foreach { n =>
      buf.putLong(nameOffs(n).toLong); buf.putLong(hdrAddrs(n).toLong)
      buf.putInt(0); buf.putInt(0); buf.putLong(0L); buf.putLong(0L)
    }
    buf.position(snod + 128)

    // ---- dataset headers ----
    names.foreach { n =>
      assert(buf.position() == hdrAddrs(n))
      if (n == varName) {
        val nMess = 3 + (if (filters.isEmpty) 0 else 1) + atts.length
        buf.put(1.toByte); buf.put(0.toByte)
        buf.putShort(nMess.toShort)
        buf.putInt(1)
        buf.putInt(varMsgsLen)
        buf.putInt(0)
        // dataspace v1, 2-D
        msgHeader(0x0001, 24)
        buf.put(1.toByte); buf.put(2.toByte); buf.put(0.toByte)
        buf.put(0.toByte); buf.putInt(0)
        buf.putLong(nLat.toLong); buf.putLong(nLon.toLong)
        // datatype f32
        msgHeader(0x0003, 24)
        putFloatDatatype(f32 = true)
        // layout v3 chunked: rank+1 dims, last = element size
        msgHeader(0x0008, 24)
        buf.put(3.toByte); buf.put(2.toByte)
        buf.put(3.toByte)
        buf.putLong(chunkBtree.toLong)
        buf.putInt(chunkRows); buf.putInt(chunkCols); buf.putInt(4)
        buf.put(0.toByte) // pad 23 → 24
        // filter pipeline v1
        if (filters.nonEmpty) {
          msgHeader(0x000B, fltDataLen)
          buf.put(1.toByte); buf.put(filters.length.toByte)
          buf.putShort(0); buf.putInt(0)
          filters.foreach { f =>
            buf.putShort(f.id.toShort)
            buf.putShort(align8(f.name.length + 1).toShort)
            buf.putShort(if (f.id == 1) 1.toShort else 0.toShort) // optional flag
            buf.putShort(f.client.length.toShort)
            putPaddedName(f.name)
            f.client.foreach(buf.putInt)
            if (f.client.length % 2 == 1) buf.putInt(0)
          }
        }
        // attributes v1: f64 scalar values
        atts.foreach { case (attName, value) =>
          msgHeader(0x000C, attLen(attName))
          buf.put(1.toByte); buf.put(0.toByte)
          buf.putShort((attName.length + 1).toShort)
          buf.putShort(24)
          buf.putShort(8)
          putPaddedName(attName)
          putFloatDatatype(f32 = false)
          buf.put(1.toByte); buf.put(0.toByte); buf.put(0.toByte) // scalar space
          buf.put(0.toByte); buf.putInt(0)
          buf.putDouble(value)
        }
      } else {
        val oneD = if (n == "lat") lat else lon
        buf.put(1.toByte); buf.put(0.toByte)
        buf.putShort(3); buf.putInt(1)
        buf.putInt((8 + 16) + (8 + 24) + (8 + 24))
        buf.putInt(0)
        msgHeader(0x0001, 16)
        buf.put(1.toByte); buf.put(1.toByte); buf.put(0.toByte)
        buf.put(0.toByte); buf.putInt(0)
        buf.putLong(oneD.length.toLong)
        msgHeader(0x0003, 24)
        putFloatDatatype(f32 = false)
        msgHeader(0x0008, 24)
        buf.put(3.toByte); buf.put(1.toByte)
        buf.putLong((if (n == "lat") latAddr else lonAddr).toLong)
        buf.putLong(oneD.length * 8L)
        buf.putInt(0); buf.putShort(0)
      }
    }

    // ---- chunk index: one leaf v1 B-tree node, type 1 ----
    assert(buf.position() == chunkBtree)
    buf.put("TREE".getBytes("US-ASCII"))
    buf.put(1.toByte) // node type: raw data chunk
    buf.put(0.toByte) // level: leaf
    buf.putShort(chunkList.length.toShort)
    buf.putLong(Undef); buf.putLong(Undef)
    chunkList.zip(chunkAddrs).foreach { case ((offR, offC, data), addr) =>
      buf.putInt(data.length)
      buf.putInt(0) // filter mask: none skipped
      buf.putLong(offR); buf.putLong(offC); buf.putLong(0L)
      buf.putLong(addr.toLong)
    }
    // final key: one past the last chunk in each dimension
    buf.putInt(0); buf.putInt(0)
    buf.putLong(nCr.toLong * chunkRows); buf.putLong(nCc.toLong * chunkCols)
    buf.putLong(0L)

    // ---- raw chunk + coordinate data ----
    chunkList.zip(chunkAddrs).foreach { case ((_, _, data), addr) =>
      buf.position(addr); buf.put(data) }
    buf.position(latAddr); lat.foreach(buf.putDouble)
    buf.position(lonAddr); lon.foreach(buf.putDouble)

    java.nio.file.Files.write(java.nio.file.Paths.get(path), buf.array())
  }

  /** Latest-file-format variant (what `H5F_LIBVER_LATEST` / recent h5py
    * defaults produce): superblock v3, v2 ("OHDR") object headers with
    * compact Link messages in the root group, v2 filter pipeline, v3
    * attributes, and VERSION-4 data layouts — the grid variable chunked
    * under a Fixed Array index (or a Single Chunk index when one chunk
    * covers the grid), `lat` contiguous v4, `lon` contiguous v3 (a
    * legal mix — message versions are per-message). Checksums are
    * written as zeros: the reader accounts for them structurally, the
    * same stance it takes on fletcher32.
    */
  def writeGridV2(path: String, varName: String,
                  lat: Array[Double], lon: Array[Double],
                  packed: Array[Float],
                  chunkRows: Int, chunkCols: Int,
                  deflate: Boolean, shuffle: Boolean,
                  atts: Seq[(String, Double)],
                  denseRoot: Boolean = false,
                  denseExtraLinks: Int = 0,
                  denseNodeSize: Int = 512,
                  eaIndex: Boolean = false,
                  bt2Index: Boolean = false,
                  bt2NodeSize: Int = 72,
                  eaIdxElmts: Int = 4, eaMinElmts: Int = 2,
                  eaMinPtrs: Int = 4,
                  eaPageBits: Int = 10, faPageBits: Int = 10,
                  softLinks: Seq[(String, String)] = Nil,
                  // superblock-extension object header: message types →
                  // payloads (e.g. 0x0017 File Space Info; 0x000F Shared
                  // Message Table is the one the reader must REJECT)
                  sbExtMessages: Seq[(Int, Array[Byte])] = Nil,
                  // 18-byte heap IDs: links whose message fits 17 bytes
                  // ride INLINE as tiny IDs, links named in `hugeNames`
                  // store their message OUTSIDE the heap with a direct
                  // huge (address+length) ID, the rest stay managed
                  denseIdWide: Boolean = false,
                  hugeNames: Set[String] = Set.empty,
                  // store hugeNames' messages behind the heap's type-1
                  // huge-object v2 B-tree (ID carries a huge-object id)
                  // instead of direct (address+length in the ID)
                  hugeIndirect: Boolean = false,
                  // explicit heap ID length; 0 = auto (18 when
                  // denseIdWide, else 7). > 18 ⇒ EXTENDED tiny sub-type
                  denseIdLen: Int = 0): Unit = {
    val nLat = lat.length; val nLon = lon.length
    require(packed.length == nLat * nLon)
    val Undef = -1L
    val names = Seq(varName, "lat", "lon")

    // ---- chunk payloads (same filter application as writeGridChunked) ----
    val nCr = (nLat + chunkRows - 1) / chunkRows
    val nCc = (nLon + chunkCols - 1) / chunkCols
    val singleChunk = nCr == 1 && nCc == 1
    require(!eaIndex || !singleChunk, "EA fixture needs several chunks")
    require(!bt2Index || (!singleChunk && !eaIndex),
      "bt2 fixture needs several chunks and excludes the EA index")
    val chunkList = for (cr <- 0 until nCr; cc <- 0 until nCc) yield {
      val full = ByteBuffer.allocate(chunkRows * chunkCols * 4)
        .order(ByteOrder.LITTLE_ENDIAN)
      for (i <- 0 until chunkRows; j <- 0 until chunkCols) {
        val gi = cr * chunkRows + i; val gj = cc * chunkCols + j
        full.putFloat(if (gi < nLat && gj < nLon) packed(gi * nLon + gj) else 0f)
      }
      var data = full.array()
      if (shuffle) {
        val es = 4; val n = data.length / es
        val out = new Array[Byte](data.length)
        for (i <- 0 until n; j <- 0 until es) out(j * n + i) = data(i * es + j)
        data = out
      }
      if (deflate) {
        val d = new java.util.zip.Deflater()
        d.setInput(data); d.finish()
        val tmp = new Array[Byte](data.length * 2 + 64)
        val m = d.deflate(tmp); d.end()
        data = java.util.Arrays.copyOf(tmp, m)
      }
      data
    }
    val filtered = deflate || shuffle

    // ---- v2-B-tree chunk index (layout v4 type 5: several unlimited
    // dims): type-10 records (addr + 8-byte scaled offsets per dim) or
    // type-11 (+ minimal-width chunk size + 4-byte filter mask) ----
    val bt2Csl =
      if (filtered)
        (63 - java.lang.Long.numberOfLeadingZeros(
          chunkList.map(_.length).max.toLong)) / 8 + 1
      else 0
    val bt2RecSize = 8 + (if (filtered) bt2Csl + 4 else 0) + 16 // rank 2
    val chunkBt =
      if (bt2Index) new Bt2(bt2NodeSize, bt2RecSize,
        if (filtered) 11 else 10, chunkList.length)
      else null

    // ---- Extensible Array chunk index (leading unlimited dim) ----
    // Spec geometry from the creation params: super block u holds
    // 2^(u/2) data blocks of 2^((u+1)/2)*minElmts elements; the first
    // 2*log2(minPtrs) super blocks' data blocks are addressed directly
    // from the index block, deeper ones under EASB super blocks.
    def log2i(v: Int): Int = {
      require(v > 0 && (v & (v - 1)) == 0, s"EA param $v not a power of 2")
      java.lang.Integer.numberOfTrailingZeros(v)
    }
    val eaMaxBits = 32
    val eaElmtSize = if (filtered) 16 else 8
    val eaIblkSblks = 2 * log2i(eaMinPtrs)
    val eaNDblkAddrs = 2 * (eaMinPtrs - 1)
    val eaNSblkAddrs = (1 + (eaMaxBits - log2i(eaMinElmts))) - eaIblkSblks
    val eaArrOff = (eaMaxBits + 7) / 8
    // flat plan of data blocks that hold at least one real element:
    // (first element idx, nelmts, super-block idx or -1 for direct)
    final case class EaDblk(first: Int, nelmts: Int, sblk: Int)
    val eaPlan: Seq[EaDblk] = {
      val out = scala.collection.mutable.ArrayBuffer.empty[EaDblk]
      var first = eaIdxElmts
      var u = 0
      while (first < chunkList.length) {
        require(u < eaIblkSblks + eaNSblkAddrs, "EA fixture out of blocks")
        val ndblks = 1 << (u / 2)
        val nel = (1 << ((u + 1) / 2)) * eaMinElmts
        var j = 0
        while (first < chunkList.length && j < ndblks) {
          out += EaDblk(first, nel, if (u < eaIblkSblks) -1 else u - eaIblkSblks)
          first += nel
          j += 1
        }
        u += 1
      }
      out.toSeq
    }
    val eaUsedSblks = eaPlan.filter(_.sblk >= 0).map(_.sblk).distinct.sorted
    var eaChunkAddr: Int => Long = _ => 0L // rebound in pass 2
    def eaElement(b: ByteBuffer, chunkIdx: Int): Unit =
      if (chunkIdx >= chunkList.length) { // unused slot
        b.putLong(Undef)
        if (filtered) { b.putInt(0); b.putInt(0) }
      } else {
        b.putLong(eaChunkAddr(chunkIdx))
        if (filtered) { b.putInt(chunkList(chunkIdx).length); b.putInt(0) }
      }


    // ---- blob builders (two-pass: dummy addresses size the layout) ----
    def bb(n: Int): ByteBuffer =
      ByteBuffer.allocate(n).order(ByteOrder.LITTLE_ENDIAN)
    def blob(b: ByteBuffer): Array[Byte] =
      java.util.Arrays.copyOf(b.array(), b.position())

    def floatDatatype(f32: Boolean): Array[Byte] = {
      val b = bb(24)
      b.put(0x11.toByte); b.put(0x20.toByte)
      b.put((if (f32) 31 else 63).toByte); b.put(0.toByte)
      b.putInt(if (f32) 4 else 8)
      b.putShort(0); b.putShort((if (f32) 32 else 64).toShort)
      b.put((if (f32) 23 else 52).toByte)
      b.put((if (f32) 8 else 11).toByte)
      b.put(0.toByte)
      b.put((if (f32) 23 else 52).toByte)
      b.putInt(if (f32) 127 else 1023)
      b.putInt(0)
      blob(b)
    }

    /** v2 object header: "OHDR", version, flags 0x01 (2-byte chunk-0
      * size), messages (1-byte type / 2-byte size / 1-byte flags),
      * zero checksum.
      */
    def v2Header(msgs: Seq[(Int, Array[Byte])]): Array[Byte] = {
      val msgLen = msgs.map(4 + _._2.length).sum
      val b = bb(8 + msgLen + 4)
      b.put("OHDR".getBytes("US-ASCII"))
      b.put(2.toByte); b.put(0x01.toByte)
      b.putShort(msgLen.toShort)
      msgs.foreach { case (typ, data) =>
        b.put(typ.toByte); b.putShort(data.length.toShort); b.put(0.toByte)
        b.put(data)
      }
      b.putInt(0) // chunk-0 checksum (structural)
      blob(b)
    }

    def linkMsg(name: String, hdrAddr: Long): Array[Byte] = {
      val b = bb(11 + name.length)
      b.put(1.toByte)        // link message version
      b.put(0.toByte)        // flags: 1-byte name length, hard link implied
      b.put(name.length.toByte)
      b.put(name.getBytes("US-ASCII"))
      b.putLong(hdrAddr)
      blob(b)
    }

    /** Soft-link message: explicit link-type byte (flags bit 3), then
      * the 2-byte-length-prefixed target path.
      */
    def softLinkMsg(name: String, target: String): Array[Byte] = {
      val b = bb(7 + name.length + target.length)
      b.put(1.toByte)        // link message version
      // flags: link-type field present; name-length field 1 byte, or 2
      // (flags bits 0-1 = 1) once the name outgrows a byte
      val wideName = name.length > 255
      b.put((0x08 | (if (wideName) 1 else 0)).toByte)
      b.put(1.toByte)        // link type: soft
      if (wideName) b.putShort(name.length.toShort)
      else b.put(name.length.toByte)
      b.put(name.getBytes("US-ASCII"))
      b.putShort(target.length.toShort)
      b.put(target.getBytes("US-ASCII"))
      blob(b)
    }

    def dataspaceV2(dims: Seq[Long]): Array[Byte] = {
      val b = bb(4 + dims.length * 8)
      b.put(2.toByte); b.put(dims.length.toByte)
      b.put(0.toByte)        // flags: no max dims
      b.put((if (dims.isEmpty) 0 else 1).toByte) // type: scalar / simple
      dims.foreach(b.putLong)
      blob(b)
    }

    /** Dataspace with max dims: first dim unlimited (the record dim). */
    def dataspaceV2Unlim(dims: Seq[Long]): Array[Byte] = {
      val b = bb(4 + dims.length * 16)
      b.put(2.toByte); b.put(dims.length.toByte)
      b.put(1.toByte)        // flags: max dims present
      b.put(1.toByte)
      dims.foreach(b.putLong)
      dims.zipWithIndex.foreach { case (d, i) =>
        b.putLong(if (i == 0) Undef else d) }
      blob(b)
    }

    /** EVERY dim unlimited — the dataspace that sends the library to a
      * v2-B-tree chunk index.
      */
    def dataspaceV2UnlimAll(dims: Seq[Long]): Array[Byte] = {
      val b = bb(4 + dims.length * 16)
      b.put(2.toByte); b.put(dims.length.toByte)
      b.put(1.toByte)        // flags: max dims present
      b.put(1.toByte)
      dims.foreach(b.putLong)
      dims.foreach(_ => b.putLong(Undef))
      blob(b)
    }

    def layoutV4Contiguous(addr: Long, size: Long): Array[Byte] = {
      val b = bb(18)
      b.put(4.toByte); b.put(1.toByte)
      b.putLong(addr); b.putLong(size)
      blob(b)
    }

    def layoutV3Contiguous(addr: Long, size: Long): Array[Byte] = {
      val b = bb(18)
      b.put(3.toByte); b.put(1.toByte)
      b.putLong(addr); b.putLong(size)
      blob(b)
    }

    /** v4 chunked layout; rank-dims convention (no element-size dim). */
    def layoutV4Chunked(idxAddr: Long): Array[Byte] = {
      val b = bb(64)
      b.put(4.toByte); b.put(2.toByte)
      b.put((if (singleChunk && filtered) 0x02 else 0x00).toByte)
      b.put(2.toByte)        // dimensionality = rank
      b.put(8.toByte)        // dim size encoded length
      b.putLong(chunkRows.toLong); b.putLong(chunkCols.toLong)
      if (singleChunk) {
        b.put(1.toByte)      // index: single chunk
        if (filtered) {
          b.putLong(chunkList.head.length.toLong) // filtered chunk size
          b.putInt(0)                             // filter mask
        }
        b.putLong(idxAddr)   // the chunk itself
      } else if (bt2Index) {
        b.put(5.toByte)      // index: v2 B-tree
        b.putInt(bt2NodeSize)
        b.put(100.toByte); b.put(40.toByte) // split / merge percents
        b.putLong(idxAddr)   // BTHD address
      } else if (eaIndex) {
        b.put(4.toByte)      // index: extensible array
        b.put(eaMaxBits.toByte)
        b.put(eaIdxElmts.toByte)
        b.put(eaMinPtrs.toByte)
        b.put(eaMinElmts.toByte)
        b.put(10.toByte)     // max data-block page nelmts bits
        b.putLong(idxAddr)   // EAHD address
      } else {
        b.put(3.toByte)      // index: fixed array
        b.put(10.toByte)     // page bits
        b.putLong(idxAddr)   // FAHD address
      }
      blob(b)
    }

    def filterPipelineV2: Array[Byte] = {
      final case class F(id: Int, client: Seq[Int])
      val fs = (if (shuffle) Seq(F(2, Seq(4))) else Nil) ++
        (if (deflate) Seq(F(1, Seq(6))) else Nil)
      val b = bb(2 + fs.map(f => 6 + 4 * f.client.length).sum)
      b.put(2.toByte); b.put(fs.length.toByte)
      fs.foreach { f =>
        b.putShort(f.id.toShort) // id < 256: no name field in v2
        b.putShort(if (f.id == 1) 1.toShort else 0.toShort) // optional flag
        b.putShort(f.client.length.toShort)
        f.client.foreach(b.putInt)
      }
      blob(b)
    }

    def attributeV3(name: String, value: Double): Array[Byte] = {
      val dt = floatDatatype(f32 = false)
      val ds = dataspaceV2(Seq.empty) // scalar
      val b = bb(9 + name.length + 1 + dt.length + ds.length + 8)
      b.put(3.toByte); b.put(0.toByte)
      b.putShort((name.length + 1).toShort)
      b.putShort(dt.length.toShort)
      b.putShort(ds.length.toShort)
      b.put(0.toByte)        // charset: ASCII
      b.put(name.getBytes("US-ASCII")); b.put(0.toByte)
      b.put(dt); b.put(ds)
      b.putDouble(value)
      blob(b)
    }

    def fahd(dbAddr: Long): Array[Byte] = {
      val b = bb(28)
      b.put("FAHD".getBytes("US-ASCII"))
      b.put(0.toByte)
      b.put((if (filtered) 1 else 0).toByte) // client
      b.put((if (filtered) 16 else 8).toByte) // entry size (addr+size4+mask4)
      b.put(faPageBits.toByte)
      b.putLong(chunkList.length.toLong)
      b.putLong(dbAddr)
      b.putInt(0)            // checksum (structural)
      blob(b)
    }

    def fadb(hdrAddr: Long, chunkAddrs: Seq[Long]): Array[Byte] = {
      val entrySize = if (filtered) 16 else 8
      val n = chunkList.length
      val pageNelmts = 1 << faPageBits
      def entry(b: ByteBuffer, k: Int): Unit = {
        b.putLong(chunkAddrs(k))
        if (filtered) { b.putInt(chunkList(k).length); b.putInt(0) }
      }
      if (n <= pageNelmts) {
        val b = bb(14 + n * entrySize + 4)
        b.put("FADB".getBytes("US-ASCII"))
        b.put(0.toByte)
        b.put((if (filtered) 1 else 0).toByte)
        b.putLong(hdrAddr)
        (0 until n).foreach(entry(b, _))
        b.putInt(0)          // checksum (structural)
        blob(b)
      } else {
        // PAGED: header + page-init bitmap (MSB-first, all set — every
        // chunk real) + block checksum; then pages, each with its own
        // trailing checksum, the last page truncated.
        val npages = (n + pageNelmts - 1) / pageNelmts
        val pageLens = (0 until npages)
          .map(pg => math.min(pageNelmts, n - pg * pageNelmts))
        val b = bb(14 + (npages + 7) / 8 + 4 +
          pageLens.map(_ * entrySize + 4).sum)
        b.put("FADB".getBytes("US-ASCII"))
        b.put(0.toByte)
        b.put((if (filtered) 1 else 0).toByte)
        b.putLong(hdrAddr)
        val bitmap = new Array[Byte]((npages + 7) / 8)
        (0 until npages).foreach(pg =>
          bitmap(pg / 8) = (bitmap(pg / 8) | (1 << (7 - pg % 8))).toByte)
        b.put(bitmap)
        b.putInt(0)          // data-block checksum (structural)
        (0 until npages).foreach { pg =>
          (0 until pageLens(pg)).foreach(i => entry(b, pg * pageNelmts + i))
          b.putInt(0)        // page checksum (structural)
        }
        blob(b)
      }
    }

    def eahd(ibAddr: Long): Array[Byte] = {
      val b = bb(72)
      b.put("EAHD".getBytes("US-ASCII"))
      b.put(0.toByte)
      b.put((if (filtered) 1 else 0).toByte) // client
      b.put(eaElmtSize.toByte)
      b.put(eaMaxBits.toByte)
      b.put(eaIdxElmts.toByte)
      b.put(eaMinElmts.toByte)
      b.put(eaMinPtrs.toByte)
      b.put(eaPageBits.toByte) // max data-block page nelmts bits
      b.putLong(eaUsedSblks.length.toLong) // n super blocks
      b.putLong(0L)          // super block size (stat only)
      b.putLong(eaPlan.length.toLong) // n data blocks
      b.putLong(eaPlan.map(_.nelmts.toLong).sum * eaElmtSize)
      b.putLong(chunkList.length.toLong) // max index set
      b.putLong(chunkList.length.toLong) // n elements
      b.putLong(ibAddr)
      b.putInt(0)            // checksum (structural)
      blob(b)
    }

    def eaib(hdrAddr: Long, dblkAddrs: Seq[Long],
             sblkAddrs: Seq[Long]): Array[Byte] = {
      val b = bb(14 + eaIdxElmts * eaElmtSize +
        (eaNDblkAddrs + eaNSblkAddrs) * 8 + 4)
      b.put("EAIB".getBytes("US-ASCII"))
      b.put(0.toByte)
      b.put((if (filtered) 1 else 0).toByte)
      b.putLong(hdrAddr)
      (0 until eaIdxElmts).foreach(i =>
        eaElement(b, math.min(i, chunkList.length)))
      dblkAddrs.padTo(eaNDblkAddrs, Undef).foreach(b.putLong)
      sblkAddrs.padTo(eaNSblkAddrs, Undef).foreach(b.putLong)
      b.putInt(0)            // checksum (structural)
      blob(b)
    }

    /** EASB super block: its data block addresses. */
    def easb(hdrAddr: Long, sblkIdx: Int, dblkAddrs: Seq[Long]): Array[Byte] = {
      val u = eaIblkSblks + sblkIdx
      val ndblks = 1 << (u / 2)
      val b = bb(14 + eaArrOff + ndblks * 8 + 4)
      b.put("EASB".getBytes("US-ASCII"))
      b.put(0.toByte)
      b.put((if (filtered) 1 else 0).toByte)
      b.putLong(hdrAddr)
      val firstIdx = eaPlan.find(_.sblk == sblkIdx).map(_.first).getOrElse(0)
      (0 until eaArrOff).foreach(i =>
        b.put(((firstIdx >> (8 * i)) & 0xff).toByte))
      dblkAddrs.padTo(ndblks, Undef).foreach(b.putLong)
      b.putInt(0)            // checksum (structural)
      blob(b)
    }

    def eadb(hdrAddr: Long, dblkIdx: Int): Array[Byte] = {
      val d = eaPlan(dblkIdx)
      val pageNelmts = 1 << eaPageBits
      if (d.nelmts <= pageNelmts) {
        val b = bb(14 + eaArrOff + d.nelmts * eaElmtSize + 4)
        b.put("EADB".getBytes("US-ASCII"))
        b.put(0.toByte)
        b.put((if (filtered) 1 else 0).toByte)
        b.putLong(hdrAddr)
        (0 until eaArrOff).foreach(i =>
          b.put(((d.first >> (8 * i)) & 0xff).toByte)) // block offset LE
        (0 until d.nelmts).foreach(i => eaElement(b, d.first + i))
        b.putInt(0)          // checksum (structural)
        blob(b)
      } else {
        // PAGED: header + block offset + page-init bitmap (MSB-first;
        // clear for pages whose every slot is past the real elements)
        // + block checksum, then fixed-size pages each with a trailing
        // checksum. Uninitialized pages still occupy their space (zero
        // bytes the reader must never decode).
        require(d.nelmts % pageNelmts == 0, "EA page geometry")
        val npages = d.nelmts / pageNelmts
        val b = bb(14 + eaArrOff + (npages + 7) / 8 + 4 +
          npages * (pageNelmts * eaElmtSize + 4))
        b.put("EADB".getBytes("US-ASCII"))
        b.put(0.toByte)
        b.put((if (filtered) 1 else 0).toByte)
        b.putLong(hdrAddr)
        (0 until eaArrOff).foreach(i =>
          b.put(((d.first >> (8 * i)) & 0xff).toByte))
        val bitmap = new Array[Byte]((npages + 7) / 8)
        (0 until npages).foreach { pg =>
          if (d.first + pg * pageNelmts < chunkList.length)
            bitmap(pg / 8) = (bitmap(pg / 8) | (1 << (7 - pg % 8))).toByte
        }
        b.put(bitmap)
        b.putInt(0)          // data-block checksum (structural)
        (0 until npages).foreach { pg =>
          if (d.first + pg * pageNelmts < chunkList.length)
            (0 until pageNelmts).foreach(i =>
              eaElement(b, d.first + pg * pageNelmts + i))
          else b.position(b.position() + pageNelmts * eaElmtSize)
          b.putInt(0)        // page checksum (structural)
        }
        blob(b)
      }
    }

    def gridHeader(idxAddr: Long): Array[Byte] = v2Header(
      Seq((0x0001, if (eaIndex) dataspaceV2Unlim(Seq(nLat.toLong, nLon.toLong))
        else if (bt2Index) dataspaceV2UnlimAll(Seq(nLat.toLong, nLon.toLong))
        else dataspaceV2(Seq(nLat.toLong, nLon.toLong))),
        (0x0003, floatDatatype(f32 = true)),
        (0x0008, layoutV4Chunked(idxAddr))) ++
        (if (filtered) Seq((0x000B, filterPipelineV2)) else Nil) ++
        atts.map { case (n, v) => (0x000C, attributeV3(n, v)) })

    def latHeader(addr: Long): Array[Byte] = v2Header(Seq(
      (0x0001, dataspaceV2(Seq(nLat.toLong))),
      (0x0003, floatDatatype(f32 = false)),
      (0x0008, layoutV4Contiguous(addr, nLat * 8L))))

    def lonHeader(addr: Long): Array[Byte] = v2Header(Seq(
      (0x0001, dataspaceV2(Seq(nLon.toLong))),
      (0x0003, floatDatatype(f32 = false)),
      (0x0008, layoutV3Contiguous(addr, nLon * 8L))))

    // ---- dense link storage (Link Info → fractal heap + v2 B-tree) ----
    // Geometry chosen to exercise the indirect-root walk: one link per
    // direct block, so 3 links → a root FHIB with row 0 blocks; extra
    // links (`denseExtraLinks` hard links to the lat header) spill into
    // doubled rows ≥ 2 and — with a small `denseNodeSize` — force the
    // name index through BTIN internal nodes (depth 1, 2, ...).
    val softMap = softLinks.toMap
    val denseNames = names ++
      (0 until denseExtraLinks).map(i => f"x$i%02d") ++ softLinks.map(_._1)
    val hpWidth = 4; val hpStart = 64L
    val hpMaxDirect = 65536L; val hpMaxBits = 32 // → managed ID = 1+4+2 = 7
    // wide IDs leave room for tiny payloads (≤ 16 bytes inline at the
    // normal sub-type; more under extended) and direct huge (1 + 8
    // addr + 8 len = 17) — the library pads managed IDs to the heap's
    // ID length the same way
    val heapIdLen =
      if (denseIdLen > 0) denseIdLen else if (denseIdWide) 18 else 7
    val fhdbHdrLen = 4 + 1 + 8 + 4 // sig, version, heap hdr, block offset
    def blockSize(k: Int): Long = {
      val r = k / hpWidth
      if (r < 2) hpStart else hpStart << (r - 1)
    }
    def blockHeapStart(k: Int): Long = {
      val r = k / hpWidth; val c = k % hpWidth
      val rowStart = if (r == 0) 0L else hpWidth * hpStart * (1L << (r - 1))
      rowStart + c * blockSize(k)
    }
    val nBlocks = denseNames.length // one link object per block
    require(!denseRoot || nBlocks <= 12 * hpWidth, "direct rows only")
    val heapOffsets = (0 until nBlocks).map(k => blockHeapStart(k) + fhdbHdrLen)

    def linkInfoMsg(fheap: Long, bthd: Long): Array[Byte] = {
      val b = bb(18)
      b.put(0.toByte); b.put(0.toByte) // version, flags (no creation order)
      b.putLong(fheap); b.putLong(bthd)
      blob(b)
    }

    def frhp(rootBlock: Long, curRows: Int,
             hugeBt: Long = -1L, nHuge: Long = 0L): Array[Byte] = {
      val managed = // heap-offset span through the last allocated row
        if (curRows <= 1) hpWidth * hpStart
        else hpWidth * hpStart * (1L << (curRows - 1))
      val b = bb(160)
      b.put("FRHP".getBytes("US-ASCII")); b.put(0.toByte)
      b.putShort(heapIdLen.toShort) // heap ID length
      b.putShort(0)                 // I/O filter encoded length
      b.put(0.toByte)               // flags: no direct-block checksums
      b.putInt(4096)                // max managed object size
      b.putLong(nHuge + 1); b.putLong(hugeBt) // next huge id, huge B-tree
      b.putLong(0L); b.putLong(Undef) // free space, free-space manager
      b.putLong(managed); b.putLong(managed) // managed, allocated
      b.putLong(managed)            // direct-block iterator offset
      b.putLong(denseNames.length.toLong) // managed object count
      b.putLong(0L); b.putLong(0L); b.putLong(0L); b.putLong(0L) // huge/tiny
      b.putShort(hpWidth.toShort)
      b.putLong(hpStart); b.putLong(hpMaxDirect)
      b.putShort(hpMaxBits.toShort)
      b.putShort(0)                 // starting rows in root indirect block
      b.putLong(rootBlock)
      b.putShort(curRows.toShort)
      b.putInt(0)                   // checksum (structural)
      blob(b)
    }

    def fhib(heapHdr: Long, entries: Seq[Long]): Array[Byte] = {
      val b = bb(4 + 1 + 8 + 4 + entries.length * 8 + 4)
      b.put("FHIB".getBytes("US-ASCII")); b.put(0.toByte)
      b.putLong(heapHdr)
      b.putInt(0)                   // block offset (4-byte heap offset)
      entries.foreach(b.putLong)
      b.putInt(0)                   // checksum (structural)
      blob(b)
    }

    def fhdb(heapHdr: Long, blockOff: Long, size: Long,
             obj: Array[Byte]): Array[Byte] = {
      val arr = new Array[Byte](size.toInt)
      val b = ByteBuffer.wrap(arr).order(ByteOrder.LITTLE_ENDIAN)
      b.put("FHDB".getBytes("US-ASCII")); b.put(0.toByte)
      b.putLong(heapHdr)
      b.putInt(blockOff.toInt)      // this block's heap offset
      b.put(obj)
      arr
    }

    // ---- v2 B-tree name index via the shared any-depth emitter ----
    val denseBt = new Bt2(denseNodeSize, recSize = 4 + heapIdLen, btType = 5,
      nRecs = denseNames.length) // 4-byte name hash + heap ID
    // records carry the REAL lookup3 name hash and sit in the tree in
    // unsigned-hash order (the library's search invariant) — heap
    // blocks stay in link order, the records just point into them. The
    // reader enumerates without hash lookups, but a binary search by
    // hash would be well-formed on these fixtures too.
    val denseOrder = denseNames.indices.sortBy { k =>
      (lookup3(denseNames(k).getBytes("US-ASCII")).toLong & 0xffffffffL,
        denseNames(k))
    }
    /** The managed heap object for a dense link — hard or soft. */
    def denseMsg(n: String, hdrAddrs: Map[String, Long]): Array[Byte] =
      softMap.get(n) match {
        case Some(t) => softLinkMsg(n, t)
        case None => linkMsg(n, hdrAddrs.getOrElse(n, 0L))
      }

    /** Heap ID kind per dense link: 0 managed, 1 tiny (message rides
      * inline; ≤ 16 bytes at the normal sub-type, up to idLen-2 under
      * extended), 2 huge (message stored outside the heap; ID =
      * address + length when direct, a huge-object id when indirect).
      */
    // the library keys direct-vs-indirect huge IDs on the heap ID
    // length (H5HFhdr.c: direct iff idLen ≥ 1 + sizeof_addr +
    // sizeof_size = 17); a fixture combining the flag with the wrong
    // width would encode a file the library never writes
    require(hugeNames.isEmpty ||
        (if (hugeIndirect) heapIdLen < 17 else heapIdLen >= 17),
      s"library-realistic huge IDs: indirect needs idLen < 17, " +
        s"direct needs >= 17 (got idLen=$heapIdLen, indirect=$hugeIndirect)")
    // H5HFtiny.c boundary: normal 1-byte header iff heap ID length
    // ≤ 17, extended (2-byte header, 12-bit length) at ≥ 18
    val tinyHdr = if (heapIdLen < 18) 1 else 2
    val tinyMax = math.min(if (heapIdLen < 18) 16 else 4096,
      heapIdLen - tinyHdr)
    val denseKinds: IndexedSeq[Int] = denseNames.toIndexedSeq.map { n =>
      if (denseIdWide && hugeNames(n)) 2
      else if (denseIdWide && denseMsg(n, Map.empty).length <= tinyMax) 1
      else 0
    }

    def denseRecBytes(b: ByteBuffer, slot: Int, hdrAddrs: Map[String, Long],
                      hugeAddrs: Map[Int, Long],
                      hugeIds: Map[Int, Long]): Unit = {
      val k = denseOrder(slot)
      b.putInt(lookup3(denseNames(k).getBytes("US-ASCII")))
      val start = b.position()
      denseKinds(k) match {
        case 0 =>
          b.put(0.toByte)                // heap ID: version 0, managed
          b.putInt(heapOffsets(k).toInt) // heap offset, 4 bytes LE
          b.putShort(denseMsg(denseNames(k), Map.empty).length.toShort)
        case 1 =>
          val m = denseMsg(denseNames(k), hdrAddrs)
          if (heapIdLen < 18)
            b.put((0x20 | (m.length - 1)).toByte) // normal: len-1 nibble
          else { // extended (H5HFtiny.c): flag nibble = HIGH 4 bits of
            // len-1, second byte = low 8 bits
            b.put((0x20 | (((m.length - 1) >> 8) & 0x0f)).toByte)
            b.put(((m.length - 1) & 0xff).toByte)
          }
          b.put(m)
        case 2 if hugeIndirect =>
          b.put(0x10.toByte)             // version 0, huge indirect
          b.putLong(hugeIds(k))          // huge-object id (B-tree key)
        case 2 =>
          b.put(0x10.toByte)             // version 0, huge direct
          b.putLong(hugeAddrs(k))
          b.putLong(denseMsg(denseNames(k), Map.empty).length.toLong)
      }
      while (b.position() < start + heapIdLen) b.put(0.toByte)
    }

    def rootHeader(hdrAddrs: Map[String, Long]): Array[Byte] =
      if (denseRoot) v2Header(Seq((0x0002, linkInfoMsg(0L, 0L))))
      else v2Header(names.map(n => (0x0006, linkMsg(n, hdrAddrs(n)))) ++
        softLinks.map { case (n, t) => (0x0006, softLinkMsg(n, t)) })

    // ---- pass 1: sizes with dummy addresses ----
    val sbLen = 48
    val rootLen = rootHeader(names.map(_ -> 0L).toMap).length
    val gridLen = gridHeader(0L).length
    val latLen = latHeader(0L).length
    val lonLen = lonHeader(0L).length
    val fahdLen =
      if (singleChunk) 0
      else if (bt2Index) chunkBt.header(0L).length
      else if (eaIndex) eahd(0L).length
      else fahd(0L).length
    val fadbLen =
      if (singleChunk) 0
      else if (bt2Index) chunkBt.nodesLen
      else if (eaIndex) eaib(0L, Nil, Nil).length
      else fadb(0L, chunkList.map(_ => 0L)).length
    val easbLens =
      if (eaIndex && !singleChunk) eaUsedSblks.map(si => easb(0L, si, Nil).length)
      else Seq.empty
    val eadbLens =
      if (eaIndex && !singleChunk) eaPlan.indices.map(eadb(0L, _).length)
      else Seq.empty

    val denseRows = (nBlocks + hpWidth - 1) / hpWidth
    val blockSizes = (0 until nBlocks).map(blockSize)
    val frhpLen = if (denseRoot) frhp(0L, 0).length else 0
    val fhibLen =
      if (denseRoot) fhib(0L, Seq.fill(denseRows * hpWidth)(0L)).length else 0
    val blocksLen = if (denseRoot) blockSizes.sum.toInt else 0
    val bthdLen = if (denseRoot) denseBt.header(0L).length else 0
    val btNodesLen = if (denseRoot) denseBt.nodesLen else 0

    val rootAddr = sbLen.toLong
    val frhpAddr = rootAddr + rootLen
    val fhibAddr = frhpAddr + frhpLen
    val dblk0 = fhibAddr + fhibLen
    val bthdAddr = dblk0 + blocksLen
    val btNodesAddr = bthdAddr + bthdLen
    // huge objects live outside the heap — addressed straight from the
    // ID (direct) or through the type-1 huge-object v2 B-tree (indirect)
    val hugeKs = denseNames.indices.filter(k => denseKinds(k) == 2)
    val hugeIds: Map[Int, Long] =
      hugeKs.zipWithIndex.map { case (k, i) => k -> (i + 1).toLong }.toMap
    // the library ALWAYS creates a huge-object v2 B-tree when huge
    // objects exist: type 1 (id → addr+len) when IDs are indirect,
    // type 3 (addr+len, kept for deletion tracking) when direct —
    // a reader keying "direct" on B-tree absence fails on real files
    val hugeBt =
      if (hugeKs.isEmpty) null
      else if (hugeIndirect)
        new Bt2(512, recSize = 24, btType = 1, nRecs = hugeKs.length)
      else
        new Bt2(512, recSize = 16, btType = 3, nRecs = hugeKs.length)
    val hbthdLen = if (hugeBt != null) hugeBt.header(0L).length else 0
    val hbtNodesLen = if (hugeBt != null) hugeBt.nodesLen else 0
    val hbthdAddr = btNodesAddr + btNodesLen
    val hbtNodesAddr = hbthdAddr + hbthdLen
    val hugeAddrs: Map[Int, Long] = {
      var c = hbtNodesAddr + hbtNodesLen
      hugeKs.map { k =>
        val a = c; c += denseMsg(denseNames(k), Map.empty).length; k -> a
      }.toMap
    }
    val hugeLen =
      hugeKs.map(k => denseMsg(denseNames(k), Map.empty).length).sum
    val gridAddr = hbtNodesAddr + hbtNodesLen + hugeLen
    val latHdrAddr = gridAddr + gridLen
    val lonHdrAddr = latHdrAddr + latLen
    val fahdAddr = lonHdrAddr + lonLen
    val fadbAddr = fahdAddr + fahdLen
    var cursor = fadbAddr + fadbLen
    val easbAddrs = easbLens.map { n => val a = cursor; cursor += n; a }
    val eadbAddrs = eadbLens.map { n => val a = cursor; cursor += n; a }
    val chunkAddrs = chunkList.map { c => val a = cursor; cursor += c.length; a }
    val latAddr = cursor; cursor += nLat * 8
    val lonAddr = cursor; cursor += nLon * 8
    def pad8(n: Int): Int = (n + 7) & ~7
    val sbExtLen =
      if (sbExtMessages.isEmpty) 0L
      else 16L + sbExtMessages.map(m => 8 + pad8(m._2.length)).sum
    val sbExtAddr = cursor; cursor += sbExtLen
    val eof = cursor

    // ---- pass 2: emit with real addresses ----
    val buf = ByteBuffer.allocate(eof.toInt).order(ByteOrder.LITTLE_ENDIAN)
    buf.put(Array[Byte](0x89.toByte, 'H', 'D', 'F', 0x0d, 0x0a, 0x1a, 0x0a))
    buf.put(3.toByte)       // superblock version
    buf.put(8.toByte); buf.put(8.toByte) // offset / length sizes
    buf.put(0.toByte)       // file consistency flags
    buf.putLong(0L)         // base address
    buf.putLong(if (sbExtMessages.isEmpty) Undef else sbExtAddr)
    buf.putLong(eof)        // end of file
    buf.putLong(rootAddr)   // root group object header
    buf.putInt(0)           // checksum (structural)
    assert(buf.position() == sbLen)

    val gridIdxAddr =
      if (singleChunk) chunkAddrs.head else fahdAddr
    val hdrAddrs = Map(varName -> gridAddr, "lat" -> latHdrAddr,
      "lon" -> lonHdrAddr) ++
      denseNames.drop(names.length).map(_ -> latHdrAddr) // extra hard links
    if (denseRoot) {
      buf.put(v2Header(Seq((0x0002, linkInfoMsg(frhpAddr, bthdAddr)))))
      assert(buf.position() == frhpAddr)
      buf.put(frhp(fhibAddr, denseRows,
        if (hugeBt != null) hbthdAddr else -1L, hugeKs.length.toLong))
      assert(buf.position() == fhibAddr)
      val dblkAddrs = blockSizes.scanLeft(dblk0)(_ + _).init
      buf.put(fhib(frhpAddr,
        dblkAddrs.padTo(denseRows * hpWidth, -1L)))
      denseNames.zipWithIndex.foreach { case (n, k) =>
        buf.position(dblkAddrs(k).toInt)
        // only MANAGED messages live in heap blocks; tiny rides inline
        // in the ID and huge outside the heap — and a tiny-extended
        // message can be larger than this slot's doubling-table block
        val payload =
          if (denseKinds(k) == 0) denseMsg(n, hdrAddrs) else Array.empty[Byte]
        buf.put(fhdb(frhpAddr, blockHeapStart(k), blockSizes(k), payload))
      }
      buf.position(bthdAddr.toInt)
      buf.put(denseBt.header(btNodesAddr))
      denseBt.emit(buf, btNodesAddr,
        (b, slot) => denseRecBytes(b, slot, hdrAddrs, hugeAddrs, hugeIds))
      if (hugeBt != null) { // huge-object index: type 1 carries the id
        // key after (addr, len); type 3 is just (addr, len)
        buf.position(hbthdAddr.toInt)
        buf.put(hugeBt.header(hbtNodesAddr))
        hugeBt.emit(buf, hbtNodesAddr, (b, slot) => {
          val k = hugeKs(slot)
          b.putLong(hugeAddrs(k))
          b.putLong(denseMsg(denseNames(k), Map.empty).length.toLong)
          if (hugeIndirect) b.putLong(hugeIds(k))
        })
      }
      // huge objects themselves: the link message bytes at their address
      hugeKs.foreach { k =>
        buf.position(hugeAddrs(k).toInt)
        buf.put(denseMsg(denseNames(k), hdrAddrs))
      }
      // each node owns denseNodeSize bytes; serialized content is shorter
      buf.position(gridAddr.toInt)
    } else {
      buf.put(rootHeader(hdrAddrs))
    }
    assert(buf.position() == gridAddr)
    buf.put(gridHeader(gridIdxAddr))
    assert(buf.position() == latHdrAddr)
    buf.put(latHeader(latAddr))
    assert(buf.position() == lonHdrAddr)
    buf.put(lonHeader(lonAddr))
    if (!singleChunk) {
      assert(buf.position() == fahdAddr)
      if (bt2Index) {
        buf.put(chunkBt.header(fadbAddr))
        assert(buf.position() == fadbAddr)
        chunkBt.emit(buf, fadbAddr, (b, k) => {
          b.putLong(chunkAddrs(k))
          if (filtered) {
            (0 until bt2Csl).foreach(i =>
              b.put(((chunkList(k).length >>> (8 * i)) & 0xff).toByte))
            b.putInt(0)                // filter mask: all filters applied
          }
          b.putLong((k / nCc).toLong)  // scaled offset, dim 0
          b.putLong((k % nCc).toLong)  // scaled offset, dim 1
        })
      } else if (eaIndex) {
        eaChunkAddr = chunkAddrs(_) // real addresses for the element blobs
        val directAddrs = eaPlan.zipWithIndex
          .filter(_._1.sblk < 0).map(p => eadbAddrs(p._2))
        val sblkAddrSlots = (0 until eaNSblkAddrs).map { si =>
          if (eaUsedSblks.contains(si)) easbAddrs(eaUsedSblks.indexOf(si))
          else Undef
        }
        buf.put(eahd(fadbAddr))
        assert(buf.position() == fadbAddr)
        buf.put(eaib(fahdAddr, directAddrs, sblkAddrSlots))
        eaUsedSblks.zipWithIndex.foreach { case (si, k) =>
          assert(buf.position() == easbAddrs(k))
          val mine = eaPlan.zipWithIndex.filter(_._1.sblk == si)
            .map(p => eadbAddrs(p._2))
          buf.put(easb(fahdAddr, si, mine))
        }
        eadbAddrs.zipWithIndex.foreach { case (a, k) =>
          assert(buf.position() == a)
          buf.put(eadb(fahdAddr, k))
        }
      } else {
        buf.put(fahd(fadbAddr))
        assert(buf.position() == fadbAddr)
        buf.put(fadb(fahdAddr, chunkAddrs))
      }
    }
    chunkAddrs.zip(chunkList).foreach { case (a, data) =>
      buf.position(a.toInt); buf.put(data) }
    buf.position(latAddr.toInt); lat.foreach(buf.putDouble)
    buf.position(lonAddr.toInt); lon.foreach(buf.putDouble)
    if (sbExtMessages.nonEmpty) {
      // superblock extension = a v1 object header of bookkeeping msgs
      buf.position(sbExtAddr.toInt)
      buf.put(1.toByte); buf.put(0.toByte)
      buf.putShort(sbExtMessages.length.toShort)
      buf.putInt(1)                    // reference count
      buf.putInt((sbExtLen - 16).toInt)
      buf.putInt(0)                    // pad to 8-aligned message start
      sbExtMessages.foreach { case (t, payload) =>
        val pl = pad8(payload.length)
        buf.putShort(t.toShort); buf.putShort(pl.toShort); buf.putInt(0)
        buf.put(payload)
        (payload.length until pl).foreach(_ => buf.put(0.toByte))
      }
    }

    java.nio.file.Files.write(java.nio.file.Paths.get(path), buf.array())
  }
}
