package graft

import java.nio.{ByteBuffer, ByteOrder}

/** Test-only netCDF-4-style HDF5 encoder, written byte-by-byte from the
  * public HDF5 File Format Specification (independently of
  * `Hdf5Reader`'s parsing code): superblock v0, v1 object headers,
  * an old-style root group (Symbol Table message → v1 B-tree → SNOD →
  * local heap), and three contiguous datasets — `lat` (f64), `lon`
  * (f64), and a 2-D f32 grid variable. This is the layout profile
  * netcdf-c emits for a small uncompressed grid, which is exactly what
  * the reader claims to support.
  */
object MiniHdf5 {

  def writeGrid(path: String, varName: String,
                lat: Array[Double], lon: Array[Double],
                values: Array[Float]): Unit = {
    require(values.length == lat.length * lon.length)

    def align8(n: Int): Int = (n + 7) & ~7

    // ---- layout plan (addresses fixed up front) ----
    val superblock = 96
    val rootHdr = superblock                   // 16 prefix + (8+16) symtab msg
    val rootHdrLen = 16 + 24
    val heapHdr = rootHdr + rootHdrLen         // 32-byte local heap header
    // heap data: off 0 = "" (root link), then the three names, 8-aligned
    val names = Seq(varName, "lat", "lon").sorted // SNOD entries sort by name
    val nameOffs = scala.collection.mutable.LinkedHashMap.empty[String, Int]
    var heapOff = 8
    names.foreach { n => nameOffs(n) = heapOff; heapOff += align8(n.length + 1) }
    val heapDataLen = align8(heapOff)
    val heapData = heapHdr + 32
    val btree = heapData + heapDataLen         // 24 + key/child/key = 48
    val snod = btree + 48                      // 8 + 3×40 = 128
    // dataset headers: prefix 16 + dataspace msg + datatype msg + layout msg
    def dsHdrLen(ndims: Int) = 16 + (8 + align8(8 + ndims * 8)) + (8 + 24) + (8 + 24)
    val hdrAddrs = scala.collection.mutable.LinkedHashMap.empty[String, Int]
    var cursor = snod + 128
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
    buf.put(heapSeg)

    // ---- group B-tree v1 (level 0, one SNOD child) ----
    assert(buf.position() == btree)
    buf.put("TREE".getBytes("US-ASCII"))
    buf.put(0.toByte)  // node type: group
    buf.put(0.toByte)  // level: leaf
    buf.putShort(1)    // entries used
    buf.putLong(Undef); buf.putLong(Undef) // siblings
    buf.putLong(nameOffs(names.head).toLong) // key 0
    buf.putLong(snod.toLong)                 // child 0
    buf.putLong(nameOffs(names.last).toLong) // key 1

    // ---- SNOD with the three entries (name-sorted) ----
    assert(buf.position() == snod)
    buf.put("SNOD".getBytes("US-ASCII"))
    buf.put(1.toByte); buf.put(0.toByte)
    buf.putShort(names.length.toShort)
    names.foreach { n =>
      buf.putLong(nameOffs(n).toLong)
      buf.putLong(hdrAddrs(n).toLong)
      buf.putInt(0); buf.putInt(0)
      buf.putLong(0L); buf.putLong(0L)
    }
    buf.position(snod + 128)

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
}
