package graft.sources.geo

import java.nio.{ByteBuffer, ByteOrder}

import graft.ops.Grid

/** Minimal pure-JVM reader for the HDF5 subset that netCDF-4 writes for
  * small uncompressed grids — the missing half of [[NetcdfReader]]
  * (which handles classic CDF-1/CDF-2): modern GEBCO/EMODnet bathymetry
  * downloads (`/root/reference/src/main.py:560,595` via
  * `get_elev_netcdf`) are frequently netCDF-4, i.e. HDF5 containers.
  *
  * Implements exactly the profile needed for contiguous float/int grids,
  * per the public "HDF5 File Format Specification" (The HDF Group,
  * version 3.0): superblock v0/v1, version-1 object headers (with
  * continuation blocks), old-style groups (Symbol Table message →
  * v1 B-tree + local heap → SNOD leaf nodes), Dataspace v1/v2, Datatype
  * classes 0 (fixed) and 1 (IEEE float), Data Layout v3 contiguous.
  * Everything else — chunked/compressed layout, new-style groups,
  * v2 object headers, non-8-byte offsets — fails LOUDLY with a message
  * naming the limitation and the one-line `nccopy` escape hatch; this
  * reader never misparses what it does not support.
  */
object Hdf5Reader {

  private val Undef = -1L // 0xFFFF_FFFF_FFFF_FFFF = "undefined address"

  final case class Dataset(name: String, dims: Seq[Int], dtClass: Int,
                           dtSize: Int, littleEndian: Boolean,
                           dataAddr: Long, dataSize: Long)

  final case class H5File(datasets: Map[String, Dataset], bytes: Array[Byte]) {
    def shape(name: String): Seq[Int] = dataset(name).dims

    def dataset(name: String): Dataset = datasets.getOrElse(name,
      throw new IllegalArgumentException(
        s"no dataset '$name' (found: ${datasets.keys.toSeq.sorted.mkString(", ")})"))

    /** Materialize a dataset as doubles (row-major). */
    def readDoubles(name: String): Array[Double] = {
      val d = dataset(name)
      val n = d.dims.product
      require(d.dataAddr != Undef, s"dataset '$name' has no allocated data")
      val b = ByteBuffer.wrap(bytes).order(
        if (d.littleEndian) ByteOrder.LITTLE_ENDIAN else ByteOrder.BIG_ENDIAN)
      b.position(d.dataAddr.toInt)
      val out = new Array[Double](n)
      var i = 0
      while (i < n) {
        out(i) = (d.dtClass, d.dtSize) match {
          case (1, 4) => b.getFloat().toDouble
          case (1, 8) => b.getDouble()
          case (0, 1) => b.get().toDouble
          case (0, 2) => b.getShort().toDouble
          case (0, 4) => b.getInt().toDouble
          case (0, 8) => b.getLong().toDouble
          case (c, s) => throw new IllegalArgumentException(
            s"unsupported datatype class=$c size=$s for '$name'")
        }
        i += 1
      }
      out
    }
  }

  def isHdf5(bytes: Array[Byte]): Boolean =
    bytes.length >= 8 && (bytes(0) & 0xff) == 0x89 && bytes(1) == 'H' &&
      bytes(2) == 'D' && bytes(3) == 'F' && bytes(4) == 0x0d &&
      bytes(5) == 0x0a && (bytes(6) & 0xff) == 0x1a && bytes(7) == 0x0a

  def open(path: String): H5File = {
    val bytes = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path))
    require(isHdf5(bytes), s"$path is not an HDF5 (netCDF-4) file")
    try openBytes(bytes, path)
    catch { case _: java.nio.BufferUnderflowException |
                 _: IndexOutOfBoundsException =>
      throw new IllegalArgumentException(
        s"$path: truncated or corrupt HDF5/netCDF-4 file")
    }
  }

  private def openBytes(bytes: Array[Byte], path: String): H5File = {
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    buf.position(8)
    val sbVer = buf.get() & 0xff
    require(sbVer <= 1,
      s"$path: superblock v$sbVer unsupported (v0/v1 only — the profile " +
        "netcdf-c writes by default; `nccopy -k classic` converts)")
    buf.get(); buf.get(); buf.get() // free-space ver, root-symtab ver, reserved
    buf.get() // shared-header-message version
    val offSize = buf.get() & 0xff
    val lenSize = buf.get() & 0xff
    require(offSize == 8 && lenSize == 8,
      s"$path: only 8-byte offsets/lengths supported (got $offSize/$lenSize)")
    buf.get() // reserved
    buf.getShort(); buf.getShort() // group leaf / internal k
    if (sbVer == 1) { buf.getShort(); buf.getShort() } // indexed-storage k
    buf.getInt() // file consistency flags
    val base = buf.getLong()
    require(base == 0, s"$path: nonzero base address $base unsupported")
    buf.getLong(); buf.getLong(); buf.getLong() // free-space, EOF, driver-info
    // root group symbol table entry
    val (_, rootHdr, rootBtree, rootHeap) = readSte(buf)
    val (btree, heap) =
      if (rootBtree != Undef && rootHeap != Undef) (rootBtree, rootHeap)
      else {
        // cache type 0: the Symbol Table message lives in the root header
        val msgs = readMessages(buf, rootHdr, path)
        val st = msgs.find(_._1 == 0x0011).getOrElse(
          throw new IllegalArgumentException(
            s"$path: root group has no Symbol Table message — new-style " +
              "(fractal-heap) groups unsupported; `nccopy -k classic` converts"))
        val d = slice(buf, st._2, st._3)
        (d.getLong(), d.getLong())
      }
    val links = readGroup(buf, btree, heap, path)
    val datasets = links.flatMap { case (name, addr) =>
      parseDataset(buf, name, addr, path)
    }.toMap
    H5File(datasets, bytes)
  }

  /** Symbol table entry: (link name offset, object header address,
    * B-tree address, heap address) — the last two only when cache type 1.
    */
  private def readSte(buf: ByteBuffer): (Long, Long, Long, Long) = {
    val nameOff = buf.getLong()
    val hdrAddr = buf.getLong()
    val cacheType = buf.getInt()
    buf.getInt() // reserved
    val s0 = buf.getLong(); val s1 = buf.getLong() // scratch pad
    if (cacheType == 1) (nameOff, hdrAddr, s0, s1)
    else (nameOff, hdrAddr, Undef, Undef)
  }

  /** Walk an old-style group's v1 B-tree; returns (name → header addr). */
  private def readGroup(buf: ByteBuffer, btreeAddr: Long, heapAddr: Long,
                        path: String): Seq[(String, Long)] = {
    // local heap: names live at (data segment + offset), NUL-terminated
    val h = buf.duplicate().order(ByteOrder.LITTLE_ENDIAN)
    h.position(heapAddr.toInt)
    val heapSig = new Array[Byte](4); h.get(heapSig)
    require(new String(heapSig, "US-ASCII") == "HEAP", s"$path: bad local heap")
    h.getInt() // version + reserved
    h.getLong(); h.getLong() // data segment size, free-list head
    val heapData = h.getLong()
    def name(off: Long): String = {
      var p = (heapData + off).toInt
      val sb = new StringBuilder
      while (buf.get(p) != 0) { sb.append(buf.get(p).toChar); p += 1 }
      sb.toString
    }

    def walk(addr: Long): Seq[(String, Long)] = {
      val b = buf.duplicate().order(ByteOrder.LITTLE_ENDIAN)
      b.position(addr.toInt)
      val sig = new Array[Byte](4); b.get(sig)
      new String(sig, "US-ASCII") match {
        case "TREE" =>
          val nodeType = b.get() & 0xff
          require(nodeType == 0, s"$path: B-tree node type $nodeType in a group")
          b.get() // level (children are TREE or SNOD — re-dispatch on signature)
          val used = b.getShort() & 0xffff
          b.getLong(); b.getLong() // siblings
          (0 until used).flatMap { _ =>
            b.getLong() // key (name offset) — unused for full iteration
            val child = b.getLong()
            walk(child)
          }
        case "SNOD" =>
          b.getShort() // version + reserved
          val n = b.getShort() & 0xffff
          (0 until n).map { _ =>
            val (nameOff, hdr, _, _) = readSte(b)
            (name(nameOff), hdr)
          }
        case other =>
          throw new IllegalArgumentException(s"$path: unexpected node '$other'")
      }
    }
    walk(btreeAddr)
  }

  /** All (type, dataPos, dataSize) messages of a v1 object header,
    * following continuation blocks (type 0x0010).
    */
  private def readMessages(buf: ByteBuffer, hdrAddr: Long,
                           path: String): Seq[(Int, Int, Int)] = {
    val b = buf.duplicate().order(ByteOrder.LITTLE_ENDIAN)
    b.position(hdrAddr.toInt)
    val ver = b.get() & 0xff
    require(ver == 1,
      s"$path: object header v$ver unsupported (v1 only — netcdf-c default; " +
        "files written with H5F_LIBVER_LATEST need conversion)")
    b.get() // reserved
    val nMess = b.getShort() & 0xffff
    b.getInt() // reference count
    val hdrSize = b.getInt()
    b.getInt() // padding: messages start 8-aligned
    val out = scala.collection.mutable.ArrayBuffer.empty[(Int, Int, Int)]
    var blocks = List((b.position(), hdrSize))
    while (out.size < nMess && blocks.nonEmpty) {
      val (start, len) = blocks.head
      blocks = blocks.tail
      val mb = buf.duplicate().order(ByteOrder.LITTLE_ENDIAN)
      mb.position(start)
      val end = start + len
      while (out.size < nMess && mb.position() + 8 <= end) {
        val typ = mb.getShort() & 0xffff
        val size = mb.getShort() & 0xffff
        mb.getInt() // flags + reserved
        val dataPos = mb.position()
        if (typ == 0x0010) { // continuation: (offset, length)
          val cb = slice(buf, dataPos, size)
          blocks = blocks :+ ((cb.getLong().toInt, cb.getLong().toInt))
        } else out += ((typ, dataPos, size))
        mb.position(dataPos + size)
      }
    }
    out.toSeq
  }

  private def slice(buf: ByteBuffer, pos: Int, len: Int): ByteBuffer = {
    val b = buf.duplicate().order(ByteOrder.LITTLE_ENDIAN)
    b.position(pos)
    b
  }

  /** Parse one linked object as a dataset; None for sub-groups (a grid
    * file's root holds only datasets, but be permissive).
    */
  private def parseDataset(buf: ByteBuffer, name: String, hdrAddr: Long,
                           path: String): Option[(String, Dataset)] = {
    val msgs = readMessages(buf, hdrAddr, path)
    if (msgs.exists(_._1 == 0x0011)) return None // a sub-group, skip
    val space = msgs.find(_._1 == 0x0001)
    val dtype = msgs.find(_._1 == 0x0003)
    val layout = msgs.find(_._1 == 0x0008)
    if (space.isEmpty || dtype.isEmpty || layout.isEmpty) return None
    require(!msgs.exists(_._1 == 0x000B),
      s"$path: dataset '$name' has a filter pipeline (deflate/shuffle) — " +
        "compressed netCDF-4 unsupported; `nccopy -d 0 -k classic` converts")

    val sp = slice(buf, space.get._2, space.get._3)
    val spVer = sp.get() & 0xff
    val ndims = sp.get() & 0xff
    val spFlags = sp.get() & 0xff
    spVer match {
      case 1 => sp.position(sp.position() + 5) // reserved
      case 2 => // third byte already consumed as flags; next is type — rewind
        sp.position(space.get._2 + 4)
      case v => throw new IllegalArgumentException(s"$path: dataspace v$v")
    }
    // v2: layout is ver(1) ndims(1) flags(1) type(1) then dims
    val dims = (0 until ndims).map(_ => sp.getLong().toInt)
    val _ = spFlags // max-dims follow the dims; not needed

    val dt = slice(buf, dtype.get._2, dtype.get._3)
    val clsVer = dt.get() & 0xff
    val dtClass = clsVer & 0x0f
    val bits0 = dt.get() & 0xff
    dt.get(); dt.get() // bit-field bytes 1-2
    val dtSize = dt.getInt()
    val littleEndian = (bits0 & 0x01) == 0

    val lo = slice(buf, layout.get._2, layout.get._3)
    val loVer = lo.get() & 0xff
    require(loVer == 3, s"$path: data layout v$loVer unsupported (v3 only)")
    val loClass = lo.get() & 0xff
    require(loClass == 1,
      s"$path: dataset '$name' layout class $loClass (0=compact, 2=chunked) — " +
        "only contiguous storage supported; `nccopy -k classic` converts")
    val addr = lo.getLong()
    val size = lo.getLong()
    Some(name -> Dataset(name, dims, dtClass, dtSize, littleEndian, addr, size))
  }

  /** Load a 2-D (lat, lon) grid variable + 1-D coordinate variables —
    * the netCDF-4 twin of [[NetcdfReader.grid]], same uniform-spacing
    * contract.
    */
  def grid(path: String, varName: String,
           latVar: String = "lat", lonVar: String = "lon"): Grid = {
    val h5 = open(path)
    NetcdfReader.buildGrid(path, varName, latVar, lonVar,
      h5.readDoubles(latVar), h5.readDoubles(lonVar),
      h5.shape(varName), h5.readDoubles(varName))
  }
}
