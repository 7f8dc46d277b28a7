package graft.sources.geo

import java.nio.{ByteBuffer, ByteOrder}
import java.util.zip.Inflater

import graft.ops.Grid

/** Minimal pure-JVM reader for the HDF5 subset that netCDF-4 writes for
  * grid files — the missing half of [[NetcdfReader]] (which handles
  * classic CDF-1/CDF-2): modern GEBCO/EMODnet bathymetry downloads
  * (`/root/reference/src/main.py:560,595` via `get_elev_netcdf`) are
  * frequently netCDF-4, i.e. HDF5 containers, and typically chunked +
  * deflated.
  *
  * Implements the profile needed for float/int grids, per the public
  * "HDF5 File Format Specification" (The HDF Group, version 3.0):
  * superblock v0/v1 AND v2/v3 (the `H5F_LIBVER_LATEST` / recent-h5py
  * layout), version-1 object headers (with continuation blocks) AND
  * version-2 "OHDR" headers (per-chunk checksums accounted, "OCHK"
  * continuations), old-style groups (Symbol Table message → v1 B-tree
  * + local heap → SNOD leaf nodes) AND new-style compact groups (Link
  * messages in the header), Dataspace v1/v2, Datatype classes 0
  * (fixed) and 1 (IEEE float), Data Layout v3 contiguous AND chunked
  * (v1 B-tree chunk index) AND v4 (contiguous; chunked under Single
  * Chunk, Implicit, Fixed Array — the fixed-dims indexes the latest
  * format writes — Extensible Array for a leading unlimited/record
  * dimension, direct blocks, and v2 B-tree — type 10/11 records, any
  * depth — for several unlimited dims), filter pipeline v1/v2 with
  * deflate
  * (`java.util.zip.Inflater` — the zlib stream's own adler32
  * integrity-checks each chunk), shuffle (byte de-interleave), and
  * fletcher32 (checksum stripped), and Attribute messages v1–v3 for
  * the xarray/netCDF decoding conventions: `scale_factor`,
  * `add_offset`, `_FillValue` / `missing_value` (fill → NaN), applied
  * exactly like [[NetcdfReader.NcFile.readDoubles]] so a packed or
  * fill-bearing grid decodes identically through either container.
  *
  * Root-group links resolve in all four layouts — old-style symbol
  * tables (incl. cache-type-2 symbolic links), compact Link messages,
  * and dense (fractal-heap) storage — with SOFT links followed to
  * their root-level hard target (chains ≤ 8 hops; dangling, cyclic or
  * nested-path targets fail loudly, as do external links).
  *
  * Superblock extensions are accepted when they carry only
  * bookkeeping messages (File Space Info, Driver Info, B-tree K,
  * refcount — none change how datasets decode); a Shared Message
  * Table, or any extension message outside that allowlist, fails
  * loudly. Dense-group heap IDs decode in every unfiltered
  * library-written form — managed, tiny (normal AND extended
  * sub-types: payload inline in the ID), and huge both directly
  * accessed (address+length in the ID) and indirectly accessed (via
  * the heap's type-1 huge-object v2 B-tree).
  *
  * Everything else — FILTERED huge heap objects (type-2/4 B-trees),
  * indirect-within-indirect link heap rows,
  * non-8-byte offsets, unknown filters, a conventions attribute this
  * reader cannot decode — fails LOUDLY with a message naming the
  * limitation and the one-line `nccopy` escape hatch; this reader
  * never misparses what it does not support. Files ≥ 2 GiB are
  * rejected up front (in-memory reader, `Int` positions). Jenkins
  * lookup3 checksums (superblock v2+, OHDR chunks, Fixed Array blocks)
  * are structural — accounted for, not verified — matching the
  * fletcher32 stance.
  */
object Hdf5Reader {

  private val Undef = -1L // 0xFFFF_FFFF_FFFF_FFFF = "undefined address"

  /** One root-group link before resolution: hard (object header
    * address) or soft (a path string, resolved within the root group —
    * chains followed to [[MaxSoftHops]], dangling/nested/external fail
    * loudly).
    */
  private sealed trait RootLink { def name: String }
  private final case class HardLink(name: String, addr: Long) extends RootLink
  private final case class SoftLink(name: String, target: String) extends RootLink

  private val MaxSoftHops = 8

  /** Resolve soft links against the root group's hard links. Supported
    * target shape: `/name` or `name` (this reader loads root-group
    * datasets, so a nested path has nothing it could legally name);
    * chains up to [[MaxSoftHops]]; cycles and dangling targets fail
    * loudly with the link named.
    */
  private def resolveLinks(links: Seq[RootLink],
                           path: String): Seq[(String, Long)] = {
    val hard = links.collect { case HardLink(n, a) => n -> a }
    val hardMap = hard.toMap
    val softMap = links.collect { case SoftLink(n, t) => n -> t }.toMap
    def seg(t: String, owner: String): String = {
      val s = if (t.startsWith("/")) t.substring(1) else t
      require(s.nonEmpty && !s.contains("/"),
        s"$path: soft link '$owner' targets '$t' — only root-level " +
          "targets are supported (this reader loads root-group datasets)")
      s
    }
    val resolved = softMap.toSeq.sortBy(_._1).map { case (n, t0) =>
      var cur = seg(t0, n)
      var hops = 0
      while (softMap.contains(cur) && hops < MaxSoftHops) {
        cur = seg(softMap(cur), n)
        hops += 1
      }
      require(!softMap.contains(cur),
        s"$path: soft link '$n' chain exceeds $MaxSoftHops hops (cycle?)")
      n -> hardMap.getOrElse(cur, throw new IllegalArgumentException(
        s"$path: soft link '$n' -> '/$cur' dangles (no such root object)"))
    }
    hard ++ resolved
  }

  /** Attribute names whose loss would silently change decoded values —
    * an undecodable attribute with one of these names is an error, not
    * a skip.
    */
  private val ConventionAtts =
    Set("_FillValue", "missing_value", "scale_factor", "add_offset")

  /** One filter pipeline entry, in write-application order. */
  final case class Filter(id: Int, client: Seq[Int])

  sealed trait Layout
  final case class Contiguous(addr: Long, size: Long) extends Layout

  /** How a chunked dataset's chunks are located. V1 B-tree is what
    * classic (superblock v0/v1) files use; the other three are the v4
    * data-layout chunk indexes the latest file format writes for
    * fixed-dimension datasets; Extensible Array covers the
    * one-unlimited-dim (netCDF record dimension) files h5py/netCDF-4
    * write. (v2 B-tree indexes — multi-unlimited dims — reject loudly.)
    */
  sealed trait ChunkIndex
  final case class BtreeV1(addr: Long) extends ChunkIndex
  /** One chunk covers the whole dataset; `filtered` = (size, mask). */
  final case class SingleChunk(addr: Long,
                               filtered: Option[(Long, Int)]) extends ChunkIndex
  /** Unfiltered chunks laid out contiguously in linear chunk order. */
  final case class ImplicitIndex(addr: Long) extends ChunkIndex
  /** Fixed Array index: FAHD header → FADB element block. */
  final case class FixedArrayIndex(addr: Long) extends ChunkIndex
  /** Extensible Array index (one unlimited dim): EAHD header → EAIB
    * index block (direct elements + direct EADB data blocks; super
    * blocks reject loudly).
    */
  final case class ExtensibleArrayIndex(addr: Long) extends ChunkIndex
  /** v2-B-tree chunk index (layout v4 type 5: >1 unlimited dim). */
  final case class Btree2Index(addr: Long) extends ChunkIndex

  /** `chunkDims` excludes the trailing element-size pseudo-dimension. */
  final case class Chunked(index: ChunkIndex, chunkDims: Seq[Int]) extends Layout

  final case class Dataset(name: String, dims: Seq[Int], dtClass: Int,
                           dtSize: Int, littleEndian: Boolean,
                           layout: Layout, filters: Seq[Filter],
                           numAtts: Map[String, Double])

  final case class H5File(datasets: Map[String, Dataset], bytes: Array[Byte],
                          path: String) {
    def shape(name: String): Seq[Int] = dataset(name).dims

    def dataset(name: String): Dataset = datasets.getOrElse(name,
      throw new IllegalArgumentException(
        s"no dataset '$name' (found: ${datasets.keys.toSeq.sorted.mkString(", ")})"))

    /** Materialize a dataset as doubles (row-major), with the
      * scale/offset/fill conventions applied (same semantics as
      * [[NetcdfReader.NcFile.readDoubles]]).
      */
    def readDoubles(name: String): Array[Double] = {
      val d = dataset(name)
      // same friendly-failure envelope as open(): a bogus data address
      // in a corrupt file must not surface as a raw buffer exception
      try {
        val raw = d.layout match {
          case c: Contiguous => readContiguous(d, c)
          case c: Chunked => readChunked(d, c)
        }
        applyConventions(d, raw)
      } catch {
        case _: java.nio.BufferUnderflowException |
             _: IndexOutOfBoundsException | _: NegativeArraySizeException =>
          throw new IllegalArgumentException(
            s"$path: truncated or corrupt HDF5/netCDF-4 data for '$name'")
        case e: java.util.zip.DataFormatException =>
          throw new IllegalArgumentException(
            s"$path: corrupt deflate stream in chunk of '$name': ${e.getMessage}")
      }
    }

    private def readContiguous(d: Dataset, c: Contiguous): Array[Double] = {
      val n = d.dims.product
      require(c.addr != Undef, s"dataset '${d.name}' has no allocated data")
      val b = ByteBuffer.wrap(bytes).order(
        if (d.littleEndian) ByteOrder.LITTLE_ENDIAN else ByteOrder.BIG_ENDIAN)
      b.position(c.addr.toInt)
      decodeElems(b, n, d, name = d.name)
    }

    private def readChunked(d: Dataset, c: Chunked): Array[Double] = {
      val ndims = d.dims.length
      require(c.chunkDims.length == ndims,
        s"$path: chunk rank ${c.chunkDims.length} != dataset rank $ndims for '${d.name}'")
      val n = d.dims.product
      // unwritten chunks read as the fill value; the conventions pass
      // then maps fill → NaN exactly like explicit fill elements
      val fill = d.numAtts.get("_FillValue")
        .orElse(d.numAtts.get("missing_value")).getOrElse(0.0)
      val out = Array.fill(n)(fill)
      val idxAddr = c.index match {
        case BtreeV1(a) => a
        case SingleChunk(a, _) => a
        case ImplicitIndex(a) => a
        case FixedArrayIndex(a) => a
        case ExtensibleArrayIndex(a) => a
        case Btree2Index(a) => a
      }
      if (idxAddr == Undef) return out // no chunk was ever written
      val gStrides = new Array[Long](ndims)
      gStrides(ndims - 1) = 1
      var s = ndims - 2
      while (s >= 0) { gStrides(s) = gStrides(s + 1) * d.dims(s + 1); s -= 1 }
      val cd = c.chunkDims.toArray
      val nc = cd.product
      val b = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
      val entries = c.index match {
        case BtreeV1(a) => chunkEntries(b, a, ndims, path)
        case SingleChunk(a, filtered) =>
          val (sz, mask) = filtered.getOrElse((nc.toLong * d.dtSize, 0))
          Seq((sz.toInt, mask, new Array[Long](ndims), a))
        case ImplicitIndex(a) =>
          implicitEntries(a, d.dims.toArray, cd, nc * d.dtSize)
        case FixedArrayIndex(a) =>
          fixedArrayEntries(b, a, d, cd, nc, path)
        case ExtensibleArrayIndex(a) =>
          extensibleArrayEntries(b, a, d, cd, nc, path)
        case Btree2Index(a) =>
          btree2ChunkEntries(b, a, cd, nc * d.dtSize, path)
      }
      // an Undef entry address = chunk never allocated (sparse dataset
      // under a Fixed Array index): those cells keep the fill value
      entries.filter(_._4 != Undef).foreach { case (storedSize, mask, offsets, addr) =>
        var data = java.util.Arrays.copyOfRange(
          bytes, addr.toInt, addr.toInt + storedSize)
        // filters un-apply in reverse pipeline order; filter-mask bit i
        // set means pipeline entry i was SKIPPED when this chunk was
        // written (spec: "Filter Mask" in the chunk B-tree key)
        d.filters.zipWithIndex.reverse.foreach { case (f, i) =>
          if ((mask & (1 << i)) == 0) data = unfilter(f, data, nc * d.dtSize, d)
        }
        require(data.length >= nc * d.dtSize,
          s"$path: chunk at ${offsets.mkString(",")} of '${d.name}' " +
            s"decoded to ${data.length} bytes, expected ${nc * d.dtSize}")
        val bb = ByteBuffer.wrap(data).order(
          if (d.littleEndian) ByteOrder.LITTLE_ENDIAN else ByteOrder.BIG_ENDIAN)
        val elems = decodeElems(bb, nc, d, name = d.name)
        // scatter the (full-size, edge-padded) chunk into the global
        // row-major array, skipping out-of-bounds edge padding
        val coord = new Array[Int](ndims)
        var k = 0
        while (k < nc) {
          var g = 0L
          var ok = true
          var i = 0
          while (i < ndims) {
            val gi = offsets(i) + coord(i)
            if (gi >= d.dims(i)) ok = false
            g += gi * gStrides(i)
            i += 1
          }
          if (ok) out(g.toInt) = elems(k)
          var dd = ndims - 1
          var carry = true
          while (dd >= 0 && carry) {
            coord(dd) += 1
            if (coord(dd) == cd(dd)) { coord(dd) = 0; dd -= 1 }
            else carry = false
          }
          k += 1
        }
      }
      out
    }

    private def unfilter(f: Filter, data: Array[Byte], rawSize: Int,
                         d: Dataset): Array[Byte] = f.id match {
      case 1 => // deflate (zlib stream — adler32 checked by Inflater)
        val inf = new Inflater()
        inf.setInput(data)
        val out = new Array[Byte](rawSize)
        var off = 0
        while (!inf.finished() && off < rawSize) {
          val got = inf.inflate(out, off, rawSize - off)
          if (got == 0 && inf.needsInput())
            throw new IllegalArgumentException(
              s"$path: truncated deflate chunk in '${d.name}'")
          off += got
        }
        inf.end()
        out
      case 2 => // shuffle: stored as all byte-0s, then all byte-1s, …
        val es = f.client.headOption.getOrElse(d.dtSize)
        if (es <= 1) data
        else {
          val nElems = data.length / es
          val out = new Array[Byte](data.length)
          var j = 0
          while (j < es) {
            var i = 0
            while (i < nElems) {
              out(i * es + j) = data(j * nElems + i)
              i += 1
            }
            j += 1
          }
          // trailing bytes (length not divisible by es) copy through
          var t = nElems * es
          while (t < data.length) { out(t) = data(t); t += 1 }
          out
        }
      case 3 => // fletcher32: payload + 4 checksum bytes; strip (deflate's
        // adler32 already integrity-checks the payload when both are on)
        java.util.Arrays.copyOfRange(data, 0, data.length - 4)
      case other => throw new IllegalArgumentException(
        s"$path: dataset '${d.name}' uses unsupported filter id $other " +
          "(deflate/shuffle/fletcher32 only); `nccopy -d 0 -k classic` converts")
    }

    private def decodeElems(b: ByteBuffer, n: Int, d: Dataset,
                            name: String): Array[Double] = {
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

    /** xarray-style decoding, identical to the classic reader: fill
      * compares against the RAW value, everything else scales.
      */
    private def applyConventions(d: Dataset, raw: Array[Double]): Array[Double] = {
      val fill = d.numAtts.get("_FillValue").orElse(d.numAtts.get("missing_value"))
      val scale = d.numAtts.getOrElse("scale_factor", 1.0)
      val offset = d.numAtts.getOrElse("add_offset", 0.0)
      if (fill.isEmpty && scale == 1.0 && offset == 0.0) return raw
      var i = 0
      while (i < raw.length) {
        raw(i) = fill match {
          case Some(f) if raw(i) == f => Double.NaN
          case _ => raw(i) * scale + offset
        }
        i += 1
      }
      raw
    }
  }

  def isHdf5(bytes: Array[Byte]): Boolean =
    bytes.length >= 8 && (bytes(0) & 0xff) == 0x89 && bytes(1) == 'H' &&
      bytes(2) == 'D' && bytes(3) == 'F' && bytes(4) == 0x0d &&
      bytes(5) == 0x0a && (bytes(6) & 0xff) == 0x1a && bytes(7) == 0x0a

  def open(path: String): H5File = {
    val size = java.nio.file.Files.size(java.nio.file.Paths.get(path))
    require(size < Int.MaxValue,
      s"$path: $size bytes — this in-memory reader supports files < 2 GiB; " +
        "subset the grid (`nccopy` with hyperslabs / `cdo sellonlatbox`) first")
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
    require(sbVer <= 3,
      s"$path: superblock v$sbVer unsupported (v0–v3 only)")
    val links: Seq[RootLink] =
      if (sbVer <= 1) {
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
        val (_, rootHdr, rootCache, rs0, rs1) = readSte(buf)
        val (rootBtree, rootHeap) =
          if (rootCache == 1) (rs0, rs1) else (Undef, Undef)
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
        readGroup(buf, btree, heap, path)
      } else {
        // superblock v2/v3 (the H5F_LIBVER_LATEST / SWMR layout — same
        // fields in both versions): sizes, flags, four addresses, then
        // a Jenkins-lookup3 checksum (structural here, like the other
        // checksums this reader accounts for but does not verify)
        val offSize = buf.get() & 0xff
        val lenSize = buf.get() & 0xff
        require(offSize == 8 && lenSize == 8,
          s"$path: only 8-byte offsets/lengths supported (got $offSize/$lenSize)")
        buf.get() // file consistency flags
        val base = buf.getLong()
        require(base == 0, s"$path: nonzero base address $base unsupported")
        val sbExt = buf.getLong()
        if (sbExt != Undef) checkSuperblockExtension(buf, sbExt, path)
        buf.getLong() // end-of-file address
        val rootHdr = buf.getLong()
        buf.getInt() // superblock checksum
        rootLinksFromHeader(buf, rootHdr, path)
      }
    val datasets = resolveLinks(links, path).flatMap { case (name, addr) =>
      parseDataset(buf, name, addr, path)
    }.toMap
    H5File(datasets, bytes, path)
  }

  /** Superblock extension: an object header the library hangs
    * bookkeeping messages off (HDF5 1.10+ writes one routinely — File
    * Space Info on every `H5Pset_file_space_strategy` file). None of
    * the bookkeeping types change how DATASETS decode, so they are
    * verified-and-ignored; the one extension message that WOULD — a
    * Shared Message Table (datatype/dataspace messages elsewhere then
    * become indirect references this reader would misparse) — fails
    * loudly, as does any type outside the known-bookkeeping allowlist
    * (an unknown extension message could be anything, including a
    * future sharing mechanism — never misparse).
    */
  private val SbExtensionIgnorable: Set[Int] = Set(
    0x0000, // NIL
    0x000A, // Group Info (root-group defaults — link layout is explicit)
    0x0013, // B-tree 'K' Values (v1-B-tree widths — walks are exhaustive)
    0x0014, // Driver Info (multi/family file drivers don't change bytes)
    0x0016, // Object Reference Count
    0x0017) // File Space Info (free-space tracking — reads unaffected)

  private def checkSuperblockExtension(buf: ByteBuffer, addr: Long,
                                       path: String): Unit =
    readMessages(buf, addr, path).foreach { case (typ, _, _) =>
      require(typ != 0x000F,
        s"$path: superblock extension carries a Shared Message Table — " +
          "shared messages are unsupported; `nccopy -k classic` converts")
      require(SbExtensionIgnorable.contains(typ),
        f"$path: superblock extension message type 0x$typ%04x " +
          "unsupported; `nccopy -k classic` converts")
    }

  /** Root links of a message-driven (new-style) group: compact Link
    * messages in the root object header (the layout the latest format
    * writes for small groups); an old-style Symbol Table message is
    * also honored (a v2 superblock may still point at an old-style
    * group). Dense groups — Link Info with a fractal heap and no
    * compact links — are rejected loudly.
    */
  private def rootLinksFromHeader(buf: ByteBuffer, rootHdr: Long,
                                  path: String): Seq[RootLink] = {
    val msgs = readMessages(buf, rootHdr, path)
    msgs.find(_._1 == 0x0011) match {
      case Some(st) =>
        val d = slice(buf, st._2, st._3)
        readGroup(buf, d.getLong(), d.getLong(), path)
      case None =>
        val links = msgs.filter(_._1 == 0x0006)
          .map(m => readLink(buf, m._2, m._3, path))
        if (links.nonEmpty) links
        else msgs.find(_._1 == 0x0002) match { // Link Info → dense storage
          case Some(li) => readDenseLinks(buf, li._2, li._3, path)
          case None => throw new IllegalArgumentException(
            s"$path: root group has neither compact Link messages nor a " +
              "Link Info message — unsupported group layout")
        }
    }
  }

  /** Dense link storage (the latest-format layout once a group exceeds
    * the compact-message threshold, 8 links by library default — a
    * netCDF-4 file with many variables): the Link Info message points at
    * a fractal heap holding each link message as a managed object, and a
    * v2 B-tree (type 5, name index) whose records carry the heap IDs.
    * Enumeration = walk the B-tree leaf records, decode each managed
    * heap ID to (heap offset, length) via the heap's doubling table, and
    * parse the object bytes as a Link message.
    *
    * Heap IDs decode in every unfiltered written form: managed (offset
    * + length into a direct block), tiny — normal and extended
    * sub-types — (the link message rides inline in the ID), huge
    * directly accessed (file address + length in the ID — the form
    * written when the heap's ID length fits addr+len, ≥ 17; the
    * type-3 tracking B-tree the library also writes is ignored on
    * read), and huge indirectly accessed (the ID carries a
    * huge-object id resolved through the heap's type-1 v2 B-tree).
    *
    * Never-misparse bounds, all failing loudly: FILTERED huge objects
    * (type-2/4 huge B-trees) reject in the B-tree type check;
    * unfiltered heaps only; direct-block rows only (an indirect-block
    * hierarchy means >maxDirect×width bytes of link names).
    */
  private def readDenseLinks(buf: ByteBuffer, pos: Int, size: Int,
                             path: String): Seq[RootLink] = {
    val b = slice(buf, pos, size)
    val ver = b.get() & 0xff
    require(ver == 0, s"$path: Link Info message v$ver unsupported")
    val flags = b.get() & 0xff
    if ((flags & 0x01) != 0) b.getLong() // max creation index
    val fheapAddr = b.getLong()
    val nameBtAddr = b.getLong()
    require(fheapAddr != Undef && nameBtAddr != Undef,
      s"$path: dense group without fractal heap / name index")
    val heap = readFractalHeapHeader(buf, fheapAddr, path)
    // indirect huge objects: the heap's huge-object v2 B-tree (type 1 =
    // unfiltered) maps huge-object IDs to (file address, length); read
    // it once, lazily — only heaps that actually hold huge objects pay
    lazy val (hugeIdSize, hugeMap): (Int, Map[Seq[Byte], (Long, Long)]) = {
      val (_, recSize, recs) = walkBtree2(buf, heap.hugeBtAddr, path, Set(1))
      val idSize = recSize - 16
      require(idSize >= 1 && idSize <= 8,
        s"$path: huge-object B-tree ID size $idSize unsupported")
      (idSize, recs.map { r =>
        val rb = ByteBuffer.wrap(r).order(ByteOrder.LITTLE_ENDIAN)
        val addr = rb.getLong(); val len = rb.getLong()
        (r.slice(16, 16 + idSize).toSeq, (addr, len))
      }.toMap)
    }
    val ids = readBtree2LeafRecords(buf, nameBtAddr, path)
    ids.map { id =>
      val flag = id(0) & 0xff
      require((flag & 0xc0) == 0, s"$path: heap ID version ${flag >> 6}")
      val ib = ByteBuffer.wrap(id).order(ByteOrder.LITTLE_ENDIAN)
      ib.position(1)
      (flag & 0x30) match {
        case 0x00 => // managed: (heap offset, length) into a direct block
          val off = readUintLE(ib, heap.offBytes)
          val len = readUintLE(ib, heap.lenBytes).toInt
          readLink(buf, heap.fileAddr(off, path), len, path)
        case 0x20 => // tiny: the link message IS the ID payload. The
          // sub-type is a property of the HEAP, not the ID (H5HFtiny.c):
          // normal (length-1 in the flag nibble) iff the heap's ID
          // length ≤ 17, extended at ≥ 18 — where the flag nibble holds
          // the HIGH 4 bits of length-1 and a second byte the low 8
          // (payloads up to 4096)
          val len =
            if (heap.idLen < 18) (flag & 0x0f) + 1
            else (((flag & 0x0f) << 8) | (ib.get() & 0xff)) + 1
          val hdrLen = if (heap.idLen < 18) 1 else 2
          require(hdrLen + len <= id.length,
            s"$path: tiny heap ID payload $len overruns the ${id.length}-byte ID")
          readLinkFrom(ib, path)
        case 0x10 if heap.idLen >= 17 =>
          // huge, directly accessed: (file address, length) live in the
          // ID itself. The library picks direct encoding from the heap
          // ID length (≥ 1 + sizeof_addr + sizeof_size = 17), NOT from
          // B-tree absence — it still keeps a type-3 huge-object v2
          // B-tree for deletion tracking, so hugeBtAddr is set even in
          // direct files and must not key this branch
          val addr = ib.getLong()
          val len = ib.getLong()
          readLink(buf, addr.toInt, len.toInt, path)
        case 0x10 => // huge, indirectly accessed: the ID carries a
          // huge-object id; the heap's type-1 (unfiltered) v2 B-tree
          // maps it to (address, length). A type-2/4 tree (FILTERED
          // huge objects) fails in walkBtree2's type check, loudly.
          val key = id.slice(1, 1 + hugeIdSize).toSeq
          val (addr, len) = hugeMap.getOrElse(key,
            throw new IllegalArgumentException(
              s"$path: huge heap ID not present in the huge-object B-tree"))
          readLink(buf, addr.toInt, len.toInt, path)
        case other => throw new IllegalArgumentException(
          s"$path: reserved heap ID type ${other >> 4} unsupported")
      }
    }
  }

  private[graft] final case class FractalHeap(offBytes: Int, lenBytes: Int,
                                              width: Int, startBlock: Long,
                                              blockAddrs: IndexedSeq[Long],
                                              idLen: Int = 0,
                                              hugeBtAddr: Long = Undef) {
    /** File position of heap offset `off` via the doubling table: rows
      * 0 and 1 hold `width` blocks of `startBlock` bytes, row r ≥ 2
      * doubles the block size; row r ≥ 1 starts at heap offset
      * width·startBlock·2^(r−1). Heap offsets include each block's own
      * header, so the file position is blockAddr + (off − blockStart).
      */
    def fileAddr(off: Long, path: String): Int = {
      val ws = width * startBlock
      val (row, rowStart, blockSize) =
        if (off < ws) (0, 0L, startBlock)
        else {
          var r = 1
          while (ws * (1L << r) <= off) r += 1 // off < start(r+1)
          (r, ws * (1L << (r - 1)), startBlock << (r - 1))
        }
      val col = ((off - rowStart) / blockSize).toInt
      val idx = row * width + col
      require(idx < blockAddrs.length && blockAddrs(idx) != Undef,
        s"$path: link heap offset $off outside allocated direct blocks")
      (blockAddrs(idx) + (off - (rowStart + col * blockSize))).toInt
    }
  }

  /** FRHP header → the doubling-table geometry plus the direct-block
    * address list (a single root direct block, or the direct rows of a
    * root FHIB indirect block).
    */
  private def readFractalHeapHeader(buf: ByteBuffer, addr: Long,
                                    path: String): FractalHeap = {
    require(bytesAt(buf, addr.toInt, 4) == "FRHP",
      s"$path: fractal heap signature missing at $addr")
    val b = slice(buf, addr.toInt + 4, 0)
    val ver = b.get() & 0xff
    require(ver == 0, s"$path: fractal heap v$ver unsupported")
    val heapIdLen = b.getShort() & 0xffff
    val ioFilterLen = b.getShort() & 0xffff
    require(ioFilterLen == 0,
      s"$path: filtered link heap unsupported")
    b.get() // flags (direct-block checksums are structural here)
    b.getInt() // max managed object size
    b.getLong() // next huge object id
    val hugeBtAddr = b.getLong() // huge-object v2 B-tree (Undef = direct IDs)
    b.getLong(); b.getLong() // free space, free-space manager address
    b.getLong(); b.getLong() // managed space, allocated managed space
    b.getLong() // direct-block iterator offset
    b.getLong() // number of managed objects
    b.getLong(); b.getLong() // huge size, huge count
    b.getLong(); b.getLong() // tiny size, tiny count
    val width = b.getShort() & 0xffff
    val startBlock = b.getLong()
    val maxDirect = b.getLong()
    val maxHeapBits = b.getShort() & 0xffff
    b.getShort() // starting # rows in root indirect block
    val rootAddr = b.getLong()
    val curRows = b.getShort() & 0xffff
    val offBytes = (maxHeapBits + 7) / 8
    val lenBytes = (64 - java.lang.Long.numberOfLeadingZeros(maxDirect - 1) + 7) / 8
    // the header's ID length is authoritative; managed IDs use the
    // geometry-derived 1+off+len prefix and pad the rest, a wider ID
    // also leaves room for tiny payloads / direct huge (addr, len)
    require(1 + offBytes + lenBytes <= heapIdLen,
      s"$path: heap ID length $heapIdLen < 1+$offBytes+$lenBytes")
    require(rootAddr != Undef, s"$path: empty link heap")
    val blockAddrs: IndexedSeq[Long] =
      if (curRows == 0) IndexedSeq(rootAddr) // root IS a direct block
      else {
        // rows of direct blocks in a root FHIB; indirect children sit
        // beyond maxDirectRows and reject loudly
        val maxDirectRows =
          java.lang.Long.numberOfTrailingZeros(maxDirect / startBlock) + 2
        require(curRows <= maxDirectRows,
          s"$path: link heap has indirect-block rows ($curRows > " +
            s"$maxDirectRows) — unsupported")
        require(bytesAt(buf, rootAddr.toInt, 4) == "FHIB",
          s"$path: indirect block signature missing at $rootAddr")
        val ib = slice(buf, rootAddr.toInt + 4, 0)
        val iver = ib.get() & 0xff
        require(iver == 0, s"$path: indirect block v$iver unsupported")
        ib.getLong() // heap header address
        readUintLE(ib, offBytes) // block offset of this indirect block
        (0 until curRows * width).map(_ => ib.getLong())
      }
    FractalHeap(offBytes, lenBytes, width, startBlock, blockAddrs,
      heapIdLen, hugeBtAddr)
  }

  /** v2 B-tree (BTHD), any depth: returns each record's bytes minus the
    * 4-byte name hash — i.e. the fractal heap IDs — in tree order.
    *
    * Node capacities follow the library's published geometry (H5B2):
    * every node (leaf BTLF or internal BTIN) owns `nodeSize` bytes with
    * a 10-byte frame (4 signature + 1 version + 1 type + 4 checksum); a
    * child pointer is 8 (address) + maxNrecSize (child record count,
    * sized for the max LEAF record count) + — only when the child is
    * itself internal — cumMaxNrecSize(childDepth) (total subtree record
    * count, sized for that depth's cumulative capacity). Internal nodes
    * carry real records BETWEEN child pointers, so in-order enumeration
    * interleaves child walks with the node's own records.
    */
  private def readBtree2LeafRecords(buf: ByteBuffer, addr: Long,
                                    path: String): Seq[Array[Byte]] = {
    val (_, recSize, recs) = walkBtree2(buf, addr, path, Set(5))
    recs.map { r =>
      // drop the 4-byte name hash (lookup index — enumeration skips it)
      java.util.Arrays.copyOfRange(r, 4, recSize)
    }
  }

  /** Generic v2 B-tree walk (any depth): returns (type, record size,
    * raw record bytes in tree order). Shared by the dense-link name
    * index (type 5) and the chunk indexes (types 10/11).
    */
  private def walkBtree2(buf: ByteBuffer, addr: Long, path: String,
                         wantTypes: Set[Int]): (Int, Int, Seq[Array[Byte]]) = {
    require(bytesAt(buf, addr.toInt, 4) == "BTHD",
      s"$path: v2 B-tree signature missing at $addr")
    val b = slice(buf, addr.toInt + 4, 0)
    val ver = b.get() & 0xff
    require(ver == 0, s"$path: v2 B-tree v$ver unsupported")
    val btType = b.get() & 0xff
    require(wantTypes.contains(btType),
      s"$path: v2 B-tree type $btType (expected ${wantTypes.toSeq.sorted.mkString("/")})")
    val nodeSize = b.getInt()
    val recSize = b.getShort() & 0xffff
    val depth = b.getShort() & 0xffff
    b.get(); b.get() // split / merge percents
    val rootNode = b.getLong()
    val rootNrec = b.getShort() & 0xffff

    def log2Floor(v: Long): Int = 63 - java.lang.Long.numberOfLeadingZeros(v)
    // per-depth max records / cumulative subtree capacity (H5B2hdr.c)
    val maxLeafNrec = (nodeSize - 10L) / recSize
    require(maxLeafNrec > 0, s"$path: B-tree node size $nodeSize too small")
    val maxNrecSize = log2Floor(maxLeafNrec) / 8 + 1
    val cumMaxNrec = new Array[Long](depth + 1)
    val cumMaxNrecSize = new Array[Int](depth + 1)
    cumMaxNrec(0) = maxLeafNrec; cumMaxNrecSize(0) = 0
    for (u <- 1 to depth) {
      val ptrSize = 8 + maxNrecSize + cumMaxNrecSize(u - 1)
      val maxNrec = (nodeSize - 10L - ptrSize) / (recSize + ptrSize)
      require(maxNrec > 0,
        s"$path: B-tree node size $nodeSize too small for depth $u")
      cumMaxNrec(u) = (maxNrec + 1) * cumMaxNrec(u - 1) + maxNrec
      cumMaxNrecSize(u) = log2Floor(cumMaxNrec(u)) / 8 + 1
    }

    def record(nb: ByteBuffer): Array[Byte] = {
      val r = new Array[Byte](recSize)
      nb.get(r)
      r
    }

    def walk(nodeAddr: Long, nRec: Int, d: Int): Seq[Array[Byte]] =
      if (d == 0) {
        require(bytesAt(buf, nodeAddr.toInt, 4) == "BTLF",
          s"$path: B-tree leaf signature missing at $nodeAddr")
        val lb = slice(buf, nodeAddr.toInt + 4, 0)
        val lver = lb.get() & 0xff
        require(lver == 0, s"$path: B-tree leaf v$lver unsupported")
        val ltyp = lb.get() & 0xff
        require(ltyp == btType, s"$path: B-tree leaf type $ltyp != $btType")
        (0 until nRec).map(_ => record(lb))
      } else {
        require(bytesAt(buf, nodeAddr.toInt, 4) == "BTIN",
          s"$path: B-tree internal signature missing at $nodeAddr")
        val ib = slice(buf, nodeAddr.toInt + 4, 0)
        val iver = ib.get() & 0xff
        require(iver == 0, s"$path: B-tree internal v$iver unsupported")
        val ityp = ib.get() & 0xff
        require(ityp == btType, s"$path: B-tree internal type $ityp != $btType")
        val recs = (0 until nRec).map(_ => record(ib))
        val children = (0 to nRec).map { _ =>
          val caddr = ib.getLong()
          val cnrec = readUintLE(ib, maxNrecSize).toInt
          if (d >= 2) readUintLE(ib, cumMaxNrecSize(d - 1)) // subtree total
          (caddr, cnrec)
        }
        (0 to nRec).flatMap { i =>
          val sub = walk(children(i)._1, children(i)._2, d - 1)
          if (i < nRec) sub :+ recs(i) else sub
        }
      }
    (btType, recSize, walk(rootNode, rootNrec, depth))
  }

  /** v2-B-tree chunk index (layout v4 type 5 — the index the library
    * picks when MORE THAN ONE dimension is unlimited): type-10 records
    * (non-filtered: address + per-dim scaled offsets) or type-11
    * (filtered: + variable-width chunk size + 4-byte filter mask).
    * The variable chunk-size width is recovered from the header's
    * record size (recSize − 8 − 4 − 8·rank) rather than re-deriving
    * the library's clamp formula — self-validating against the file.
    */
  private def btree2ChunkEntries(buf: ByteBuffer, addr: Long, cd: Array[Int],
                                 rawChunkBytes: Int, path: String)
      : Seq[(Int, Int, Array[Long], Long)] = {
    val ndims = cd.length
    val (t, recSize, recs) = walkBtree2(buf, addr, path, Set(10, 11))
    val chunkSizeLen = if (t == 11) recSize - 8 - 4 - 8 * ndims else 0
    if (t == 10)
      require(recSize == 8 + 8 * ndims,
        s"$path: type-10 chunk record size $recSize != ${8 + 8 * ndims}")
    else
      require(chunkSizeLen >= 1 && chunkSizeLen <= 8,
        s"$path: type-11 chunk record size $recSize leaves " +
          s"$chunkSizeLen-byte chunk sizes (rank $ndims)")
    recs.map { r =>
      val rb = ByteBuffer.wrap(r).order(ByteOrder.LITTLE_ENDIAN)
      val a = rb.getLong()
      val (size, mask) =
        if (t == 11) (readUintLE(rb, chunkSizeLen).toInt, rb.getInt())
        else (rawChunkBytes, 0)
      val offs = new Array[Long](ndims)
      var i = 0
      while (i < ndims) { offs(i) = rb.getLong() * cd(i); i += 1 }
      (size, mask, offs, a)
    }
  }

  /** Decode a Link message (type 0x0006, version 1): hard links carry
    * the object header address, soft links their length-prefixed target
    * path (resolved by [[resolveLinks]]). External links (type 64) and
    * other user link classes fail loudly rather than silently dropping
    * a variable.
    */
  private def readLink(buf: ByteBuffer, pos: Int, size: Int,
                       path: String): RootLink =
    readLinkFrom(slice(buf, pos, size), path)

  /** Parse one v1 Link message at `b`'s position (file slice, or a tiny
    * heap ID's inline payload).
    */
  private def readLinkFrom(b: ByteBuffer, path: String): RootLink = {
    val ver = b.get() & 0xff
    require(ver == 1, s"$path: link message v$ver unsupported")
    val flags = b.get() & 0xff
    val linkType = if ((flags & 0x08) != 0) b.get() & 0xff else 0
    require(linkType == 0 || linkType == 1,
      s"$path: link type $linkType in root group unsupported " +
        "(hard and soft links only; external links need the target " +
        "file merged first — `nccopy` flattens them)")
    if ((flags & 0x04) != 0) b.getLong() // creation order
    if ((flags & 0x10) != 0) b.get() // link-name character set
    val nameLen = readUintLE(b, 1 << (flags & 0x03)).toInt
    val nameBytes = new Array[Byte](nameLen)
    b.get(nameBytes)
    val name = new String(nameBytes, "UTF-8")
    if (linkType == 0) HardLink(name, b.getLong())
    else {
      // soft link information: 2-byte value length + the path bytes
      val tLen = b.getShort() & 0xffff
      val t = new Array[Byte](tLen)
      b.get(t)
      SoftLink(name, new String(t, "UTF-8"))
    }
  }

  /** Symbol table entry: (link name offset, object header address,
    * cache type, scratch word 0). B-tree/heap addresses for cache type
    * 1 are scratch0/scratch1; cache type 2 (symbolic link) keeps the
    * link-value heap offset in the low half of scratch 0.
    */
  private def readSte(buf: ByteBuffer): (Long, Long, Int, Long, Long) = {
    val nameOff = buf.getLong()
    val hdrAddr = buf.getLong()
    val cacheType = buf.getInt()
    buf.getInt() // reserved
    val s0 = buf.getLong(); val s1 = buf.getLong() // scratch pad
    (nameOff, hdrAddr, cacheType, s0, s1)
  }

  /** Walk an old-style group's v1 B-tree; returns the links (hard, plus
    * cache-type-2 symbolic links whose target string lives in the local
    * heap).
    */
  private def readGroup(buf: ByteBuffer, btreeAddr: Long, heapAddr: Long,
                        path: String): Seq[RootLink] = {
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

    def walk(addr: Long): Seq[RootLink] = {
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
            val (nameOff, hdr, cacheType, s0, _) = readSte(b)
            cacheType match {
              case 2 =>
                // symbolic link: scratch word 0's low 4 bytes = local-
                // heap offset of the NUL-terminated target path
                SoftLink(name(nameOff), name(s0 & 0xffffffffL))
              case 0 | 1 => HardLink(name(nameOff), hdr)
              case other => throw new IllegalArgumentException(
                s"$path: symbol-table cache type $other unsupported")
            }
          }
        case other =>
          throw new IllegalArgumentException(s"$path: unexpected node '$other'")
      }
    }
    walk(btreeAddr)
  }

  /** Chunk index: walk a v1 B-tree of node type 1; returns
    * (stored size, filter mask, per-dim element offsets, data address).
    */
  private def chunkEntries(buf: ByteBuffer, btreeAddr: Long, ndims: Int,
                           path: String): Seq[(Int, Int, Array[Long], Long)] = {
    def walk(addr: Long): Seq[(Int, Int, Array[Long], Long)] = {
      val b = buf.duplicate().order(ByteOrder.LITTLE_ENDIAN)
      b.position(addr.toInt)
      val sig = new Array[Byte](4); b.get(sig)
      require(new String(sig, "US-ASCII") == "TREE",
        s"$path: expected chunk B-tree node, found '${new String(sig, "US-ASCII")}'")
      val nodeType = b.get() & 0xff
      require(nodeType == 1, s"$path: B-tree node type $nodeType in a chunk index")
      val level = b.get() & 0xff
      val used = b.getShort() & 0xffff
      b.getLong(); b.getLong() // siblings
      // entries: key_0, child_0, key_1, child_1, …, key_used; a type-1
      // key is (chunk size u32, filter mask u32, (ndims+1) × u64 offsets)
      (0 until used).flatMap { _ =>
        val size = b.getInt()
        val mask = b.getInt()
        val offs = new Array[Long](ndims)
        var i = 0
        while (i < ndims) { offs(i) = b.getLong(); i += 1 }
        b.getLong() // trailing element-size dimension offset (always 0)
        val child = b.getLong()
        if (level == 0) Seq((size, mask, offs, child)) else walk(child)
      }
    }
    walk(btreeAddr)
  }

  /** Implicit chunk index (v4 layout, unfiltered fixed-dims): chunks
    * stored back-to-back at `addr` in row-major linear chunk order; the
    * index IS the arithmetic.
    */
  private def implicitEntries(addr: Long, dims: Array[Int], cd: Array[Int],
                              chunkBytes: Int): Seq[(Int, Int, Array[Long], Long)] = {
    val grid = dims.indices.map(i => (dims(i) + cd(i) - 1) / cd(i)).toArray
    val nChunks = grid.product
    (0 until nChunks).map { lin =>
      val offs = new Array[Long](dims.length)
      var rem = lin
      var i = dims.length - 1
      while (i >= 0) {
        offs(i) = (rem % grid(i)).toLong * cd(i)
        rem /= grid(i)
        i -= 1
      }
      (chunkBytes, 0, offs, addr + lin.toLong * chunkBytes)
    }
  }

  /** Unsigned little-endian integer of 1–8 bytes. */
  private def readUintLE(b: ByteBuffer, width: Int): Long = {
    var v = 0L
    var i = 0
    while (i < width) { v |= (b.get() & 0xffL) << (8 * i); i += 1 }
    v
  }

  /** Fixed Array chunk index (v4 layout, fixed dims): FAHD header →
    * FADB data block whose elements are the chunk records in linear
    * chunk order (client 0 = address only; client 1 = address +
    * variable-width chunk size + filter mask). Above 2^pageBits
    * elements the data block is PAGED: the block itself carries only
    * the header, a page-init bitmap (MSB-first within each byte — the
    * H5VM bit convention) and its checksum; the pages follow
    * contiguously, each 2^pageBits elements (last page truncated) plus
    * a 4-byte page checksum, and a clear bitmap bit means none of that
    * page's chunks were written (fill value). Checksums are structural
    * (accounted, not verified), like fletcher32 elsewhere in this
    * reader.
    */
  private def fixedArrayEntries(buf: ByteBuffer, addr: Long, d: Dataset,
                                cd: Array[Int], nc: Int,
                                path: String): Seq[(Int, Int, Array[Long], Long)] = {
    val ndims = d.dims.length
    val grid = (0 until ndims).map(i => (d.dims(i) + cd(i) - 1) / cd(i)).toArray
    val nChunks = grid.product
    val h = buf.duplicate().order(ByteOrder.LITTLE_ENDIAN)
    h.position(addr.toInt)
    val sig = new Array[Byte](4); h.get(sig)
    require(new String(sig, "US-ASCII") == "FAHD",
      s"$path: expected Fixed Array header for '${d.name}'")
    val ver = h.get() & 0xff
    require(ver == 0, s"$path: Fixed Array header v$ver unsupported")
    val client = h.get() & 0xff
    require(client == 0 || client == 1,
      s"$path: Fixed Array client $client (chunk indexes are 0/1) for '${d.name}'")
    val entrySize = h.get() & 0xff
    val pageBits = h.get() & 0xff
    val maxEntries = h.getLong()
    require(maxEntries == nChunks,
      s"$path: Fixed Array entry count $maxEntries != chunk-grid size " +
        s"$nChunks for '${d.name}'")
    val dbAddr = h.getLong()
    if (dbAddr == Undef) return Seq.empty // no chunk written yet
    val b = buf.duplicate().order(ByteOrder.LITTLE_ENDIAN)
    b.position(dbAddr.toInt)
    val dsig = new Array[Byte](4); b.get(dsig)
    require(new String(dsig, "US-ASCII") == "FADB",
      s"$path: expected Fixed Array data block for '${d.name}'")
    val dver = b.get() & 0xff
    require(dver == 0, s"$path: Fixed Array data block v$dver unsupported")
    val dclient = b.get() & 0xff
    require(dclient == client, s"$path: Fixed Array client mismatch for '${d.name}'")
    b.getLong() // back-pointer to the FAHD header
    val szWidth = entrySize - 8 - 4 // client 1: addr(8) + size + mask(4)
    require(client == 0 || (szWidth >= 1 && szWidth <= 8),
      s"$path: Fixed Array entry size $entrySize undecodable for '${d.name}'")
    def readEntry(eb: ByteBuffer): (Int, Int, Long) =
      if (client == 0) (nc * d.dtSize, 0, eb.getLong())
      else {
        val a = eb.getLong()
        val sz = readUintLE(eb, szWidth)
        val mask = eb.getInt()
        (sz.toInt, mask, a)
      }
    val pageNelmts = 1L << pageBits
    val entries: IndexedSeq[(Int, Int, Long)] =
      if (maxEntries <= pageNelmts)
        (0 until nChunks.toInt).map(_ => readEntry(b))
      else {
        val npages = ((maxEntries + pageNelmts - 1) / pageNelmts).toInt
        val bitmap = new Array[Byte]((npages + 7) / 8)
        b.get(bitmap)
        b.getInt() // data-block checksum (structural)
        val out = IndexedSeq.newBuilder[(Int, Int, Long)]
        var base = b.position()
        var pg = 0
        while (pg < npages) {
          val pn = math.min(pageNelmts, maxEntries - pg * pageNelmts).toInt
          if ((bitmap(pg / 8) & (1 << (7 - pg % 8))) != 0) {
            val pb = buf.duplicate().order(ByteOrder.LITTLE_ENDIAN)
            pb.position(base)
            (0 until pn).foreach(_ => out += readEntry(pb))
          } else (0 until pn).foreach(_ => out += ((0, 0, Undef)))
          base += pn * entrySize + 4 // elements + page checksum
          pg += 1
        }
        out.result()
      }
    entries.zipWithIndex.map { case ((sz, mask, a), lin) =>
      val offs = new Array[Long](ndims)
      var rem = lin
      var i = ndims - 1
      while (i >= 0) {
        offs(i) = (rem % grid(i)).toLong * cd(i)
        rem /= grid(i)
        i -= 1
      }
      (sz, mask, offs, a)
    }
  }

  /** Extensible Array chunk index (v4 layout, ONE unlimited dim — the
    * netCDF record-dimension files h5py writes): EAHD header → EAIB
    * index block. Elements live (a) directly in the index block (the
    * first `idxBlkElmts`) and (b) in EADB data blocks addressed
    * directly from the index block — per the spec's geometry, super
    * block u holds 2^(u/2) data blocks of 2^((u+1)/2)·minElmts
    * elements, and the first 2·log2(minPtrs) super blocks' data blocks
    * are addressed straight from the index block (H5EA "Index Block":
    * 2·(minPtrs−1) data block addresses), and (c) in data blocks under
    * EASB super blocks for deeper growth. Data blocks past 2^pageBits
    * elements are PAGED — header + page-init bitmap + checksum, then
    * pages of 2^pageBits elements each with a trailing checksum, clear
    * bit = page never written (same mechanics as the Fixed Array doc
    * above). Element encoding matches Fixed Array:
    * client 0 = chunk address; client 1 = address + variable-width
    * stored size + filter mask. Linear element index = row-major chunk
    * grid index over the CURRENT dims, which is growth-stable exactly
    * when the unlimited dimension is dim 0 (validated against the
    * dataspace max-dims in [[parseDataset]]). Checksums structural,
    * like the rest of this reader.
    */
  private def extensibleArrayEntries(buf: ByteBuffer, addr: Long, d: Dataset,
                                     cd: Array[Int], nc: Int,
                                     path: String): Seq[(Int, Int, Array[Long], Long)] = {
    val ndims = d.dims.length
    val grid = (0 until ndims).map(i => (d.dims(i) + cd(i) - 1) / cd(i)).toArray
    val nChunks = grid.product
    val h = buf.duplicate().order(ByteOrder.LITTLE_ENDIAN)
    h.position(addr.toInt)
    val sig = new Array[Byte](4); h.get(sig)
    require(new String(sig, "US-ASCII") == "EAHD",
      s"$path: expected Extensible Array header for '${d.name}'")
    val ver = h.get() & 0xff
    require(ver == 0, s"$path: Extensible Array header v$ver unsupported")
    val client = h.get() & 0xff
    require(client == 0 || client == 1,
      s"$path: Extensible Array client $client (chunk indexes are 0/1) " +
        s"for '${d.name}'")
    val elmtSize = h.get() & 0xff
    val maxBits = h.get() & 0xff
    val idxBlkElmts = h.get() & 0xff
    val minElmts = h.get() & 0xff
    val minPtrs = h.get() & 0xff
    val pageBits = h.get() & 0xff // paging starts past 2^pageBits elements
    h.getLong() // n super blocks
    h.getLong() // super block size
    h.getLong() // n data blocks
    h.getLong() // data block size
    h.getLong() // max index set
    val nElmts = h.getLong()
    val ibAddr = h.getLong()
    require(nElmts >= nChunks,
      s"$path: Extensible Array holds $nElmts elements < chunk-grid size " +
        s"$nChunks for '${d.name}'")
    if (ibAddr == Undef) return Seq.empty // nothing written yet
    def log2(v: Int): Int = {
      require(v > 0 && (v & (v - 1)) == 0,
        s"$path: Extensible Array parameter $v not a power of two")
      java.lang.Integer.numberOfTrailingZeros(v)
    }
    // index-block geometry (H5EA spec): direct data-block addresses
    // cover the first 2·log2(minPtrs) super blocks = 2·(minPtrs−1)
    // blocks; the remaining super blocks get EASB addresses
    val nSblks = 1 + (maxBits - log2(minElmts))
    val iblkSblks = 2 * log2(minPtrs)
    val nDblkAddrs = 2 * (minPtrs - 1)
    val nSblkAddrs = math.max(nSblks - iblkSblks, 0)
    val arrOffSize = (maxBits + 7) / 8
    val b = buf.duplicate().order(ByteOrder.LITTLE_ENDIAN)
    b.position(ibAddr.toInt)
    val isig = new Array[Byte](4); b.get(isig)
    require(new String(isig, "US-ASCII") == "EAIB",
      s"$path: expected Extensible Array index block for '${d.name}'")
    val iver = b.get() & 0xff
    require(iver == 0, s"$path: Extensible Array index block v$iver unsupported")
    val iclient = b.get() & 0xff
    require(iclient == client,
      s"$path: Extensible Array client mismatch for '${d.name}'")
    b.getLong() // back-pointer to the EAHD header
    val szWidth = elmtSize - 8 - 4 // client 1: addr(8) + size + mask(4)
    require(client == 0 || (szWidth >= 1 && szWidth <= 8),
      s"$path: Extensible Array element size $elmtSize undecodable " +
        s"for '${d.name}'")
    def readElement(eb: ByteBuffer): (Int, Int, Long) =
      if (client == 0) (nc * d.dtSize, 0, eb.getLong())
      else {
        val a = eb.getLong()
        val sz = readUintLE(eb, szWidth)
        val mask = eb.getInt()
        (sz.toInt, mask, a)
      }
    // (size, mask, addr) per linear element index, in order: first the
    // index block's direct elements, then each directly-addressed data
    // block's elements
    val out = scala.collection.mutable.ArrayBuffer.empty[(Int, Int, Long)]
    var i = 0
    while (i < math.min(idxBlkElmts.toLong, nChunks).toInt) {
      out += readElement(b); i += 1
    }
    if (out.size < idxBlkElmts) {
      // skip the unread direct element slots to reach the address lists
      b.position(b.position() + (idxBlkElmts - out.size) * elmtSize)
    }
    val dblkAddrs = (0 until nDblkAddrs).map(_ => b.getLong())
    val sblkAddrs = (0 until nSblkAddrs).map(_ => b.getLong())
    // one data block's worth of elements; an Undef block address =
    // those chunks were never written (the caller keeps the fill
    // value for Undef entries)
    def readDataBlock(dbAddr: Long, dblkElmts: Int): Unit = {
      val take = math.min(dblkElmts, nChunks - out.size)
      if (dbAddr == Undef) {
        (0 until take).foreach(_ => out += ((0, 0, Undef)))
      } else {
        val db = buf.duplicate().order(ByteOrder.LITTLE_ENDIAN)
        db.position(dbAddr.toInt)
        val dsig = new Array[Byte](4); db.get(dsig)
        require(new String(dsig, "US-ASCII") == "EADB",
          s"$path: expected Extensible Array data block for '${d.name}'")
        val dver = db.get() & 0xff
        require(dver == 0,
          s"$path: Extensible Array data block v$dver unsupported")
        val dclient = db.get() & 0xff
        require(dclient == client,
          s"$path: Extensible Array data block client mismatch " +
            s"for '${d.name}'")
        db.getLong() // back-pointer to the EAHD header
        readUintLE(db, arrOffSize) // block's element offset (implied)
        val pageNelmts = 1L << pageBits
        if (dblkElmts <= pageNelmts) {
          (0 until take).foreach(_ => out += readElement(db))
        } else {
          // PAGED data block: the block carries only header + page-init
          // bitmap (MSB-first per byte, the H5VM bit convention) + its
          // checksum; pages of 2^pageBits elements follow contiguously,
          // each with a trailing 4-byte checksum. Clear bit = none of
          // that page's chunks written (fill value).
          require(dblkElmts % pageNelmts == 0,
            s"$path: Extensible Array data block $dblkElmts elements not " +
              s"a page multiple (2^$pageBits) for '${d.name}'")
          val npages = (dblkElmts / pageNelmts).toInt
          val bitmap = new Array[Byte]((npages + 7) / 8)
          db.get(bitmap)
          db.getInt() // data-block checksum (structural)
          val pageBytes = pageNelmts * elmtSize + 4
          val pagesBase = db.position()
          var pg = 0
          var left = take
          while (left > 0 && pg < npages) {
            val pn = math.min(pageNelmts.toInt, left)
            if ((bitmap(pg / 8) & (1 << (7 - pg % 8))) != 0) {
              val pb = buf.duplicate().order(ByteOrder.LITTLE_ENDIAN)
              pb.position((pagesBase + pg * pageBytes).toInt)
              (0 until pn).foreach(_ => out += readElement(pb))
            } else (0 until pn).foreach(_ => out += ((0, 0, Undef)))
            left -= pn
            pg += 1
          }
        }
      }
    }
    def sblkGeom(u: Int): (Int, Int) = // (n data blocks, elements each)
      (1 << (u / 2), (1 << ((u + 1) / 2)) * minElmts)
    // walk the direct data blocks in super-block order until the grid
    // is covered
    var dblkIdx = 0
    var u = 0
    while (out.size < nChunks && u < iblkSblks) {
      val (ndblks, dblkElmts) = sblkGeom(u)
      var j = 0
      while (out.size < nChunks && j < ndblks) {
        readDataBlock(dblkAddrs(dblkIdx), dblkElmts)
        dblkIdx += 1
        j += 1
      }
      u += 1
    }
    // then the EASB super blocks: header + block offset + its data
    // block addresses (each block paged past 2^pageBits elements).
    // An Undef super block = none of its chunks written.
    var si = 0
    while (out.size < nChunks && si < nSblkAddrs) {
      val (ndblks, dblkElmts) = sblkGeom(iblkSblks + si)
      val sbAddr = sblkAddrs(si)
      if (sbAddr == Undef) {
        val take = math.min(ndblks.toLong * dblkElmts,
          (nChunks - out.size).toLong).toInt
        (0 until take).foreach(_ => out += ((0, 0, Undef)))
      } else {
        val sb = buf.duplicate().order(ByteOrder.LITTLE_ENDIAN)
        sb.position(sbAddr.toInt)
        val ssig = new Array[Byte](4); sb.get(ssig)
        require(new String(ssig, "US-ASCII") == "EASB",
          s"$path: expected Extensible Array super block for '${d.name}'")
        val sver = sb.get() & 0xff
        require(sver == 0,
          s"$path: Extensible Array super block v$sver unsupported")
        val sclient = sb.get() & 0xff
        require(sclient == client,
          s"$path: Extensible Array super block client mismatch " +
            s"for '${d.name}'")
        sb.getLong() // back-pointer to the EAHD header
        readUintLE(sb, arrOffSize) // block offset (implied by position)
        val addrs = (0 until ndblks).map(_ => sb.getLong())
        var j = 0
        while (out.size < nChunks && j < ndblks) {
          readDataBlock(addrs(j), dblkElmts)
          j += 1
        }
      }
      si += 1
    }
    require(out.size >= nChunks,
      s"$path: Extensible Array direct blocks cover ${out.size} of " +
        s"$nChunks chunks for '${d.name}'")
    out.take(nChunks).toSeq.zipWithIndex.map { case ((sz, mask, a), lin) =>
      val offs = new Array[Long](ndims)
      var rem = lin
      var k = ndims - 1
      while (k >= 0) {
        offs(k) = (rem % grid(k)).toLong * cd(k)
        rem /= grid(k)
        k -= 1
      }
      (sz, mask, offs, a)
    }
  }

  /** All (type, dataPos, dataSize) messages of an object header — v1
    * (no signature, version byte 1 first) or v2 ("OHDR" signature, the
    * latest-format layout with per-chunk checksums) — following
    * continuation blocks (type 0x0010) in either format.
    */
  private def readMessages(buf: ByteBuffer, hdrAddr: Long,
                           path: String): Seq[(Int, Int, Int)] = {
    if (bytesAt(buf, hdrAddr.toInt, 4) == "OHDR")
      return readMessagesV2(buf, hdrAddr, path)
    val b = buf.duplicate().order(ByteOrder.LITTLE_ENDIAN)
    b.position(hdrAddr.toInt)
    val ver = b.get() & 0xff
    require(ver == 1,
      s"$path: object header v$ver unsupported (v1/v2 only)")
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

  private def bytesAt(buf: ByteBuffer, pos: Int, n: Int): String = {
    if (pos < 0 || pos + n > buf.capacity()) return ""
    val a = new Array[Byte](n)
    val b = buf.duplicate(); b.position(pos); b.get(a)
    new String(a, "US-ASCII")
  }

  /** Messages of a v2 ("OHDR") object header. Layout per the spec's
    * version-2 object header: flags select optional time/phase-change
    * fields and the width of the chunk-0 size; messages carry a 1-byte
    * type, 2-byte size, 1-byte flags (+ optional 2-byte creation order
    * when the HEADER tracks attribute creation order); every chunk ends
    * with a 4-byte checksum (structural); continuation chunks carry an
    * "OCHK" signature. There is no message count — each chunk is
    * parsed to its checksum, skipping trailing gaps too small for a
    * message header.
    */
  private def readMessagesV2(buf: ByteBuffer, hdrAddr: Long,
                             path: String): Seq[(Int, Int, Int)] = {
    val b = buf.duplicate().order(ByteOrder.LITTLE_ENDIAN)
    b.position(hdrAddr.toInt + 4) // past "OHDR"
    val ver = b.get() & 0xff
    require(ver == 2, s"$path: OHDR version $ver unsupported")
    val flags = b.get() & 0xff
    if ((flags & 0x20) != 0) { b.getInt(); b.getInt(); b.getInt(); b.getInt() }
    if ((flags & 0x10) != 0) { b.getShort(); b.getShort() }
    val chunk0Size = readUintLE(b, 1 << (flags & 0x03)).toInt
    val trackOrder = (flags & 0x04) != 0
    val msgHdrLen = if (trackOrder) 6 else 4
    val out = scala.collection.mutable.ArrayBuffer.empty[(Int, Int, Int)]
    // (start, len) of each chunk's message area, checksum excluded
    var blocks = List((b.position(), chunk0Size))
    while (blocks.nonEmpty) {
      val (start, len) = blocks.head
      blocks = blocks.tail
      val mb = buf.duplicate().order(ByteOrder.LITTLE_ENDIAN)
      mb.position(start)
      val end = start + len
      while (mb.position() + msgHdrLen <= end) {
        val typ = mb.get() & 0xff
        val size = mb.getShort() & 0xffff
        mb.get() // message flags
        if (trackOrder) mb.getShort() // creation order
        val dataPos = mb.position()
        if (dataPos + size > end)
          throw new IllegalArgumentException(
            s"$path: OHDR message overruns its chunk (corrupt header)")
        if (typ == 0x0010) { // continuation → "OCHK" sig + messages + checksum
          val cb = slice(buf, dataPos, size)
          val cOff = cb.getLong().toInt
          val cLen = cb.getLong().toInt
          require(bytesAt(buf, cOff, 4) == "OCHK",
            s"$path: continuation block missing OCHK signature")
          blocks = blocks :+ ((cOff + 4, cLen - 8)) // minus sig + checksum
        } else if (typ != 0x0000) { // NIL messages pad; skip them
          out += ((typ, dataPos, size))
        }
        mb.position(dataPos + size)
      }
    }
    out.toSeq
  }

  /** Decode one numeric attribute message (0x000C, v1–v3) into
    * (name, scalar value). Returns the name with None when the value is
    * a type this reader does not decode (strings, references, vlens —
    * netCDF-4 writes several as internal bookkeeping); the caller
    * decides whether that's skippable or fatal.
    */
  private def readAttribute(buf: ByteBuffer, pos: Int, size: Int,
                            path: String): (String, Option[Double]) = {
    val b = slice(buf, pos, size)
    val ver = b.get() & 0xff
    require(ver >= 1 && ver <= 3, s"$path: attribute message v$ver unsupported")
    val flags = b.get() & 0xff // v1: reserved (0)
    val nameSize = b.getShort() & 0xffff
    val dtSize = b.getShort() & 0xffff
    val dsSize = b.getShort() & 0xffff
    if (ver == 3) b.get() // name character-set encoding
    def align8(n: Int): Int = (n + 7) & ~7
    val padded = ver == 1 // v1 pads name/datatype/dataspace to 8 bytes
    val nameStart = b.position()
    val nameBytes = new Array[Byte](nameSize)
    b.get(nameBytes)
    val name = new String(nameBytes, "UTF-8").takeWhile(_ != 0)
    b.position(nameStart + (if (padded) align8(nameSize) else nameSize))
    // shared datatype/dataspace (v2+ flags) cannot be decoded here
    if ((flags & 0x03) != 0 && ver >= 2) return (name, None)
    val dtStart = b.position()
    val clsVer = b.get() & 0xff
    val dtClass = clsVer & 0x0f
    val bits0 = b.get() & 0xff
    b.get(); b.get()
    val elemSize = b.getInt()
    b.position(dtStart + (if (padded) align8(dtSize) else dtSize))
    val dsStart = b.position()
    val spVer = b.get() & 0xff
    val ndims = b.get() & 0xff
    val nelems: Long =
      if (spVer == 1) {
        b.get(); b.get(); b.getInt() // flags + reserved
        (0 until ndims).map(_ => b.getLong()).product.max(1L)
      } else if (spVer == 2) {
        b.get(); b.get() // flags, type
        (0 until ndims).map(_ => b.getLong()).product.max(1L)
      } else return (name, None)
    b.position(dsStart + (if (padded) align8(dsSize) else dsSize))
    if (nelems < 1 || (dtClass != 0 && dtClass != 1)) return (name, None)
    val little = (bits0 & 0x01) == 0
    val vb = b.duplicate().order(
      if (little) ByteOrder.LITTLE_ENDIAN else ByteOrder.BIG_ENDIAN)
    val v = (dtClass, elemSize) match {
      case (1, 4) => Some(vb.getFloat().toDouble)
      case (1, 8) => Some(vb.getDouble())
      case (0, 1) => Some(vb.get().toDouble)
      case (0, 2) => Some(vb.getShort().toDouble)
      case (0, 4) => Some(vb.getInt().toDouble)
      case (0, 8) => Some(vb.getLong().toDouble)
      case _ => None
    }
    (name, v)
  }

  /** Parse a filter pipeline message (0x000B, v1/v2). */
  private def readFilters(buf: ByteBuffer, pos: Int, size: Int, name: String,
                          path: String): Seq[Filter] = {
    val b = slice(buf, pos, size)
    val ver = b.get() & 0xff
    require(ver == 1 || ver == 2,
      s"$path: filter pipeline v$ver unsupported for '$name'")
    val nf = b.get() & 0xff
    if (ver == 1) { b.getShort(); b.getInt() } // reserved
    (0 until nf).map { _ =>
      val id = b.getShort() & 0xffff
      val nameLen =
        if (ver == 2 && id < 256) 0 else b.getShort() & 0xffff
      b.getShort() // flags (bit 0 = optional)
      val nClient = b.getShort() & 0xffff
      if (nameLen > 0) {
        val skip = if (ver == 1) (nameLen + 7) & ~7 else nameLen
        b.position(b.position() + skip)
      }
      val client = (0 until nClient).map(_ => b.getInt())
      if (ver == 1 && nClient % 2 == 1) b.getInt() // pad to 8
      require(id == 1 || id == 2 || id == 3,
        s"$path: dataset '$name' uses unsupported filter id $id " +
          "(deflate/shuffle/fletcher32 only); `nccopy -d 0 -k classic` converts")
      Filter(id, client)
    }
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
    val layoutMsg = msgs.find(_._1 == 0x0008)
    if (space.isEmpty || dtype.isEmpty || layoutMsg.isEmpty) return None

    val filters = msgs.find(_._1 == 0x000B)
      .map(m => readFilters(buf, m._2, m._3, name, path))
      .getOrElse(Seq.empty)

    // attributes: decode the numeric ones; netCDF-4's internal
    // bookkeeping (DIMENSION_LIST references, CLASS/NAME strings) is
    // skippable, but a conventions attribute that fails to decode would
    // silently change values — fail loudly instead
    val numAtts = msgs.filter(_._1 == 0x000C).flatMap { m =>
      val (attName, value) = readAttribute(buf, m._2, m._3, path)
      if (value.isEmpty && ConventionAtts(attName))
        throw new IllegalArgumentException(
          s"$path: cannot decode attribute '$attName' of '$name' — its type " +
            "is outside this reader's numeric subset, and ignoring it would " +
            "misdecode the data; `nccopy -k classic` converts")
      value.map(attName -> _)
    }.toMap

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
    // max-dims (flag bit 0): only consulted to validate which dim is
    // unlimited under an Extensible Array chunk index
    val maxDims: Seq[Long] =
      if ((spFlags & 0x01) != 0) (0 until ndims).map(_ => sp.getLong())
      else Seq.empty

    val dt = slice(buf, dtype.get._2, dtype.get._3)
    val clsVer = dt.get() & 0xff
    val dtClass = clsVer & 0x0f
    val bits0 = dt.get() & 0xff
    dt.get(); dt.get() // bit-field bytes 1-2
    val dtSize = dt.getInt()
    val littleEndian = (bits0 & 0x01) == 0

    val lo = slice(buf, layoutMsg.get._2, layoutMsg.get._3)
    val loVer = lo.get() & 0xff
    require(loVer == 3 || loVer == 4,
      s"$path: data layout v$loVer unsupported (v3/v4 only)")
    val loClass = lo.get() & 0xff
    val layout = (loVer, loClass) match {
      case (_, 1) =>
        // contiguous: identical fields in v3 and v4
        require(filters.isEmpty,
          s"$path: dataset '$name' has a filter pipeline on contiguous storage")
        val addr = lo.getLong()
        val sz = lo.getLong()
        Contiguous(addr, sz)
      case (3, 2) =>
        // v3 chunked: dimensionality (= rank+1), B-tree address, then
        // (rank+1) u32 dim sizes whose last entry is the element size
        val dimensionality = lo.get() & 0xff
        val btree = lo.getLong()
        val cdims = (0 until dimensionality).map(_ => lo.getInt())
        require(dimensionality == ndims + 1,
          s"$path: chunk dimensionality $dimensionality != rank+1 for '$name'")
        Chunked(BtreeV1(btree), cdims.dropRight(1))
      case (4, 2) =>
        // v4 chunked (latest file format): flags, dimensionality,
        // encoded dim width, dims, chunk index type, index fields,
        // index address. The dimensionality is validated against the
        // dataspace rank and accepted in BOTH published conventions —
        // rank (element size implied by the datatype) or rank+1 (v3's
        // trailing element-size pseudo-dim); a trailing entry only
        // passes when it equals the datatype size, so neither form can
        // be misparsed as the other.
        val loFlags = lo.get() & 0xff
        val dimensionality = lo.get() & 0xff
        val encLen = lo.get() & 0xff
        require(encLen >= 1 && encLen <= 8,
          s"$path: v4 chunk dim width $encLen for '$name'")
        val rawDims = (0 until dimensionality).map(_ => readUintLE(lo, encLen))
        val cdims =
          if (dimensionality == ndims) rawDims.map(_.toInt)
          else if (dimensionality == ndims + 1 && rawDims.last == dtSize)
            rawDims.dropRight(1).map(_.toInt)
          else throw new IllegalArgumentException(
            s"$path: v4 chunk dimensionality $dimensionality does not match " +
              s"rank $ndims (dims ${rawDims.mkString("x")}) for '$name'")
        val idxType = lo.get() & 0xff
        val index = idxType match {
          case 1 =>
            val filteredSingle =
              if ((loFlags & 0x02) != 0) {
                val sz = lo.getLong() // size-of-lengths-wide filtered size
                val mask = lo.getInt()
                Some((sz, mask))
              } else None
            val addr = lo.getLong()
            SingleChunk(addr, filteredSingle)
          case 2 =>
            require(filters.isEmpty,
              s"$path: implicit chunk index with filters for '$name'")
            ImplicitIndex(lo.getLong())
          case 3 =>
            lo.get() // page bits (re-read from the FAHD header itself)
            FixedArrayIndex(lo.getLong())
          case 4 =>
            // creation params (max-bits, index-elmts, min-ptrs,
            // min-elmts, page-bits) are re-read from the EAHD header
            lo.position(lo.position() + 5)
            ExtensibleArrayIndex(lo.getLong())
          case 5 =>
            // v2 B-tree creation params (node size u32, split/merge
            // percents) live in the BTHD header too — skip
            lo.position(lo.position() + 6)
            Btree2Index(lo.getLong())
          case other => throw new IllegalArgumentException(
            s"$path: v4 chunk index type $other unsupported for '$name' " +
              "(single/implicit/fixed-array/extensible-array/v2-B-tree)")
        }
        Chunked(index, cdims)
      case (_, other) => throw new IllegalArgumentException(
        s"$path: dataset '$name' layout class $other (0=compact) — " +
          "only contiguous and chunked storage supported")
    }
    layout match {
      case Chunked(ExtensibleArrayIndex(_), _) if maxDims.nonEmpty =>
        // the EA's linear element order is growth-stable row-major only
        // when the unlimited dimension is the FIRST (the netCDF record
        // dimension convention); anything else would misplace chunks
        val unlim = maxDims.zipWithIndex.filter(_._1 == Undef).map(_._2)
        require(unlim == Seq(0),
          s"$path: Extensible Array index with unlimited dims at " +
            s"${unlim.mkString(",")} for '$name' — only a leading record " +
            "dimension is supported; `nccopy -k classic` converts")
      case _ => ()
    }
    Some(name -> Dataset(name, dims, dtClass, dtSize, littleEndian,
      layout, filters, numAtts))
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
