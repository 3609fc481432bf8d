package graft.sources

import java.nio.{ByteBuffer, ByteOrder}

/** Pure-JVM decoder for NetCDF-4/HDF5 — the remaining input-surface gap
  * (SURVEY.md S2): the reference pins both `netCDF4` and `h5netcdf`
  * (azfunctions/requirements.txt:3-4,9), and modern xarray writes
  * HDF5-container NetCDF by default, so a day-one user's `.nc` is as
  * likely HDF5 as classic. Decoded from the public HDF5 File Format
  * Specification v2.x (the format's normative public document) with the
  * same positioned ranged-read discipline as [[NetcdfClassic]] /
  * [[GridFile]]; the deflate codec is the JDK's own
  * `java.util.zip.Inflater`, so even compressed files need no external
  * library.
  *
  * In scope (decoded):
  *  - superblocks version 0 (libhdf5's default write format) AND
  *    versions 2/3 (the "latest format" family, `libver='latest'`),
  *    8-byte offsets/lengths, lookup3-checksummed for v2/v3;
  *  - group storage all three ways: the v0-era v1 B-tree + SNOD symbol
  *    nodes + local heap, the latest-format compact link messages, AND
  *    dense link storage (`FRHP` fractal heap of serialized link
  *    messages — root direct block or root indirect `FHIB` over direct
  *    rows, whole-block checksums — indexed by a type-5 v2 B-tree);
  *  - object headers v1 (incl. continuation blocks) AND v2 `OHDR`
  *    (incl. `OCHK` continuations, lookup3 checksums verified);
  *  - dataspace v1/v2, datatype classes 0 (fixed-point) and 1 (IEEE
  *    float) in either byte order (class 3 strings inside attributes),
  *    attribute messages v1/v2/v3;
  *  - data layout v3 AND v4: classes compact/contiguous/chunked; chunk
  *    indexes: v1 chunk B-trees (v3), single-chunk / implicit /
  *    fixed-array (v4, `FAHD`/`FADB` checksummed, non-paged), AND
  *    extensible-array (v4, `EAHD`/`EAIB`/`EADB` checksummed — the
  *    unlimited-time appendable shape, inline + directly-addressed data
  *    blocks), AND v2 B-trees (v4, `BTHD`/`BTLF`/`BTIN` checksummed,
  *    record types 10/11 — the multi-unlimited-dim shape, depth ≤ 1) —
  *    per-chunk filter masks, full-size zero-padded edge
  *    chunks, hyperslab reads that fetch only intersecting chunks;
  *  - filter pipelines v1/v2: deflate (JDK Inflater), shuffle
  *    (byte-plane transpose), fletcher32 (verified with HDF5's
  *    H5_checksum_fletcher32 algorithm, corrupt chunks fail loudly) —
  *    i.e. netCDF4's default shuffle+deflate compression decodes.
  * Rejected LOUDLY, never misread: superblock v1 (rare 1.6-era indexed
  * variant), fractal-heap indirect CHILD blocks / huge / tiny heap
  * objects (past ~100k links per group), paged fixed arrays and paged
  * or secondary-block extensible-array regions, v2 B-trees deeper than
  * one internal level, other filters (szip/nbit/scaleoffset),
  * non-atomic data types. The error text names the feature so the user
  * knows what to re-save without.
  *
  * The grid view mirrors [[NetcdfClassic]]: datasets named
  * `time`/`leadtime`/`yc`/`xc` + `sic_mean`/`sic_stddev` (legacy
  * `mean`/`stddev`), dims `(time, leadtime, yc, xc)` validated by shape
  * AND, when the file carries netCDF-4's DIMENSION_LIST attribute, by
  * dimension IDENTITY: the vlen object references are resolved through
  * their global heap collections (`GCOL`) to the dimension-scale object
  * headers, so a transposed tensor with coincidentally matching axis
  * lengths fails loudly instead of being misread. One `readGridSlice`
  * fetches the axis vectors
  * plus exactly one `(leadtime, yc, xc)` slab per requested variable —
  * the same I/O bound the classic codec guarantees, so the
  * one-partition-per-(file, slice) planning carries over unchanged.
  */
object Hdf5Netcdf {

  /** Data bytes fetched since JVM start (same I/O-amplification guard as
    * [[GridFile.bytesRead]] / [[NetcdfClassic.bytesRead]]).
    */
  val bytesRead = new java.util.concurrent.atomic.AtomicLong(0)

  private val Undef = -1L // 0xFFFFFFFFFFFFFFFF: HDF5's undefined address

  val Signature: Array[Byte] =
    Array(0x89.toByte, 'H', 'D', 'F', '\r', '\n', 0x1A.toByte, '\n')

  // ------------------------------------------------------------- structures

  /** Decoded datatype: `clazz` 0 = fixed-point, 1 = float, 3 = string. */
  private[sources] case class Dtype(
      clazz: Int, size: Int, littleEndian: Boolean)

  /** Data layout v3/v4, all three storage classes. `Chunked.dims` carries
    * the layout message's rank+1 chunk dimensions (the trailing entry is
    * the element size, per spec — v3 and v4 both encode it); `filters` is
    * the write-order pipeline; `index` is the chunk-lookup structure
    * (v3: always a v1 B-tree; v4: one of the "latest format" indexes).
    */
  private[sources] sealed trait Layout
  private[sources] case class Compact(data: Array[Byte]) extends Layout
  private[sources] case class Contiguous(addr: Long, size: Long) extends Layout

  private[sources] sealed trait ChunkIndex
  private[sources] case class BTreeV1(addr: Long) extends ChunkIndex
  private[sources] case class SingleChunk(
      addr: Long, nbytes: Long, mask: Int) extends ChunkIndex
  private[sources] case class ImplicitIndex(addr: Long) extends ChunkIndex
  private[sources] case class FixedArrayIndex(
      addr: Long, pageBits: Int) extends ChunkIndex
  /** Creation parameters ride the layout message (duplicated in the EAHD);
    * they determine the index block's geometry, so both are kept.
    */
  private[sources] case class ExtensibleArrayIndex(
      addr: Long, maxBits: Int, ibElmts: Int, sbMinPtrs: Int,
      dbMinElmts: Int, pageBits: Int) extends ChunkIndex
  /** v2 B-tree chunk index (layout v4 type 5) — what `libver='latest'`
    * writers emit for a dataset with MORE THAN ONE unlimited dimension.
    */
  private[sources] case class BTreeV2Index(
      addr: Long, nodeSize: Int) extends ChunkIndex

  private[sources] case class Chunked(
      index: ChunkIndex, dims: Vector[Long],
      filters: Vector[(Int, Vector[Int])]) extends Layout

  /** `dimRefs` is the decoded DIMENSION_LIST (one dimension-scale object
    * header address per axis; empty when the file carries no attribute) —
    * the ground truth for axis identity that the shape check alone can't
    * establish when two axes coincide in length.
    */
  private[sources] case class Dataset(
      name: String, dims: Vector[Long], dtype: Dtype,
      layout: Layout, atts: Map[String, Any],
      dimRefs: Vector[Long] = Vector.empty)

  // --------------------------------------------------------------- file I/O

  private def openHadoop(
      path: String): org.apache.hadoop.fs.FSDataInputStream = {
    val p = new org.apache.hadoop.fs.Path(path)
    p.getFileSystem(new org.apache.hadoop.conf.Configuration()).open(p)
  }

  private class Reader(in: org.apache.hadoop.fs.FSDataInputStream) {
    def fetch(off: Long, n: Int): ByteBuffer = {
      val buf = new Array[Byte](n)
      in.readFully(off, buf)
      bytesRead.addAndGet(n.toLong)
      ByteBuffer.wrap(buf).order(ByteOrder.LITTLE_ENDIAN)
    }
  }

  // --------------------------------------------------------------- checksum

  /** Bob Jenkins' lookup3 `hashlittle` — HDF5's metadata checksum
    * (`H5_checksum_metadata`, initval 0). Every "latest format" structure
    * (superblock v2/v3, `OHDR`/`OCHK`, `FAHD`/`FADB`) ends with one;
    * verified on read so corruption fails loudly, same discipline as the
    * fletcher32 chunk filter. Pinned by the published lookup3.c test
    * vectors in Hdf5NetcdfSpec.
    */
  private[graft] def lookup3(data: Array[Byte], off: Int, len: Int): Long = {
    def rot(x: Int, k: Int): Int = (x << k) | (x >>> (32 - k))
    var a = 0xdeadbeef + len; var b = a; var c = a
    var p = off; var n = len
    def k(i: Int): Int = data(p + i) & 0xFF
    while (n > 12) {
      a += k(0) | (k(1) << 8) | (k(2) << 16) | (k(3) << 24)
      b += k(4) | (k(5) << 8) | (k(6) << 16) | (k(7) << 24)
      c += k(8) | (k(9) << 8) | (k(10) << 16) | (k(11) << 24)
      a -= c; a ^= rot(c, 4); c += b
      b -= a; b ^= rot(a, 6); a += c
      c -= b; c ^= rot(b, 8); b += a
      a -= c; a ^= rot(c, 16); c += b
      b -= a; b ^= rot(a, 19); a += c
      c -= b; c ^= rot(b, 4); b += a
      p += 12; n -= 12
    }
    if (n > 0) { // tail of 1..12 bytes, then final mix
      var i = n - 1
      while (i >= 0) {
        val v = k(i) << ((i % 4) * 8)
        (i / 4) match {
          case 0 => a += v
          case 1 => b += v
          case _ => c += v
        }
        i -= 1
      }
      c ^= b; c -= rot(b, 14)
      a ^= c; a -= rot(c, 11)
      b ^= a; b -= rot(a, 25)
      c ^= b; c -= rot(b, 16)
      a ^= c; a -= rot(c, 4)
      b ^= a; b -= rot(a, 14)
      c ^= b; c -= rot(b, 24)
    }
    c.toLong & 0xFFFFFFFFL
  }

  /** Fails loudly unless `stored` equals lookup3 over `data[off, off+len)`
    * — `what` names the structure so the user knows what is corrupt.
    */
  private def checkSum(
      data: Array[Byte], off: Int, len: Int, stored: Long, what: String): Unit = {
    val calc = lookup3(data, off, len)
    require(calc == stored,
      f"HDF5 $what checksum mismatch: stored $stored%08x computed " +
        f"$calc%08x — structure is corrupt")
  }

  // ------------------------------------------------------------- superblock

  /** Parses the superblock and returns the root group's object header
    * address plus the cached (btree, heap) pair from its v0 symbol table
    * entry scratch space (Undef/Undef for v2/v3, whose root group is
    * link-message or dense storage behind the header).
    * Versions 0 (libhdf5's default) and 2/3 ("latest format" writers,
    * `libver='latest'`) decode; v1 (rare 1.6-era indexed-storage variant)
    * is rejected by name.
    */
  private def readSuperblock(r: Reader): (Long, Long, Long) = {
    val raw = new Array[Byte](96)
    r.fetch(0L, 96).get(raw)
    val bb = ByteBuffer.wrap(raw).order(ByteOrder.LITTLE_ENDIAN)
    val sig = new Array[Byte](8); bb.get(sig)
    require(sig.sameElements(Signature), "not an HDF5 file (bad signature)")
    val sbVersion = bb.get().toInt
    sbVersion match {
      case 0 =>
        bb.get(); bb.get(); bb.get() // freespace/root-group versions, reserved
        bb.get() // shared header message version
        val offSize = bb.get().toInt
        val lenSize = bb.get().toInt
        require(offSize == 8 && lenSize == 8,
          s"HDF5 offset/length sizes $offSize/$lenSize unsupported (8/8 only)")
        bb.get() // reserved
        bb.getShort(); bb.getShort() // group leaf / internal k
        bb.getInt() // file consistency flags
        val base = bb.getLong()
        require(base == 0L, s"nonzero HDF5 base address $base unsupported")
        bb.getLong(); bb.getLong(); bb.getLong() // freespace, EOF, driver info
        // root group symbol table entry
        bb.getLong() // link name offset (into a heap we don't need for root)
        val rootOh = bb.getLong()
        val cacheType = bb.getInt()
        bb.getInt() // reserved
        val (btree, heap) =
          if (cacheType == 1) (bb.getLong(), bb.getLong()) else (Undef, Undef)
        (rootOh, btree, heap)
      case 2 | 3 =>
        val offSize = bb.get().toInt
        val lenSize = bb.get().toInt
        require(offSize == 8 && lenSize == 8,
          s"HDF5 offset/length sizes $offSize/$lenSize unsupported (8/8 only)")
        bb.get() // file consistency flags
        val base = bb.getLong()
        require(base == 0L, s"nonzero HDF5 base address $base unsupported")
        bb.getLong(); bb.getLong() // superblock extension addr, EOF
        val rootOh = bb.getLong()
        checkSum(raw, 0, 44, bb.getLong(44) & 0xFFFFFFFFL,
          s"superblock v$sbVersion")
        (rootOh, Undef, Undef)
      case v => throw new IllegalArgumentException(
        s"HDF5 superblock version $v unsupported (v0 and v2/v3 only)")
    }
  }

  // --------------------------------------------------------- object headers

  /** One raw header message: (type, body). Continuations are followed;
    * bodies keep little-endian order. Dispatches on the on-disk prefix:
    * version-1 headers (default-format files) and version-2 `OHDR`
    * headers ("latest format" writers) both decode; anything else fails
    * loudly at the address.
    */
  private def readMessages(r: Reader, addr: Long): Vector[(Int, ByteBuffer)] = {
    val peek = new Array[Byte](4); r.fetch(addr, 4).get(peek)
    if (peek.sameElements("OHDR".getBytes)) readMessagesV2(r, addr)
    else if (peek(0) == 1) readMessagesV1(r, addr)
    else throw new IllegalArgumentException(
      s"HDF5 object header at $addr is neither v1 nor OHDR " +
        s"(first byte ${peek(0)})")
  }

  private def readMessagesV1(
      r: Reader, addr: Long): Vector[(Int, ByteBuffer)] = {
    val head = r.fetch(addr, 16)
    val version = head.get().toInt
    require(version == 1,
      s"HDF5 object header version $version unsupported")
    head.get() // reserved
    val nMsgs = head.getShort().toInt & 0xFFFF
    head.getInt() // object reference count
    val headerSize = head.getInt() // bytes of messages in THIS block
    var blocks = List((addr + 16L, headerSize.toLong))
    val out = Vector.newBuilder[(Int, ByteBuffer)]
    var remaining = nMsgs
    while (remaining > 0 && blocks.nonEmpty) {
      val (blockAddr, blockLen) = blocks.head
      blocks = blocks.tail
      val bb = r.fetch(blockAddr, blockLen.toInt)
      while (remaining > 0 && bb.remaining() >= 8) {
        val msgType = bb.getShort().toInt & 0xFFFF
        val msgSize = bb.getShort().toInt & 0xFFFF
        bb.get(); bb.get(); bb.get(); bb.get() // flags + reserved
        if (bb.remaining() < msgSize) {
          remaining = 0 // malformed tail; loud failure below on misses
        } else {
          val body = bb.slice().order(ByteOrder.LITTLE_ENDIAN)
          body.limit(msgSize)
          bb.position(bb.position() + msgSize)
          if (msgType == 0x0010) { // continuation
            val c = body.duplicate().order(ByteOrder.LITTLE_ENDIAN)
            blocks = blocks :+ ((c.getLong(), c.getLong()))
          } else out += ((msgType, body))
          remaining -= 1
        }
      }
    }
    out.result()
  }

  /** Version-2 object header (`OHDR`) + its `OCHK` continuation blocks —
    * what `libver='latest'` writers emit. Checksums (lookup3) verify on
    * every block; message counts are implicit (parse to the gap).
    */
  private def readMessagesV2(
      r: Reader, addr: Long): Vector[(Int, ByteBuffer)] = {
    val pre = new Array[Byte](16); r.fetch(addr, 16).get(pre)
    val bb = ByteBuffer.wrap(pre).order(ByteOrder.LITTLE_ENDIAN)
    bb.position(4) // "OHDR"
    val version = bb.get().toInt
    require(version == 2, s"HDF5 OHDR version $version unsupported (v2 only)")
    val flags = bb.get().toInt & 0xFF
    var prefixLen = 6
    if ((flags & 0x20) != 0) prefixLen += 16 // access/mod/change/birth times
    if ((flags & 0x10) != 0) prefixLen += 4 // attr storage phase thresholds
    val szBytes = 1 << (flags & 0x03)
    val szBuf = r.fetch(addr + prefixLen, szBytes)
    val chunk0 = szBytes match {
      case 1 => (szBuf.get().toInt & 0xFF).toLong
      case 2 => (szBuf.getShort().toInt & 0xFFFF).toLong
      case 4 => szBuf.getInt().toLong & 0xFFFFFFFFL
      case _ => szBuf.getLong()
    }
    prefixLen += szBytes
    val withOrder = (flags & 0x04) != 0 // 2-byte creation order per message
    val msgHdr = if (withOrder) 6 else 4
    // chunk 0: [addr, addr+prefixLen+chunk0) is checksummed; sum follows
    val total = prefixLen + chunk0.toInt + 4
    val raw = new Array[Byte](total); r.fetch(addr, total).get(raw)
    val sumBuf = ByteBuffer.wrap(raw, total - 4, 4).order(ByteOrder.LITTLE_ENDIAN)
    checkSum(raw, 0, total - 4, sumBuf.getInt().toLong & 0xFFFFFFFFL,
      s"object header (OHDR) at $addr")
    val out = Vector.newBuilder[(Int, ByteBuffer)]
    // (bytes, startOffsetOfMessages, endOffset) per block
    var blocks = List((raw, prefixLen, total - 4))
    while (blocks.nonEmpty) {
      val (data, start, end) = blocks.head
      blocks = blocks.tail
      val b = ByteBuffer.wrap(data).order(ByteOrder.LITTLE_ENDIAN)
      b.position(start).limit(end)
      while (b.remaining() >= msgHdr) {
        val msgType = b.get().toInt & 0xFF
        val msgSize = b.getShort().toInt & 0xFFFF
        b.get() // message flags
        if (withOrder) b.getShort()
        if (b.remaining() < msgSize) {
          // A gap too small to hold a message header is legal padding (the
          // while condition already stops there). But THIS branch means a
          // full header was parsed and its declared size overflows the
          // block — that is a corrupt msgSize, and the spec packs real
          // gaps with NIL messages, so reject loudly instead of silently
          // dropping whatever the truncated tail held.
          throw new IllegalArgumentException(
            s"corrupt HDF5 v2 object header at $addr: message type $msgType " +
              s"declares size $msgSize but only ${b.remaining()} bytes remain " +
              "in its OHDR/OCHK block")
        } else {
          val body = b.slice().order(ByteOrder.LITTLE_ENDIAN)
          body.limit(msgSize)
          b.position(b.position() + msgSize)
          if (msgType == 0x0010) { // continuation -> OCHK block
            val c = body.duplicate().order(ByteOrder.LITTLE_ENDIAN)
            val (cOff, cLen) = (c.getLong(), c.getLong())
            val cRaw = new Array[Byte](cLen.toInt)
            r.fetch(cOff, cLen.toInt).get(cRaw)
            require(cRaw(0) == 'O' && cRaw(1) == 'C' && cRaw(2) == 'H' &&
              cRaw(3) == 'K', s"bad HDF5 OCHK signature at $cOff")
            val cSum = ByteBuffer.wrap(cRaw, cLen.toInt - 4, 4)
              .order(ByteOrder.LITTLE_ENDIAN).getInt().toLong & 0xFFFFFFFFL
            checkSum(cRaw, 0, cLen.toInt - 4, cSum,
              s"continuation block (OCHK) at $cOff")
            blocks = blocks :+ ((cRaw, 4, cLen.toInt - 4))
          } else if (msgType != 0x0000) out += ((msgType, body)) // skip NILs
        }
      }
    }
    out.result()
  }

  private def parseDataspace(bb: ByteBuffer): Vector[Long] = {
    val b = bb.duplicate().order(ByteOrder.LITTLE_ENDIAN)
    val version = b.get().toInt
    val rank = b.get().toInt
    version match {
      case 1 => b.get(); b.get(); b.getInt() // flags + 5 reserved
      case 2 => b.get(); b.get() // flags + type
      case v => throw new IllegalArgumentException(
        s"HDF5 dataspace version $v unsupported")
    }
    Vector.fill(rank)(b.getLong())
  }

  /** Lenient: returns whatever class the bytes declare. Supported-class
    * enforcement happens at the point of use — datasets require atomic
    * int/float, attribute VALUES of other classes (vlen/reference/compound
    * — netCDF-4's DIMENSION_LIST/REFERENCE_LIST bookkeeping) are skipped,
    * since the grid view matches variables by NAME and never needs them.
    */
  private def parseDatatype(bb: ByteBuffer): Dtype = {
    val b = bb.duplicate().order(ByteOrder.LITTLE_ENDIAN)
    val classAndVersion = b.get().toInt & 0xFF
    val clazz = classAndVersion & 0x0F
    val bits0 = b.get().toInt & 0xFF
    b.get(); b.get() // bit fields 8-23
    val size = b.getInt()
    Dtype(clazz, size, littleEndian = (bits0 & 1) == 0)
  }

  /** Layout v3 (default format: chunk index is always a v1 B-tree) and v4
    * ("latest format": single-chunk / implicit / fixed-array indexes;
    * extensible-array and v2-B-tree indexes — used only by unlimited-dim
    * datasets — rejected loudly by name). Both versions encode rank+1
    * chunk dims with the element size last. Filters are attached by the
    * caller from the separate pipeline message.
    */
  private def parseLayout(bb: ByteBuffer): Layout = {
    val b = bb.duplicate().order(ByteOrder.LITTLE_ENDIAN)
    val version = b.get().toInt
    require(version == 3 || version == 4,
      s"HDF5 data layout version $version unsupported (v3/v4 only)")
    b.get().toInt match {
      case 0 => // compact: size(2) + data
        val n = b.getShort().toInt & 0xFFFF
        val data = new Array[Byte](n)
        b.get(data)
        Compact(data)
      case 1 => // contiguous
        Contiguous(b.getLong(), b.getLong())
      case 2 if version == 3 => // dimensionality(1), btree(8), dims (4 each)
        val ndims = b.get().toInt & 0xFF
        val btree = b.getLong()
        val dims = Vector.fill(ndims)(b.getInt().toLong & 0xFFFFFFFFL)
        Chunked(BTreeV1(btree), dims, Vector.empty)
      case 2 => // v4 chunked: flags, ndims, enc len, dims, index type, addr
        val flags = b.get().toInt & 0xFF
        val ndims = b.get().toInt & 0xFF
        val enc = b.get().toInt & 0xFF
        def dimAt(): Long = enc match {
          case 1 => (b.get().toInt & 0xFF).toLong
          case 2 => (b.getShort().toInt & 0xFFFF).toLong
          case 4 => b.getInt().toLong & 0xFFFFFFFFL
          case 8 => b.getLong()
          case n => throw new IllegalArgumentException(
            s"HDF5 v4 chunk dim encoding size $n unsupported")
        }
        val dims = Vector.fill(ndims)(dimAt())
        val index = (b.get().toInt & 0xFF) match {
          case 1 => // single chunk; flags bit 1 = filtered (size+mask here)
            if ((flags & 0x02) != 0) {
              val nbytes = b.getLong()
              val mask = b.getInt()
              SingleChunk(b.getLong(), nbytes, mask)
            } else SingleChunk(b.getLong(), dims.product, 0)
          case 2 => ImplicitIndex(b.getLong())
          case 3 =>
            val pageBits = b.get().toInt & 0xFF
            FixedArrayIndex(b.getLong(), pageBits)
          case 4 =>
            val maxBits = b.get().toInt & 0xFF
            val ibElmts = b.get().toInt & 0xFF
            val sbMinPtrs = b.get().toInt & 0xFF
            val dbMinElmts = b.get().toInt & 0xFF
            val pageBits = b.get().toInt & 0xFF
            ExtensibleArrayIndex(
              b.getLong(), maxBits, ibElmts, sbMinPtrs, dbMinElmts, pageBits)
          case 5 => // v2 B-tree: node size(4), split%(1), merge%(1), addr
            val nodeSize = b.getInt()
            b.get(); b.get() // split/merge percents: write-side knobs only
            BTreeV2Index(b.getLong(), nodeSize)
          case t => throw new IllegalArgumentException(
            s"HDF5 chunk indexing type $t unknown")
        }
        Chunked(index, dims, Vector.empty)
      case c => throw new IllegalArgumentException(s"HDF5 layout class $c")
    }
  }

  /** Filter pipeline message (0x000B), v1 or v2 — the write-order list of
    * (filter id, client data). Decoding supports deflate (1, via the
    * JDK's Inflater), shuffle (2), and fletcher32 (3, verified); any other
    * id fails loudly at defilter time naming the id.
    */
  private def parseFilters(bb: ByteBuffer): Vector[(Int, Vector[Int])] = {
    val b = bb.duplicate().order(ByteOrder.LITTLE_ENDIAN)
    val version = b.get().toInt
    require(version == 1 || version == 2,
      s"HDF5 filter pipeline version $version unsupported")
    val nf = b.get().toInt & 0xFF
    if (version == 1) { b.getShort(); b.getInt() } // reserved
    Vector.fill(nf) {
      val id = b.getShort().toInt & 0xFFFF
      val nameLen =
        if (version == 2 && id < 256) 0 else b.getShort().toInt & 0xFFFF
      b.getShort() // flags (bit 0 = optional; skipping is per-chunk mask)
      val ncd = b.getShort().toInt & 0xFFFF
      if (nameLen > 0) {
        val padded = if (version == 1) (nameLen + 7) / 8 * 8 else nameLen
        b.position(b.position() + padded)
      }
      val client = Vector.fill(ncd)(b.getInt())
      if (version == 1 && ncd % 2 == 1) b.getInt() // pad to 8
      (id, client)
    }
  }

  /** HDF5's fletcher-32 (H5checksum `H5_checksum_fletcher32`): 16-bit
    * big-endian word assembly, sums folded mod 0xFFFF, odd tail byte
    * high-shifted. Returned as the unsigned 32-bit (sum2 << 16 | sum1).
    */
  private[sources] def fletcher32(data: Array[Byte], len: Int): Long = {
    var sum1 = 0L; var sum2 = 0L
    var idx = 0
    var words = len / 2
    while (words > 0) {
      val tlen = math.min(words, 360).toInt
      words -= tlen
      var t = tlen
      while (t > 0) {
        sum1 += (((data(idx) & 0xFF) << 8) | (data(idx + 1) & 0xFF)).toLong
        sum2 += sum1
        idx += 2; t -= 1
      }
      sum1 = (sum1 & 0xFFFF) + (sum1 >>> 16)
      sum2 = (sum2 & 0xFFFF) + (sum2 >>> 16)
    }
    if ((len & 1) == 1) {
      sum1 += ((data(len - 1) & 0xFF) << 8).toLong
      sum2 += sum1
      sum1 = (sum1 & 0xFFFF) + (sum1 >>> 16)
      sum2 = (sum2 & 0xFFFF) + (sum2 >>> 16)
    }
    sum1 = (sum1 & 0xFFFF) + (sum1 >>> 16)
    sum2 = (sum2 & 0xFFFF) + (sum2 >>> 16)
    ((sum2 << 16) | sum1) & 0xFFFFFFFFL
  }

  /** Undoes the filter pipeline on one raw chunk (reverse write order;
    * `mask` bit i set = filter i was skipped for this chunk). `outBytes`
    * is the full-size chunk byte count (edge chunks are stored full-size).
    */
  private[sources] def defilter(
      raw: Array[Byte], filters: Vector[(Int, Vector[Int])], mask: Int,
      elemSize: Int, outBytes: Int): Array[Byte] = {
    var data = raw
    var i = filters.size - 1
    while (i >= 0) {
      if ((mask & (1 << i)) == 0) filters(i)._1 match {
        case 1 => // deflate
          val inf = new java.util.zip.Inflater()
          inf.setInput(data)
          val out = new Array[Byte](outBytes)
          var off = 0
          while (!inf.finished() && off < outBytes) {
            val n = inf.inflate(out, off, outBytes - off)
            if (n == 0 && (inf.needsInput() || inf.needsDictionary()))
              throw new IllegalArgumentException(
                "HDF5 deflate chunk truncated or corrupt")
            off += n
          }
          inf.end()
          require(off == outBytes,
            s"HDF5 deflate chunk inflated to $off of $outBytes bytes")
          data = out
        case 2 => // shuffle: stored as byte planes, one per element byte
          val n = data.length / elemSize
          val out = new Array[Byte](data.length)
          var j = 0
          while (j < elemSize) {
            var k = 0
            while (k < n) { out(k * elemSize + j) = data(j * n + k); k += 1 }
            j += 1
          }
          data = out
        case 3 => // fletcher32: 4-byte little-endian checksum appended
          val stored = ((data(data.length - 4) & 0xFFL)) |
            ((data(data.length - 3) & 0xFFL) << 8) |
            ((data(data.length - 2) & 0xFFL) << 16) |
            ((data(data.length - 1) & 0xFFL) << 24)
          val calc = fletcher32(data, data.length - 4)
          require(calc == stored,
            f"HDF5 fletcher32 checksum mismatch: stored $stored%08x " +
              f"computed $calc%08x — chunk is corrupt")
          data = java.util.Arrays.copyOf(data, data.length - 4)
        case other => throw new IllegalArgumentException(
          s"HDF5 filter id $other unsupported (deflate/shuffle/fletcher32 " +
            "only — szip/nbit/scaleoffset need an external codec)")
      }
      i -= 1
    }
    data
  }

  /** Attribute message v1/v2/v3 -> (name, value). String values decode to
    * String, numeric scalars/vectors to Vector[Double] — the same attr
    * surface [[NetcdfClassic]] exposes. Unsupported value classes
    * (vlen/reference/compound — netCDF-4 dimension-scale bookkeeping)
    * yield None: the name is known, the value skipped.
    */
  /** Parses an attribute message's fixed header (v1/v2/v3) and returns
    * (name, dtype, dataspace dims, buffer positioned at the value bytes).
    */
  private def parseAttrHeader(
      bb: ByteBuffer): (String, Dtype, Vector[Long], ByteBuffer) = {
    val b = bb.duplicate().order(ByteOrder.LITTLE_ENDIAN)
    val version = b.get().toInt
    require(version >= 1 && version <= 3,
      s"HDF5 attribute version $version unsupported")
    val flags = b.get().toInt // v1: reserved (0)
    require(version == 1 || (flags & 0x03) == 0,
      "HDF5 shared attribute datatype/dataspace unsupported")
    val nameSize = b.getShort().toInt & 0xFFFF
    val dtSize = b.getShort().toInt & 0xFFFF
    val dsSize = b.getShort().toInt & 0xFFFF
    if (version == 3) b.get() // name character-set encoding
    def aligned(n: Int): Int = if (version == 1) (n + 7) / 8 * 8 else n
    val nameBytes = new Array[Byte](aligned(nameSize))
    b.get(nameBytes)
    val name = new String(nameBytes.takeWhile(_ != 0), "UTF-8")
    val dtBytes = new Array[Byte](aligned(dtSize))
    b.get(dtBytes)
    val dtype = parseDatatype(
      ByteBuffer.wrap(dtBytes).order(ByteOrder.LITTLE_ENDIAN))
    val dsBytes = new Array[Byte](aligned(dsSize))
    b.get(dsBytes)
    val dims = parseDataspace(
      ByteBuffer.wrap(dsBytes).order(ByteOrder.LITTLE_ENDIAN))
    (name, dtype, dims, b)
  }

  private def parseAttribute(bb: ByteBuffer): (String, Option[Any]) = {
    val (name, dtype, dims, b) = parseAttrHeader(bb)
    val nElems = dims.product.max(1L).toInt
    val value: Option[Any] = dtype.clazz match {
      case 3 =>
        val sb = new Array[Byte](dtype.size * nElems)
        b.get(sb)
        Some(new String(sb.takeWhile(_ != 0), "UTF-8"))
      case 0 | 1 =>
        Some(Vector.fill(nElems)(readElem(b, dtype)))
      case _ => None // vlen/reference/compound bookkeeping attr: skip
    }
    (name, value)
  }

  /** Decodes a `DIMENSION_LIST` attribute value — netCDF-4's dimension
    * identity record: a vlen-of-object-reference per dataset dimension,
    * each vlen resolved through its global heap collection (`GCOL`) to
    * the object header address(es) of the dimension-scale dataset(s)
    * attached to that axis. Returns the FIRST referenced address per
    * dimension (netCDF-4 attaches exactly one scale per dim); an
    * unattached dim (empty vlen) yields Undef.
    */
  private def parseDimensionList(
      r: Reader, bb: ByteBuffer): Vector[Long] = {
    val (_, dtype, dims, b) = parseAttrHeader(bb)
    require(dtype.clazz == 9 && dtype.size == 16,
      s"DIMENSION_LIST datatype class=${dtype.clazz} size=${dtype.size} " +
        "is not a vlen-of-reference")
    val rank = dims.product.max(1L).toInt
    Vector.fill(rank) {
      val n = b.getInt() // sequence length
      val gcol = b.getLong() // global heap collection address
      val idx = b.getInt() // object index within the collection
      if (n == 0) Undef
      else {
        val data = globalHeapObject(r, gcol, idx)
        require(data.length >= 8,
          s"DIMENSION_LIST heap object $idx shorter than one reference")
        ByteBuffer.wrap(data).order(ByteOrder.LITTLE_ENDIAN).getLong()
      }
    }
  }

  /** Fetches object `idx` from the global heap collection at `addr`
    * (`GCOL`): walks the object headers until the index matches; object
    * index 0 marks the free-space tail.
    */
  private def globalHeapObject(r: Reader, addr: Long, idx: Int): Array[Byte] = {
    val head = r.fetch(addr, 16)
    val sig = new Array[Byte](4); head.get(sig)
    require(sig.sameElements("GCOL".getBytes),
      s"bad HDF5 global heap signature at $addr")
    val version = head.get().toInt
    require(version == 1, s"HDF5 global heap version $version unsupported")
    head.get(); head.get(); head.get() // reserved
    val collSize = head.getLong()
    val body = r.fetch(addr + 16L, (collSize - 16L).toInt)
    while (body.remaining() >= 16) {
      val objIdx = body.getShort().toInt & 0xFFFF
      body.getShort() // reference count
      body.getInt() // reserved
      val objSize = body.getLong()
      if (objIdx == 0) { // free space: no more objects
        body.position(body.limit())
      } else if (objIdx == idx) {
        val data = new Array[Byte](objSize.toInt)
        body.get(data)
        return data
      } else {
        body.position(body.position() + ((objSize + 7) / 8 * 8).toInt)
      }
    }
    throw new IllegalArgumentException(
      s"HDF5 global heap object $idx not found in collection at $addr")
  }

  private def readElem(b: ByteBuffer, dt: Dtype): Double = {
    val saved = b.order()
    b.order(if (dt.littleEndian) ByteOrder.LITTLE_ENDIAN else ByteOrder.BIG_ENDIAN)
    val v = (dt.clazz, dt.size) match {
      case (0, 1) => b.get().toDouble
      case (0, 2) => b.getShort().toDouble
      case (0, 4) => b.getInt().toDouble
      case (0, 8) => b.getLong().toDouble
      case (1, 4) => b.getFloat().toDouble
      case (1, 8) => b.getDouble()
      case (c, s) => throw new IllegalArgumentException(
        s"HDF5 element type class=$c size=$s unsupported")
    }
    b.order(saved)
    v
  }

  /** Parses one dataset's object header into a [[Dataset]]. */
  private def readDataset(r: Reader, name: String, addr: Long): Dataset = {
    val msgs = readMessages(r, addr)
    require(!msgs.exists(_._1 == 0x0015),
      s"dataset $name: dense (fractal-heap) attribute storage unsupported " +
        "— attributes like CF units would be silently invisible, so fail " +
        "loudly instead")
    val dims = msgs.find(_._1 == 0x0001).map(m => parseDataspace(m._2))
      .getOrElse(throw new IllegalArgumentException(s"$name: no dataspace"))
    val dtype = msgs.find(_._1 == 0x0003).map(m => parseDatatype(m._2))
      .getOrElse(throw new IllegalArgumentException(s"$name: no datatype"))
    require(dtype.clazz == 0 || dtype.clazz == 1,
      s"dataset $name: HDF5 datatype class ${dtype.clazz} unsupported " +
        "(atomic int/float data only — compound/vlen/reference types " +
        "need an external codec)")
    val filters = msgs.find(_._1 == 0x000B).map(m => parseFilters(m._2))
      .getOrElse(Vector.empty)
    val layout = msgs.find(_._1 == 0x0008).map(m => parseLayout(m._2))
      .getOrElse(throw new IllegalArgumentException(s"$name: no data layout"))
      match {
        case c: Chunked => c.copy(filters = filters)
        case other =>
          require(filters.isEmpty,
            s"dataset $name: filter pipeline on non-chunked layout")
          other
      }
    var dimRefs = Vector.empty[Long]
    val atts: Map[String, Any] = msgs.filter(_._1 == 0x000C)
      .flatMap { m =>
        val (n, v) = parseAttribute(m._2)
        if (n == "DIMENSION_LIST") dimRefs = parseDimensionList(r, m._2)
        v.map(x => (n, x)).toSeq
      }.toMap
    Dataset(name, dims, dtype, layout, atts, dimRefs)
  }

  // ------------------------------------------------------------ chunk index

  /** One stored chunk: N-D element offsets (rank entries, the spec's
    * trailing element-size offset dropped), stored byte count, per-chunk
    * filter mask, file address.
    */
  private case class ChunkEntry(
      offs: Vector[Long], nbytes: Int, mask: Int, addr: Long)

  /** Walks the dataset's v1 B-tree (node type 1, raw data chunks) and
    * returns every chunk entry. Interior levels recurse through child
    * nodes; `ndims` is the layout message's rank+1 dimensionality.
    */
  private def btreeChunkEntries(
      r: Reader, btree: Long, ndims: Int): Vector[ChunkEntry] = {
    val keySize = 8 + 8 * ndims
    def walk(addr: Long): Vector[ChunkEntry] = {
      val head = r.fetch(addr, 24)
      val sig = new Array[Byte](4); head.get(sig)
      require(sig.sameElements("TREE".getBytes),
        "bad HDF5 chunk B-tree signature")
      val nodeType = head.get().toInt
      require(nodeType == 1, s"HDF5 B-tree node type $nodeType (chunk walk)")
      val level = head.get().toInt
      val n = head.getShort().toInt & 0xFFFF
      // skip left/right sibling (8+8), then n key/child pairs + final key
      val body = r.fetch(addr + 24L, n * (keySize + 8) + keySize)
      val entries = Vector.fill(n) {
        val nbytes = body.getInt()
        val mask = body.getInt()
        val offs = Vector.fill(ndims)(body.getLong())
        val child = body.getLong()
        ChunkEntry(offs.dropRight(1), nbytes, mask, child)
      }
      if (level == 0) entries else entries.flatMap(e => walk(e.addr))
    }
    walk(btree)
  }

  /** Row-major element offsets of every chunk in the dataset's chunk grid
    * — the canonical linear order the v4 indexes (implicit / fixed array)
    * store their entries in.
    */
  private def chunkGrid(
      dsDims: Vector[Long], cdims: Vector[Long]): Vector[Vector[Long]] = {
    val counts = dsDims.lazyZip(cdims).map((d, c) => ((d + c - 1) / c).toInt)
    counts.foldLeft(Vector(Vector.empty[Long])) { (acc, n) =>
      for (pre <- acc; i <- 0 until n) yield pre :+ i.toLong
    }.map(coord => coord.lazyZip(cdims).map(_ * _).toVector)
  }

  /** Reads a Fixed Array chunk index (`FAHD` header + its non-paged
    * `FADB` data block) — the index `libver='latest'` writers use for
    * fixed-shape chunked datasets. Client 0 elements are bare chunk
    * addresses (unfiltered); client 1 adds the stored size + filter mask.
    * Paged data blocks (element count above 2^pageBits) are rejected
    * loudly. Both blocks' lookup3 checksums are verified.
    */
  private def fixedArrayEntries(
      r: Reader, fa: FixedArrayIndex, dsDims: Vector[Long],
      cdims: Vector[Long], chunkBytes: Long): Vector[ChunkEntry] = {
    if (fa.addr == Undef) return Vector.empty // never written
    val hdrLen = 4 + 1 + 1 + 1 + 1 + 8 + 8 + 4
    val hRaw = new Array[Byte](hdrLen); r.fetch(fa.addr, hdrLen).get(hRaw)
    val h = ByteBuffer.wrap(hRaw).order(ByteOrder.LITTLE_ENDIAN)
    val hSig = new Array[Byte](4); h.get(hSig)
    require(hSig.sameElements("FAHD".getBytes),
      s"bad HDF5 fixed-array header signature at ${fa.addr}")
    val hVer = h.get().toInt
    require(hVer == 0, s"HDF5 fixed-array header version $hVer unsupported")
    val clientId = h.get().toInt
    require(clientId == 0 || clientId == 1,
      s"HDF5 fixed-array client id $clientId unsupported (chunk data only)")
    val entrySize = h.get().toInt & 0xFF
    val pageBits = h.get().toInt & 0xFF
    val nElmts = h.getLong()
    val dblkAddr = h.getLong()
    checkSum(hRaw, 0, hdrLen - 4, h.getInt(hdrLen - 4).toLong & 0xFFFFFFFFL,
      "fixed-array header (FAHD)")
    val grid = chunkGrid(dsDims, cdims)
    require(nElmts == grid.size,
      s"HDF5 fixed-array element count $nElmts != chunk grid ${grid.size}")
    if (dblkAddr == Undef) return Vector.empty
    require(nElmts <= (1L << pageBits),
      s"HDF5 paged fixed-array data block unsupported " +
        s"($nElmts elements > 2^$pageBits page)")
    val dbLen = 4 + 1 + 1 + 8 + nElmts.toInt * entrySize + 4
    val dRaw = new Array[Byte](dbLen); r.fetch(dblkAddr, dbLen).get(dRaw)
    val d = ByteBuffer.wrap(dRaw).order(ByteOrder.LITTLE_ENDIAN)
    val dSig = new Array[Byte](4); d.get(dSig)
    require(dSig.sameElements("FADB".getBytes),
      s"bad HDF5 fixed-array data block signature at $dblkAddr")
    val dVer = d.get().toInt
    require(dVer == 0, s"HDF5 fixed-array data block version $dVer unsupported")
    val dClient = d.get().toInt
    require(dClient == clientId,
      s"HDF5 fixed-array data block client $dClient != header $clientId")
    d.getLong() // back-pointer to the header
    checkSum(dRaw, 0, dbLen - 4, d.getInt(dbLen - 4).toLong & 0xFFFFFFFFL,
      "fixed-array data block (FADB)")
    val szBytes = entrySize - 12 // filtered: addr(8) + size + mask(4)
    grid.flatMap { offs =>
      val addr = d.getLong()
      val (nbytes, mask) =
        if (clientId == 0) (chunkBytes, 0)
        else {
          val sz = szBytes match {
            case 1 => (d.get().toInt & 0xFF).toLong
            case 2 => (d.getShort().toInt & 0xFFFF).toLong
            case 4 => d.getInt().toLong & 0xFFFFFFFFL
            case 8 => d.getLong()
            case n => throw new IllegalArgumentException(
              s"HDF5 fixed-array chunk-size field width $n unsupported")
          }
          (sz, d.getInt())
        }
      if (addr == Undef) None // unallocated chunk: all fill, skip
      else Some(ChunkEntry(offs, nbytes.toInt, mask, addr))
    }
  }

  /** Reads an Extensible Array chunk index (`EAHD` header + `EAIB` index
    * block + directly-addressed `EADB` data blocks) — the index
    * `libver='latest'` writers use for a dataset with ONE unlimited
    * dimension, i.e. the daily-append time axis. The bounded slice is the
    * index block's reach: its inline elements plus the data blocks of the
    * first `2·log2(sbMinPtrs)` super blocks (244 chunks at libhdf5's
    * default parameters); secondary-block indirection and paged data
    * blocks are rejected loudly. All three structures'
    * lookup3 checksums are verified.
    */
  private def extensibleArrayEntries(
      r: Reader, ea: ExtensibleArrayIndex, dsDims: Vector[Long],
      cdims: Vector[Long], chunkBytes: Long): Vector[ChunkEntry] = {
    if (ea.addr == Undef) return Vector.empty
    def log2(v: Int): Int = {
      require(v > 0 && (v & (v - 1)) == 0,
        s"HDF5 extensible-array parameter $v is not a power of two")
      java.lang.Integer.numberOfTrailingZeros(v)
    }
    // ---- header (EAHD): 12 prefix bytes + 6 stats + iblock addr + sum
    val hdrLen = 12 + 6 * 8 + 8 + 4
    val hRaw = new Array[Byte](hdrLen); r.fetch(ea.addr, hdrLen).get(hRaw)
    val h = ByteBuffer.wrap(hRaw).order(ByteOrder.LITTLE_ENDIAN)
    val hSig = new Array[Byte](4); h.get(hSig)
    require(hSig.sameElements("EAHD".getBytes),
      s"bad HDF5 extensible-array header signature at ${ea.addr}")
    require(h.get() == 0, "HDF5 extensible-array header version unsupported")
    val clientId = h.get().toInt
    require(clientId == 0 || clientId == 1,
      s"HDF5 extensible-array client id $clientId unsupported")
    val elmtSize = h.get().toInt & 0xFF
    val maxBits = h.get().toInt & 0xFF
    val ibElmts = h.get().toInt & 0xFF
    val dbMinElmts = h.get().toInt & 0xFF
    val sbMinPtrs = h.get().toInt & 0xFF
    h.get() // max data-block page nelmts bits (paging rejected below)
    require(maxBits == ea.maxBits && ibElmts == ea.ibElmts &&
      dbMinElmts == ea.dbMinElmts && sbMinPtrs == ea.sbMinPtrs,
      "HDF5 extensible-array header parameters disagree with the layout " +
        "message — file is corrupt")
    h.position(h.position() + 6 * 8) // statistics
    val iblockAddr = h.getLong()
    checkSum(hRaw, 0, hdrLen - 4, h.getInt(hdrLen - 4).toLong & 0xFFFFFFFFL,
      "extensible-array header (EAHD)")
    if (iblockAddr == Undef) return Vector.empty
    // ---- geometry: super block u holds 2^(u/2) data blocks of
    // dbMinElmts·2^((u+1)/2) elements; the index block inlines the first
    // ibElmts elements and directly addresses the first ibNsblks super
    // blocks' data blocks (2·(sbMinPtrs-1) of them, per the spec identity)
    val ibNsblks = 2 * log2(sbMinPtrs)
    val nsblks = 1 + maxBits - log2(dbMinElmts)
    val ndblkAddrs = 2 * (sbMinPtrs - 1)
    val nsblkAddrs = nsblks - ibNsblks
    val pageNelmts = 1L << (ea.pageBits & 0xFF)
    // ---- index block (EAIB)
    val ibLen = 4 + 1 + 1 + 8 + ibElmts * elmtSize +
      (ndblkAddrs + nsblkAddrs) * 8 + 4
    val iRaw = new Array[Byte](ibLen); r.fetch(iblockAddr, ibLen).get(iRaw)
    val ib = ByteBuffer.wrap(iRaw).order(ByteOrder.LITTLE_ENDIAN)
    val iSig = new Array[Byte](4); ib.get(iSig)
    require(iSig.sameElements("EAIB".getBytes),
      s"bad HDF5 extensible-array index block signature at $iblockAddr")
    require(ib.get() == 0, "HDF5 EAIB version unsupported")
    require(ib.get().toInt == clientId, "HDF5 EAIB client id mismatch")
    ib.getLong() // back-pointer to the header
    checkSum(iRaw, 0, ibLen - 4, ib.getInt(ibLen - 4).toLong & 0xFFFFFFFFL,
      "extensible-array index block (EAIB)")
    val szBytes = elmtSize - 12 // filtered: addr(8) + size + mask(4)
    def parseEaElem(b: ByteBuffer): Option[(Long, Long, Int)] = {
      val addr = b.getLong()
      val (nbytes, mask) =
        if (clientId == 0) (chunkBytes, 0)
        else {
          val sz = szBytes match {
            case 1 => (b.get().toInt & 0xFF).toLong
            case 2 => (b.getShort().toInt & 0xFFFF).toLong
            case 4 => b.getInt().toLong & 0xFFFFFFFFL
            case 8 => b.getLong()
            case n => throw new IllegalArgumentException(
              s"HDF5 extensible-array chunk-size field width $n unsupported")
          }
          (sz, b.getInt())
        }
      if (addr == Undef) None else Some((addr, nbytes, mask))
    }
    val inline = Vector.fill(ibElmts)(parseEaElem(ib))
    val dblkAddrs = Vector.fill(ndblkAddrs)(ib.getLong())
    val sblkAddrs = Vector.fill(nsblkAddrs)(ib.getLong())
    // ---- data blocks (EADB), fetched lazily and cached by address
    val offBytes = (maxBits + 7) / 8
    val dblkCache = scala.collection.mutable.Map.empty[Long, Vector[Option[(Long, Long, Int)]]]
    def dblkElems(addr: Long, nelmts: Int): Vector[Option[(Long, Long, Int)]] =
      dblkCache.getOrElseUpdate(addr, {
        require(nelmts <= pageNelmts,
          s"HDF5 paged extensible-array data block unsupported " +
            s"($nelmts elements > $pageNelmts page)")
        val len = 4 + 1 + 1 + 8 + offBytes + nelmts * elmtSize + 4
        val raw = new Array[Byte](len); r.fetch(addr, len).get(raw)
        val b = ByteBuffer.wrap(raw).order(ByteOrder.LITTLE_ENDIAN)
        val sig = new Array[Byte](4); b.get(sig)
        require(sig.sameElements("EADB".getBytes),
          s"bad HDF5 extensible-array data block signature at $addr")
        require(b.get() == 0, "HDF5 EADB version unsupported")
        require(b.get().toInt == clientId, "HDF5 EADB client id mismatch")
        b.getLong() // back-pointer to the header
        b.position(b.position() + offBytes) // block offset
        checkSum(raw, 0, len - 4, b.getInt(len - 4).toLong & 0xFFFFFFFFL,
          "extensible-array data block (EADB)")
        b.position(4 + 1 + 1 + 8 + offBytes)
        Vector.fill(nelmts)(parseEaElem(b))
      })
    // ---- element lookup by linear chunk index
    def element(idx: Long): Option[(Long, Long, Int)] = {
      if (idx < ibElmts) inline(idx.toInt)
      else {
        var u = 0
        var startIdx = ibElmts.toLong
        var startDblk = 0
        var out: Option[(Long, Long, Int)] = null
        while (out == null) {
          require(u < nsblks, s"HDF5 extensible-array element $idx beyond " +
            s"the addressable space (max_nelmts_bits=$maxBits)")
          val ndblks = 1 << (u / 2)
          val nelmts = dbMinElmts.toLong << ((u + 1) / 2)
          val span = ndblks * nelmts
          if (idx < startIdx + span) {
            require(u < ibNsblks,
              "HDF5 extensible-array secondary-block indirection " +
                s"unsupported (chunk $idx lives past the index block's " +
                "directly-addressed data blocks — re-save with fewer, " +
                "larger chunks)")
            val dblk = dblkAddrs(startDblk + ((idx - startIdx) / nelmts).toInt)
            out =
              if (dblk == Undef) None
              else dblkElems(dblk, nelmts.toInt)(((idx - startIdx) % nelmts).toInt)
          } else {
            startIdx += span
            startDblk += ndblks
            u += 1
          }
        }
        out
      }
    }
    chunkGrid(dsDims, cdims).zipWithIndex.flatMap { case (offs, i) =>
      element(i.toLong).map { case (addr, nbytes, mask) =>
        ChunkEntry(offs, nbytes.toInt, mask, addr)
      }
    }
  }

  /** Reads a v2 B-tree chunk index (`BTHD` header + `BTLF` leaf / `BTIN`
    * internal nodes, record types 10 unfiltered / 11 filtered) — the
    * index `libver='latest'` writers emit for a dataset with more than
    * one unlimited dimension. Records hold SCALED (grid-coordinate)
    * offsets; element offsets are recovered by multiplying with the
    * chunk dims. The bounded slice is depth ≤ 1 (root leaf, or one
    * internal level of leaves — thousands of chunks at libhdf5's default
    * 2 KiB node); deeper trees are rejected loudly by depth, never
    * misread. All node checksums (lookup3, over the USED prefix — the
    * spec stores the sum immediately after the last record) are
    * verified. The filtered record's chunk-size field width is derived
    * from the header's record size (= recSize − 12 − 8·rank), mirroring
    * the spec's max-chunk-size-dependent encoding.
    */
  private def btree2ChunkEntries(
      r: Reader, bt: BTreeV2Index, cdims: Vector[Long],
      chunkBytes: Long): Vector[ChunkEntry] = {
    if (bt.addr == Undef) return Vector.empty
    val ndims = cdims.size
    // ---- header (BTHD)
    val hdrLen = 4 + 1 + 1 + 4 + 2 + 2 + 1 + 1 + 8 + 2 + 8 + 4
    val hRaw = new Array[Byte](hdrLen); r.fetch(bt.addr, hdrLen).get(hRaw)
    val h = ByteBuffer.wrap(hRaw).order(ByteOrder.LITTLE_ENDIAN)
    val hSig = new Array[Byte](4); h.get(hSig)
    require(hSig.sameElements("BTHD".getBytes),
      s"bad HDF5 v2 B-tree header signature at ${bt.addr}")
    require(h.get() == 0, "HDF5 v2 B-tree header version unsupported")
    val btType = h.get().toInt
    require(btType == 10 || btType == 11,
      s"HDF5 v2 B-tree record type $btType unsupported (chunk records only)")
    val nodeSize = h.getInt()
    require(nodeSize == bt.nodeSize,
      s"HDF5 v2 B-tree node size $nodeSize != layout message ${bt.nodeSize}")
    val recSize = h.getShort().toInt & 0xFFFF
    val depth = h.getShort().toInt & 0xFFFF
    h.get(); h.get() // split/merge percents
    val rootAddr = h.getLong()
    val rootNrec = h.getShort().toInt & 0xFFFF
    h.getLong() // total records in tree
    checkSum(hRaw, 0, hdrLen - 4, h.getInt(hdrLen - 4).toLong & 0xFFFFFFFFL,
      "v2 B-tree header (BTHD)")
    val szLen = if (btType == 11) recSize - 12 - 8 * ndims else 0
    if (btType == 10)
      require(recSize == 8 + 8 * ndims,
        s"HDF5 v2 B-tree type-10 record size $recSize != ${8 + 8 * ndims}")
    else require(szLen >= 1 && szLen <= 8,
      s"HDF5 v2 B-tree type-11 record size $recSize inconsistent with " +
        s"rank $ndims (chunk-size width $szLen)")
    require(depth <= 1,
      s"HDF5 v2 B-tree depth $depth unsupported (root leaf or one " +
        "internal level only — deeper trees need an external codec)")
    def record(b: ByteBuffer): ChunkEntry = {
      val addr = b.getLong()
      val (nbytes, mask) =
        if (btType == 10) (chunkBytes, 0)
        else {
          val sz = szLen match {
            case 1 => (b.get().toInt & 0xFF).toLong
            case 2 => (b.getShort().toInt & 0xFFFF).toLong
            case 3 => (b.get().toInt & 0xFF).toLong |
              ((b.get().toInt & 0xFF).toLong << 8) |
              ((b.get().toInt & 0xFF).toLong << 16)
            case 4 => b.getInt().toLong & 0xFFFFFFFFL
            case 8 => b.getLong()
            case n => throw new IllegalArgumentException(
              s"HDF5 v2 B-tree chunk-size field width $n unsupported")
          }
          (sz, b.getInt())
        }
      val scaled = Vector.fill(ndims)(b.getLong())
      ChunkEntry(scaled.lazyZip(cdims).map(_ * _).toVector,
        nbytes.toInt, mask, addr)
    }
    def leaf(addr: Long, nrec: Int): Vector[ChunkEntry] = {
      val len = 4 + 1 + 1 + nrec * recSize + 4
      val raw = new Array[Byte](len); r.fetch(addr, len).get(raw)
      val b = ByteBuffer.wrap(raw).order(ByteOrder.LITTLE_ENDIAN)
      val sig = new Array[Byte](4); b.get(sig)
      require(sig.sameElements("BTLF".getBytes),
        s"bad HDF5 v2 B-tree leaf signature at $addr")
      require(b.get() == 0, "HDF5 v2 B-tree leaf version unsupported")
      require(b.get().toInt == btType, "HDF5 v2 B-tree leaf type mismatch")
      checkSum(raw, 0, len - 4, b.getInt(len - 4).toLong & 0xFFFFFFFFL,
        "v2 B-tree leaf (BTLF)")
      b.position(6)
      Vector.fill(nrec)(record(b))
    }
    if (depth == 0) leaf(rootAddr, rootNrec)
    else {
      // one internal level: n records interleave n+1 leaf pointers, each
      // pointer = child address + record count (width = bytes needed for
      // the node-size-implied max leaf records, the spec's encoding)
      val maxLeafRec = (nodeSize - 10) / recSize
      val cntW = (63 - java.lang.Long.numberOfLeadingZeros(
        maxLeafRec.toLong)).toInt / 8 + 1
      val len = 4 + 1 + 1 + rootNrec * recSize +
        (rootNrec + 1) * (8 + cntW) + 4
      val raw = new Array[Byte](len); r.fetch(rootAddr, len).get(raw)
      val b = ByteBuffer.wrap(raw).order(ByteOrder.LITTLE_ENDIAN)
      val sig = new Array[Byte](4); b.get(sig)
      require(sig.sameElements("BTIN".getBytes),
        s"bad HDF5 v2 B-tree internal-node signature at $rootAddr")
      require(b.get() == 0, "HDF5 v2 B-tree internal version unsupported")
      require(b.get().toInt == btType,
        "HDF5 v2 B-tree internal type mismatch")
      checkSum(raw, 0, len - 4, b.getInt(len - 4).toLong & 0xFFFFFFFFL,
        "v2 B-tree internal node (BTIN)")
      b.position(6)
      val recs = Vector.fill(rootNrec)(record(b))
      val ptrs = Vector.fill(rootNrec + 1) {
        val a = b.getLong()
        var n = 0L
        for (i <- 0 until cntW) n |= (b.get().toLong & 0xFF) << (8 * i)
        (a, n.toInt)
      }
      ptrs.flatMap { case (a, n) => leaf(a, n) } ++ recs
    }
  }

  /** Dispatches chunk enumeration over the layout's index structure.
    * `cdims` excludes the trailing element-size entry; `chunkBytes` is the
    * full stored chunk byte count.
    */
  private def chunkEntries(
      r: Reader, ch: Chunked, dsDims: Vector[Long], cdims: Vector[Long],
      chunkBytes: Long): Vector[ChunkEntry] = ch.index match {
    case BTreeV1(addr) =>
      if (addr == Undef) Vector.empty
      else btreeChunkEntries(r, addr, ch.dims.size)
    case SingleChunk(addr, nbytes, mask) =>
      if (addr == Undef) Vector.empty
      else Vector(ChunkEntry(cdims.map(_ => 0L), nbytes.toInt, mask, addr))
    case ImplicitIndex(addr) =>
      require(ch.filters.isEmpty,
        "HDF5 implicit chunk index with a filter pipeline is malformed")
      if (addr == Undef) Vector.empty
      else chunkGrid(dsDims, cdims).zipWithIndex.map { case (offs, i) =>
        ChunkEntry(offs, chunkBytes.toInt, 0, addr + i.toLong * chunkBytes)
      }
    case fa: FixedArrayIndex =>
      fixedArrayEntries(r, fa, dsDims, cdims, chunkBytes)
    case ea: ExtensibleArrayIndex =>
      extensibleArrayEntries(r, ea, dsDims, cdims, chunkBytes)
    case bt: BTreeV2Index =>
      btree2ChunkEntries(r, bt, cdims, chunkBytes)
  }

  /** Reads the hyperslab `[start, start+count)` of a chunked dataset:
    * fetches only the chunks that intersect the box, defilters each
    * (deflate/shuffle/fletcher32), and scatters the intersection into the
    * row-major output. Edge chunks are stored full-size (zero-padded by
    * the writer), per spec. I/O is O(intersecting chunk bytes), preserving
    * the per-slice read bound the DSv2 planner relies on.
    */
  private def readChunked(
      r: Reader, d: Dataset, ch: Chunked,
      start: Vector[Long], count: Vector[Long]): Array[Double] = {
    val rank = d.dims.size
    val cdims = ch.dims.dropRight(1) // trailing entry is element size
    require(cdims.size == rank,
      s"${d.name}: chunk rank ${cdims.size} != dataspace rank $rank")
    val es = d.dtype.size
    val chunkBytes = (cdims.product * es).toInt
    def strides(dims: Vector[Long]): Vector[Long] =
      dims.scanRight(1L)(_ * _).tail
    val dstStride = strides(count)
    val srcStride = strides(cdims)
    val out = new Array[Double](count.product.toInt)
    for (e <- chunkEntries(r, ch, d.dims, cdims, chunkBytes.toLong)) {
      val lo = Vector.tabulate(rank)(i => math.max(e.offs(i), start(i)))
      val hi = Vector.tabulate(rank)(i =>
        math.min(e.offs(i) + cdims(i), start(i) + count(i)))
      if ((0 until rank).forall(i => lo(i) < hi(i))) {
        val raw = new Array[Byte](e.nbytes)
        r.fetch(e.addr, e.nbytes).get(raw)
        val data = defilter(raw, ch.filters, e.mask, es, chunkBytes)
        val bb = ByteBuffer.wrap(data).order(
          if (d.dtype.littleEndian) ByteOrder.LITTLE_ENDIAN
          else ByteOrder.BIG_ENDIAN)
        // odometer over dims 0..rank-2; inner run over the last dim
        val runLen = (hi(rank - 1) - lo(rank - 1)).toInt
        val idx = lo.toArray
        var done = false
        while (!done) {
          var srcBase = 0L; var dstBase = 0L
          var i = 0
          while (i < rank - 1) {
            srcBase += (idx(i) - e.offs(i)) * srcStride(i)
            dstBase += (idx(i) - start(i)) * dstStride(i)
            i += 1
          }
          srcBase += lo(rank - 1) - e.offs(rank - 1)
          dstBase += lo(rank - 1) - start(rank - 1)
          var k = 0
          while (k < runLen) {
            out((dstBase + k).toInt) =
              elemAt(bb, ((srcBase + k) * es).toInt, d.dtype)
            k += 1
          }
          // advance the odometer (dims rank-2 down to 0)
          var dim = rank - 2
          var carried = true
          while (carried && dim >= 0) {
            idx(dim) += 1
            if (idx(dim) < hi(dim)) carried = false
            else { idx(dim) = lo(dim); dim -= 1 }
          }
          if (carried) done = true // rank-1 box: single run
        }
      }
    }
    out
  }

  /** Random-access element decode at a byte offset (buffer order must
    * already match the dtype's endianness).
    */
  private def elemAt(bb: ByteBuffer, off: Int, dt: Dtype): Double =
    (dt.clazz, dt.size) match {
      case (0, 1) => bb.get(off).toDouble
      case (0, 2) => bb.getShort(off).toDouble
      case (0, 4) => bb.getInt(off).toDouble
      case (0, 8) => bb.getLong(off).toDouble
      case (1, 4) => bb.getFloat(off).toDouble
      case (1, 8) => bb.getDouble(off)
      case (c, s) => throw new IllegalArgumentException(
        s"HDF5 element type class=$c size=$s unsupported")
    }

  // ---------------------------------------------------------- group listing

  /** Walks the root group's v1 B-tree -> SNOD nodes -> local heap names and
    * returns name -> object header address for every link.
    */
  /** "Latest format" group listing: hard Link messages (0x0006) stored
    * compactly in the group's own header, or — when the group holds more
    * links than the compact threshold (default 8) — spilled to DENSE
    * storage (a fractal heap of serialized link messages indexed by a
    * name-order v2 B-tree), signalled by a defined heap address in the
    * Link Info message and decoded by [[denseLinks]].
    */
  private def parseLinkGroup(
      r: Reader, msgs: Vector[(Int, ByteBuffer)]): Map[String, Long] = {
    msgs.find(_._1 == 0x0002).foreach { case (_, li0) =>
      val li = li0.duplicate().order(ByteOrder.LITTLE_ENDIAN)
      val v = li.get().toInt
      require(v == 0, s"HDF5 link info version $v unsupported")
      val flags = li.get().toInt
      if ((flags & 0x01) != 0) li.getLong() // max creation index
      val fractalHeap = li.getLong()
      val nameBtree = li.getLong()
      if (fractalHeap != Undef) return denseLinks(r, fractalHeap, nameBtree)
    }
    val links = msgs.filter(_._1 == 0x0006).map { case (_, body) =>
      parseLinkMessage(body.duplicate().order(ByteOrder.LITTLE_ENDIAN))
    }
    require(links.nonEmpty,
      "HDF5 root group has neither a symbol table nor link messages " +
        "(empty or unsupported group storage)")
    links.toMap
  }

  /** One v1 Link message body → (name, object header address). Shared by
    * the compact path (0x0006 header messages) and the dense path (the
    * same serialization, stored as fractal-heap objects).
    */
  private def parseLinkMessage(b: ByteBuffer): (String, Long) = {
    val v = b.get().toInt
    require(v == 1, s"HDF5 link message version $v unsupported")
    val flags = b.get().toInt & 0xFF
    val linkType =
      if ((flags & 0x08) != 0) b.get().toInt & 0xFF else 0
    require(linkType == 0,
      s"HDF5 link type $linkType unsupported (hard links only — " +
        "soft/external links need an external codec)")
    if ((flags & 0x04) != 0) b.getLong() // creation order
    if ((flags & 0x10) != 0) b.get() // charset
    val nameLen = (flags & 0x03) match {
      case 0 => (b.get().toInt & 0xFF).toLong
      case 1 => (b.getShort().toInt & 0xFFFF).toLong
      case 2 => b.getInt().toLong & 0xFFFFFFFFL
      case _ => b.getLong()
    }
    val nameB = new Array[Byte](nameLen.toInt); b.get(nameB)
    (new String(nameB, "UTF-8"), b.getLong())
  }

  /** Dense link storage: walk the name-index v2 B-tree for the heap IDs,
    * resolve each managed heap ID through the fractal heap's doubling
    * table, and parse the object bytes as a v1 link message body —
    * decoded per the public HDF5 File Format Specification III.G
    * (fractal heap) and III.A.2 (v2 B-tree). Bounded slice, rejections
    * by name:
    *  - filtered heaps (libhdf5 never filters dense-LINK heaps);
    *  - huge/tiny heap objects (a link message is tens of bytes — always
    *    managed under the 4096-byte managed-object ceiling, and the
    *    default 7-byte heap ID cannot embed one as tiny);
    *  - indirect child blocks past the doubling table's direct rows (the
    *    direct rows alone address ~width·2·maxDirectBlockSize of link
    *    bytes — ~100k links at libhdf5's defaults — before the first
    *    indirect child exists).
    * Reference site: `processor.py:121` accepts any xarray-readable
    * NetCDF-4 file, including many-variable `libver='latest'` files
    * whose root group has gone dense.
    */
  private def denseLinks(
      r: Reader, heapAddr: Long, btAddr: Long): Map[String, Long] = {
    require(btAddr != Undef,
      "HDF5 dense link storage lacks a name-index v2 B-tree")
    val heap = fractalHeap(r, heapAddr)
    val links = btree2HeapIds(r, btAddr).map { hid =>
      parseLinkMessage(
        ByteBuffer.wrap(heap.read(hid)).order(ByteOrder.LITTLE_ENDIAN))
    }
    require(links.nonEmpty, "HDF5 dense link storage holds no links")
    links.toMap
  }

  /** A parsed fractal heap: `read(heapId)` resolves a managed heap ID to
    * the object's bytes through the block map `(heapOffset, size,
    * fileAddr)`. Each direct block's header (signature, owning heap,
    * block offset, and — when the heap flags say so — the whole-block
    * checksum with the stored sum zeroed, per the spec's serialization)
    * is validated on first touch.
    */
  private final class FractalHeap(
      r: Reader, offSize: Int, lenSize: Int, checksummed: Boolean,
      heapAddr: Long, blocks: Vector[(Long, Long, Long)]) {
    private val validated = scala.collection.mutable.Set.empty[Long]

    private def validate(blk: (Long, Long, Long)): Unit = {
      val (off, size, addr) = blk
      if (!validated.add(addr)) return
      val hdrLen = 4 + 1 + 8 + offSize + (if (checksummed) 4 else 0)
      val raw = new Array[Byte](size.toInt)
      r.fetch(addr, size.toInt).get(raw)
      val b = ByteBuffer.wrap(raw).order(ByteOrder.LITTLE_ENDIAN)
      val sig = new Array[Byte](4); b.get(sig)
      require(sig.sameElements("FHDB".getBytes),
        s"bad HDF5 fractal-heap direct-block signature at $addr")
      require(b.get() == 0,
        "HDF5 fractal-heap direct-block version unsupported")
      require(b.getLong() == heapAddr,
        s"HDF5 fractal-heap direct block at $addr names a different heap")
      var bo = 0L
      for (i <- 0 until offSize) bo |= (b.get().toLong & 0xFF) << (8 * i)
      require(bo == off,
        s"HDF5 fractal-heap direct block at $addr carries heap offset " +
          s"$bo, the doubling table says $off")
      if (checksummed) {
        val stored = b.getInt(hdrLen - 4).toLong & 0xFFFFFFFFL
        java.util.Arrays.fill(raw, hdrLen - 4, hdrLen, 0.toByte)
        checkSum(raw, 0, raw.length, stored,
          "fractal-heap direct block (FHDB)")
      }
    }

    def read(heapId: Array[Byte]): Array[Byte] = {
      require(heapId.length >= 1 + offSize + lenSize,
        s"HDF5 fractal-heap ID of ${heapId.length} bytes shorter than " +
          s"1+$offSize+$lenSize")
      val b0 = heapId(0) & 0xFF
      require((b0 & 0xC0) == 0,
        s"HDF5 fractal-heap ID version ${b0 >> 6} unsupported")
      val idType = (b0 & 0x30) >> 4
      require(idType == 0,
        s"HDF5 fractal-heap ID type $idType unsupported (managed objects " +
          "only — huge/tiny objects never hold link messages)")
      var off = 0L
      for (i <- 0 until offSize)
        off |= (heapId(1 + i).toLong & 0xFF) << (8 * i)
      var len = 0L
      for (i <- 0 until lenSize)
        len |= (heapId(1 + offSize + i).toLong & 0xFF) << (8 * i)
      val blk = blocks.find(b => off >= b._1 && off + len <= b._1 + b._2)
        .getOrElse(throw new IllegalArgumentException(
          s"HDF5 fractal-heap ID (offset $off, length $len) outside " +
            "every allocated direct block"))
      validate(blk)
      val out = new Array[Byte](len.toInt)
      r.fetch(blk._3 + (off - blk._1), len.toInt).get(out)
      out
    }
  }

  /** Parse the fractal-heap header (`FRHP`, checksum-verified) and build
    * the direct-block map: a root direct block (spanning the heap's
    * managed space), or a root indirect block's (`FHIB`) direct rows —
    * rows 0/1 at the starting block size, row n ≥ 2 at
    * startingBlockSize·2^(n−1), `width` blocks per row, per the spec's
    * doubling table. Unallocated entries (undefined address) are holes a
    * valid heap ID never lands in.
    */
  private def fractalHeap(r: Reader, heapAddr: Long): FractalHeap = {
    val hdrLen = 4 + 1 + 2 + 2 + 1 + 4 + 12 * 8 + 2 + 8 + 8 + 2 + 2 + 8 + 2 + 4
    val raw = new Array[Byte](hdrLen); r.fetch(heapAddr, hdrLen).get(raw)
    val h = ByteBuffer.wrap(raw).order(ByteOrder.LITTLE_ENDIAN)
    val sig = new Array[Byte](4); h.get(sig)
    require(sig.sameElements("FRHP".getBytes),
      s"bad HDF5 fractal-heap header signature at $heapAddr")
    require(h.get() == 0, "HDF5 fractal-heap header version unsupported")
    val heapIdLen = h.getShort().toInt & 0xFFFF
    val filterLen = h.getShort().toInt & 0xFFFF
    require(filterLen == 0,
      "HDF5 filtered fractal heap unsupported (dense LINK heaps are " +
        "never filtered)")
    val flags = h.get().toInt & 0xFF
    val maxManagedObj = h.getInt().toLong & 0xFFFFFFFFL
    h.getLong() // next huge object id
    h.getLong() // huge-object v2 B-tree address
    h.getLong() // free space in managed blocks
    h.getLong() // free-space manager address
    val managedSpace = h.getLong()
    h.getLong() // allocated managed space
    h.getLong() // direct-block iterator offset
    h.getLong() // number of managed objects
    h.getLong() // size of huge objects
    val nHuge = h.getLong()
    h.getLong() // size of tiny objects
    val nTiny = h.getLong()
    require(nHuge == 0 && nTiny == 0,
      s"HDF5 fractal heap holds $nHuge huge / $nTiny tiny objects — " +
        "unsupported (link messages are always managed)")
    val width = h.getShort().toInt & 0xFFFF
    val startBlockSize = h.getLong()
    val maxDirectSize = h.getLong()
    val maxHeapBits = h.getShort().toInt & 0xFFFF
    h.getShort() // starting rows in root indirect block
    val rootAddr = h.getLong()
    val curRootRows = h.getShort().toInt & 0xFFFF
    checkSum(raw, 0, hdrLen - 4, h.getInt(hdrLen - 4).toLong & 0xFFFFFFFFL,
      "fractal-heap header (FRHP)")
    require(width > 0 && startBlockSize > 0 &&
      maxDirectSize >= startBlockSize,
      s"corrupt HDF5 fractal-heap doubling table (width=$width, " +
        s"start=$startBlockSize, maxDirect=$maxDirectSize)")
    val offSize = (maxHeapBits + 7) / 8
    val lenSize = (63 - java.lang.Long.numberOfLeadingZeros(
      maxManagedObj.max(1L))).toInt / 8 + 1
    require(heapIdLen == 1 + offSize + lenSize,
      s"HDF5 fractal-heap ID length $heapIdLen != 1+$offSize+$lenSize " +
        "(non-default heap ID encodings unsupported)")
    require(rootAddr != Undef, "HDF5 fractal heap has no root block")
    val checksummed = (flags & 0x02) != 0
    def log2(v: Long): Int = 63 - java.lang.Long.numberOfLeadingZeros(v)
    def rowSize(row: Int): Long =
      if (row < 2) startBlockSize else startBlockSize << (row - 1)
    require(java.lang.Long.bitCount(width.toLong) == 1,
      s"HDF5 fractal-heap width $width is not a power of two")
    val logW = log2(width.toLong)
    val maxDirectRows = log2(maxDirectSize) - log2(startBlockSize) + 2
    // Recursion depth bound: each indirect level multiplies coverage by
    // >= 2^maxDirectRows x width, so 4 levels at libhdf5's defaults
    // (width 4, 512 B start, 64 KiB max direct) already exceeds 2^40
    // bytes of link messages — anything deeper is corrupt, not big.
    val MaxIndirectDepth = 4
    /** Expand an indirect block (`FHIB`) into its direct-block map,
      * recursing into indirect CHILD entries (rows >= maxDirectRows; a
      * child in row n carries n - log2(width) rows and covers exactly
      * rowSize(n) bytes — spec III.G's doubling table, matching
      * libhdf5's size_to_rows arithmetic). Checksums verified per block.
      */
    def readIndirect(
        addr: Long, blockOff: Long, nrows: Int,
        depth: Int): Vector[(Long, Long, Long)] = {
      require(depth <= MaxIndirectDepth,
        s"HDF5 fractal-heap indirect nesting deeper than " +
          s"$MaxIndirectDepth levels — corrupt doubling table")
      val ibLen = 4 + 1 + 8 + offSize + nrows * width * 8 + 4
      val ibRaw = new Array[Byte](ibLen)
      r.fetch(addr, ibLen).get(ibRaw)
      val ib = ByteBuffer.wrap(ibRaw).order(ByteOrder.LITTLE_ENDIAN)
      val ibSig = new Array[Byte](4); ib.get(ibSig)
      require(ibSig.sameElements("FHIB".getBytes),
        s"bad HDF5 fractal-heap indirect-block signature at $addr")
      require(ib.get() == 0,
        "HDF5 fractal-heap indirect-block version unsupported")
      require(ib.getLong() == heapAddr,
        "HDF5 fractal-heap indirect block names a different heap")
      var bo = 0L
      for (i <- 0 until offSize) bo |= (ib.get().toLong & 0xFF) << (8 * i)
      require(bo == blockOff,
        s"HDF5 fractal-heap indirect block at $addr carries heap offset " +
          s"$bo, expected $blockOff")
      val entries = Vector.fill(nrows * width)(ib.getLong())
      checkSum(ibRaw, 0, ibLen - 4,
        ib.getInt(ibLen - 4).toLong & 0xFFFFFFFFL,
        "fractal-heap indirect block (FHIB)")
      var heapOff = blockOff
      val out = Vector.newBuilder[(Long, Long, Long)]
      for (row <- 0 until nrows; c <- 0 until width) {
        val addr2 = entries(row * width + c)
        if (addr2 != Undef) {
          if (row < maxDirectRows) out += ((heapOff, rowSize(row), addr2))
          else {
            val childRows = row - logW
            require(childRows >= 1,
              s"HDF5 fractal-heap indirect entry in row $row implies a " +
                s"zero-row child — corrupt doubling table")
            out ++= readIndirect(addr2, heapOff, childRows, depth + 1)
          }
        }
        heapOff += rowSize(row)
      }
      out.result()
    }
    val blocks: Vector[(Long, Long, Long)] =
      if (curRootRows == 0) {
        // root IS a direct block spanning the heap's whole managed space
        Vector((0L, managedSpace.max(startBlockSize), rootAddr))
      } else readIndirect(rootAddr, 0L, curRootRows, 1)
    new FractalHeap(r, offSize, lenSize, checksummed, heapAddr, blocks)
  }

  /** Walk a name-index v2 B-tree (`BTHD`, record type 5: {name hash,
    * heap ID}) and return every record's heap ID. Same bounded slice as
    * [[btree2ChunkEntries]]: depth ≤ 1 (a depth-0 leaf holds ~45 links
    * at libhdf5's 512-byte node, one internal level ~2000), deeper trees
    * rejected by name; all node checksums verified.
    */
  private def btree2HeapIds(r: Reader, btAddr: Long): Vector[Array[Byte]] = {
    val hdrLen = 4 + 1 + 1 + 4 + 2 + 2 + 1 + 1 + 8 + 2 + 8 + 4
    val raw = new Array[Byte](hdrLen); r.fetch(btAddr, hdrLen).get(raw)
    val h = ByteBuffer.wrap(raw).order(ByteOrder.LITTLE_ENDIAN)
    val sig = new Array[Byte](4); h.get(sig)
    require(sig.sameElements("BTHD".getBytes),
      s"bad HDF5 v2 B-tree header signature at $btAddr")
    require(h.get() == 0, "HDF5 v2 B-tree header version unsupported")
    val btType = h.get().toInt
    require(btType == 5,
      s"HDF5 v2 B-tree record type $btType unsupported here (type-5 " +
        "link-name records only)")
    val nodeSize = h.getInt()
    val recSize = h.getShort().toInt & 0xFFFF
    val depth = h.getShort().toInt & 0xFFFF
    h.get(); h.get() // split/merge percents
    val rootAddr = h.getLong()
    val rootNrec = h.getShort().toInt & 0xFFFF
    h.getLong() // total records in tree
    checkSum(raw, 0, hdrLen - 4, h.getInt(hdrLen - 4).toLong & 0xFFFFFFFFL,
      "v2 B-tree header (BTHD)")
    require(recSize > 4 && recSize <= 64,
      s"HDF5 type-5 record size $recSize outside (4, 64]")
    require(depth <= 1,
      s"HDF5 v2 B-tree depth $depth unsupported (root leaf or one " +
        "internal level only — deeper trees need an external codec)")
    def record(b: ByteBuffer): Array[Byte] = {
      b.getInt() // hash of the link name (the tree's sort key; unused)
      val id = new Array[Byte](recSize - 4); b.get(id)
      id
    }
    def leaf(addr: Long, nrec: Int): Vector[Array[Byte]] = {
      val len = 4 + 1 + 1 + nrec * recSize + 4
      val lRaw = new Array[Byte](len); r.fetch(addr, len).get(lRaw)
      val b = ByteBuffer.wrap(lRaw).order(ByteOrder.LITTLE_ENDIAN)
      val lSig = new Array[Byte](4); b.get(lSig)
      require(lSig.sameElements("BTLF".getBytes),
        s"bad HDF5 v2 B-tree leaf signature at $addr")
      require(b.get() == 0, "HDF5 v2 B-tree leaf version unsupported")
      require(b.get().toInt == btType, "HDF5 v2 B-tree leaf type mismatch")
      checkSum(lRaw, 0, len - 4, b.getInt(len - 4).toLong & 0xFFFFFFFFL,
        "v2 B-tree leaf (BTLF)")
      b.position(6)
      Vector.fill(nrec)(record(b))
    }
    if (depth == 0) leaf(rootAddr, rootNrec)
    else {
      val maxLeafRec = (nodeSize - 10) / recSize
      val cntW = (63 - java.lang.Long.numberOfLeadingZeros(
        maxLeafRec.toLong)).toInt / 8 + 1
      val len = 4 + 1 + 1 + rootNrec * recSize +
        (rootNrec + 1) * (8 + cntW) + 4
      val iRaw = new Array[Byte](len); r.fetch(rootAddr, len).get(iRaw)
      val b = ByteBuffer.wrap(iRaw).order(ByteOrder.LITTLE_ENDIAN)
      val iSig = new Array[Byte](4); b.get(iSig)
      require(iSig.sameElements("BTIN".getBytes),
        s"bad HDF5 v2 B-tree internal-node signature at $rootAddr")
      require(b.get() == 0, "HDF5 v2 B-tree internal version unsupported")
      require(b.get().toInt == btType,
        "HDF5 v2 B-tree internal type mismatch")
      checkSum(iRaw, 0, len - 4, b.getInt(len - 4).toLong & 0xFFFFFFFFL,
        "v2 B-tree internal node (BTIN)")
      b.position(6)
      val recs = Vector.fill(rootNrec)(record(b))
      val ptrs = Vector.fill(rootNrec + 1) {
        val a = b.getLong()
        var n = 0L
        for (i <- 0 until cntW) n |= (b.get().toLong & 0xFF) << (8 * i)
        (a, n.toInt)
      }
      ptrs.flatMap { case (a, n) => leaf(a, n) } ++ recs
    }
  }

  private def listRoot(r: Reader): Map[String, Long] = {
    val (rootOh, cachedBtree, cachedHeap) = readSuperblock(r)
    var linkMap: Map[String, Long] = null
    val (btree, heap) =
      if (cachedBtree != Undef) (cachedBtree, cachedHeap)
      else {
        val msgs = readMessages(r, rootOh)
        msgs.find(_._1 == 0x0011) match {
          case Some((_, st0)) =>
            val st = st0.duplicate().order(ByteOrder.LITTLE_ENDIAN)
            (st.getLong(), st.getLong())
          case None =>
            linkMap = parseLinkGroup(r, msgs)
            (Undef, Undef)
        }
      }
    if (linkMap != null) return linkMap
    // local heap: version + data segment address
    val hh = r.fetch(heap, 32)
    val hSig = new Array[Byte](4); hh.get(hSig)
    require(hSig.sameElements("HEAP".getBytes), "bad HDF5 local heap signature")
    hh.get(); hh.get(); hh.get(); hh.get() // version + reserved
    hh.getLong(); hh.getLong() // data segment size, free-list head
    val heapData = hh.getLong()
    def heapName(off: Long): String = {
      val bytes = scala.collection.mutable.ArrayBuffer.empty[Byte]
      var pos = heapData + off
      var done = false
      while (!done) {
        val chunk = r.fetch(pos, 64)
        while (!done && chunk.hasRemaining) {
          val c = chunk.get()
          if (c == 0) done = true else bytes += c
        }
        pos += 64
      }
      new String(bytes.toArray, "UTF-8")
    }
    def walk(nodeAddr: Long): Vector[(String, Long)] = {
      val head = r.fetch(nodeAddr, 24)
      val sig = new Array[Byte](4); head.get(sig)
      if (sig.sameElements("SNOD".getBytes)) {
        head.get(); head.get() // version + reserved
        val n = head.getShort().toInt & 0xFFFF
        val body = r.fetch(nodeAddr + 8L, n * 40)
        Vector.fill(n) {
          val nameOff = body.getLong()
          val oh = body.getLong()
          body.getInt(); body.getInt() // cache type + reserved
          body.position(body.position() + 16) // scratch
          (heapName(nameOff), oh)
        }
      } else {
        require(sig.sameElements("TREE".getBytes),
          "bad HDF5 B-tree/SNOD signature")
        val nodeType = head.get().toInt
        require(nodeType == 0, s"HDF5 B-tree node type $nodeType (group only)")
        head.get() // level (children walked uniformly: TREE or SNOD by sig)
        val n = head.getShort().toInt & 0xFFFF
        // keys/children: key0 child0 key1 child1 ... keyN (keys are heap
        // offsets, 8 bytes; children are addresses, 8 bytes)
        val kc = r.fetch(nodeAddr + 24L, n * 16 + 8)
        val children = Vector.fill(n) { kc.getLong(); kc.getLong() }
        children.flatMap(walk)
      }
    }
    walk(btree).toMap
  }

  // -------------------------------------------------------------- grid view

  private val MeanNames = Seq("sic_mean", "mean")
  private val StddevNames = Seq("sic_stddev", "stddev")

  private def find(
      sets: Map[String, Long], names: Seq[String]): Option[(String, Long)] =
    names.collectFirst { case n if sets.contains(n) => (n, sets(n)) }

  private def required(
      sets: Map[String, Long], names: Seq[String]): (String, Long) =
    find(sets, names).getOrElse(throw new IllegalArgumentException(
      s"HDF5/NetCDF-4 file lacks dataset ${names.mkString("/")} " +
        s"(has ${sets.keys.toSeq.sorted.mkString(", ")})"))

  def readGridHeader(path: String): GridFile.Header = {
    val in = openHadoop(path)
    try {
      val r = new Reader(in)
      val root = listRoot(r)
      def len(names: String*): Int = {
        val (n, addr) = required(root, names)
        val d = readDataset(r, n, addr)
        require(d.dims.size == 1, s"$n: expected 1-D coordinate")
        d.dims.head.toInt
      }
      GridFile.Header(len("time"), len("leadtime"), len("yc"), len("xc"))
    } finally in.close()
  }

  def readGridSlice(
      path: String, timeIdx: Int,
      needMean: Boolean, needStddev: Boolean): GridFile.GridSlice = {
    val in = openHadoop(path)
    try {
      val r = new Reader(in)
      val root = listRoot(r)
      def coord(names: String*): Dataset = {
        val (n, addr) = required(root, names)
        readDataset(r, n, addr)
      }
      // hyperslab read; the non-chunked layouts only ever see dense boxes
      // (a fixed leading index + full trailing dims, or a 1-D range), so
      // they reduce to one positioned linear read
      def box(
          d: Dataset, start: Vector[Long], count: Vector[Long]): Array[Double] =
        d.layout match {
          case ch: Chunked => readChunked(r, d, ch, start, count)
          case other =>
            val strides = d.dims.scanRight(1L)(_ * _).tail
            val from = (start zip strides).map { case (s, st) => s * st }.sum
            val n = count.product.toInt
            val es = d.dtype.size
            val bb = other match {
              case Compact(bytes) =>
                ByteBuffer.wrap(bytes, (from * es).toInt, n * es)
                  .slice().order(ByteOrder.LITTLE_ENDIAN)
              case Contiguous(addr, _) =>
                require(addr != Undef, s"${d.name}: no data allocated")
                r.fetch(addr + from * es, n * es)
              case _: Chunked => throw new IllegalStateException("unreachable")
            }
            Array.fill(n)(readElem(bb, d.dtype))
        }
      def values(d: Dataset, from: Long, count: Int): Array[Double] =
        box(d, Vector(from), Vector(count.toLong))
      val timeDs = coord("time")
      val nt = timeDs.dims.head.toInt
      require(timeIdx >= 0 && timeIdx < nt,
        s"$path: time slice $timeIdx not in [0,$nt)")
      val leadDs = coord("leadtime")
      val ycDs = coord("yc")
      val xcDs = coord("xc")
      val (nl, ny, nx) =
        (leadDs.dims.head.toInt, ycDs.dims.head.toInt, xcDs.dims.head.toInt)
      val timeMicros = NetcdfClassic.toEpochMicros(
        values(timeDs, timeIdx.toLong, 1).head, timeDs.atts.get("units"))
      val leads = values(leadDs, 0L, nl).map(_.toInt)
      val yc = values(ycDs, 0L, ny)
      val xc = values(xcDs, 0L, nx)
      val sliceVals = nl * ny * nx
      def slab(names: Seq[String]): Array[Double] = {
        val d = coord(names: _*)
        require(d.dims == Vector(nt.toLong, nl.toLong, ny.toLong, nx.toLong),
          s"${d.name} dims ${d.dims} != (time, leadtime, yc, xc) = " +
            s"($nt, $nl, $ny, $nx); transposed layouts unsupported")
        // dimension IDENTITY, not just shape: when the file carries
        // netCDF-4's DIMENSION_LIST, the referenced dimension-scale
        // object headers must be (time, leadtime, yc, xc) in that order —
        // a transposed tensor whose axis lengths coincide is caught here
        // rather than silently misread
        if (d.dimRefs.nonEmpty) {
          val want = Vector("time", "leadtime", "yc", "xc")
            .map(n => required(root, Seq(n))._2)
          require(d.dimRefs == want,
            s"${d.name}: DIMENSION_LIST references object headers " +
              s"${d.dimRefs} but (time, leadtime, yc, xc) are at $want — " +
              "tensor axes are transposed or bound to other dimensions")
        }
        val out = box(d, Vector(timeIdx.toLong, 0L, 0L, 0L),
          Vector(1L, nl.toLong, ny.toLong, nx.toLong))
        d.atts.get("_FillValue") match {
          case Some(fv: Vector[_]) if fv.nonEmpty =>
            val f = fv.head.asInstanceOf[Double]
            var i = 0
            while (i < out.length) { if (out(i) == f) out(i) = Double.NaN; i += 1 }
          case _ => ()
        }
        out
      }
      val mean =
        if (needMean) slab(MeanNames) else Array.fill(sliceVals)(Double.NaN)
      val stddev =
        if (needStddev) slab(StddevNames) else Array.fill(sliceVals)(Double.NaN)
      GridFile.GridSlice(nl, ny, nx, timeMicros, leads, yc, xc, mean, stddev)
    } finally in.close()
  }

  // ----------------------------------------------------------------- write

  /** Little-endian byte builder for the writer below. */
  private class Le {
    val bos = new java.io.ByteArrayOutputStream()
    def u8(v: Int): this.type = { bos.write(v & 0xFF); this }
    def u16(v: Int): this.type = { u8(v); u8(v >>> 8) }
    def u32(v: Long): this.type = { u16(v.toInt); u16((v >>> 16).toInt) }
    def u64(v: Long): this.type = { u32(v); u32(v >>> 32) }
    def f64(v: Double): this.type = u64(java.lang.Double.doubleToLongBits(v))
    def f32(v: Float): this.type = u32(java.lang.Float.floatToIntBits(v).toLong & 0xFFFFFFFFL)
    def raw(b: Array[Byte]): this.type = { bos.write(b); this }
    def pad(align: Int): this.type = {
      while (bos.size() % align != 0) u8(0); this
    }
    def size: Int = bos.size()
    def bytes: Array[Byte] = bos.toByteArray
  }

  // serialized datatype bodies (header + properties, little-endian data)
  private def dtFloat64: Array[Byte] = new Le()
    .u8(0x11).u8(0x20).u8(63).u8(0).u32(8) // v1 class1; norm=2; sign@63
    .u16(0).u16(64).u8(52).u8(11).u8(0).u8(52).u32(1023).bytes
  private def dtFloat32: Array[Byte] = new Le()
    .u8(0x11).u8(0x20).u8(31).u8(0).u32(4)
    .u16(0).u16(32).u8(23).u8(8).u8(0).u8(23).u32(127).bytes
  private def dtInt32: Array[Byte] = new Le()
    .u8(0x10).u8(0x08).u8(0).u8(0).u32(4) // v1 class0; LE, signed
    .u16(0).u16(32).bytes
  private def dtString(n: Int): Array[Byte] = new Le()
    .u8(0x13).u8(0).u8(0).u8(0).u32(n.toLong).bytes // null-terminated

  private def dataspace(dims: Seq[Long]): Array[Byte] = {
    val le = new Le().u8(1).u8(dims.size).u8(0).u8(0).u32(0) // v1 + reserved
    dims.foreach(le.u64)
    le.bytes
  }

  /** Byte-authors a minimal spec-conformant NetCDF-4-shaped HDF5 file with
    * the IceNet tensor layout — the fixture/spec writer for the decoder
    * above, exercising exactly the in-scope feature set: superblock v0,
    * symbol-table root group (B-tree + SNOD + local heap), v1 object
    * headers, contiguous OR chunked+filtered layouts, v1 attributes (CF
    * time units, `_FillValue`). `floatData` stores the tensors as IEEE f32
    * (the real files' type); time is f64 CF seconds so unit conversion is
    * exercised.
    *
    * `chunkX` chunks the two 4-D variables as (1, nl, ny, chunkX) — one
    * chunk row per time step, split along x (a partial edge chunk when
    * chunkX does not divide nx, stored full-size zero-padded per spec).
    * `filters` is the write-order pipeline applied to those chunks:
    * 1 = deflate, 2 = shuffle, 3 = fletcher32 (netCDF4's default
    * compression is shuffle+deflate, i.e. `Seq(2, 1)`). Unknown ids are
    * LISTED in the pipeline message but not applied — the hook the
    * rejection spec uses to prove unsupported filters fail loudly.
    * Filters force chunking (chunkX defaults to nx).
    */
  /** `latestFormat` switches the container dialect to what
    * `libver='latest'` writers emit: superblock v3, v2 `OHDR` object
    * headers (lookup3-checksummed), compact link-message group storage,
    * v2 dataspaces, v3 attributes, and v4 data layouts whose chunk index
    * is a Fixed Array (or Single Chunk when the chunk covers the whole
    * dataset). The logical content is identical to the default dialect.
    */
  def write(
      path: String, timesMicros: Array[Long], leadtimes: Array[Int],
      yc: Array[Double], xc: Array[Double],
      mean: Array[Double], stddev: Array[Double],
      floatData: Boolean = false, fillValue: Option[Double] = None,
      bookkeepingAttrs: Boolean = false,
      chunkX: Option[Int] = None, filters: Seq[Int] = Nil,
      latestFormat: Boolean = false,
      dimList: Option[Seq[String]] = None,
      unlimitedTime: Boolean = false,
      splitHeaders: Boolean = false,
      implicitIndex: Boolean = false,
      btreeV2Index: Boolean = false,
      bt2NodeSize: Int = 2048,
      denseLinks: Boolean = false,
      denseLinkPad: Int = 0,
      denseIndirectChild: Boolean = false): Unit = {
    require(!denseIndirectChild || denseLinks,
      "denseIndirectChild only makes sense with denseLinks")
    require(!btreeV2Index || (latestFormat && chunkX.isDefined &&
      !unlimitedTime && !implicitIndex),
      "btreeV2Index needs latestFormat + chunkX, sans unlimited/implicit")
    require(!denseLinks || latestFormat,
      "denseLinks (fractal-heap group storage) is a latest-format dialect")
    require(denseLinkPad == 0 || denseLinks,
      "denseLinkPad only makes sense with denseLinks")
    require(dimList.isEmpty || latestFormat,
      "dimList fixtures are authored in the latest-format dialect")
    require(!unlimitedTime || latestFormat,
      "unlimitedTime (extensible-array index) is a latest-format dialect")
    require(!splitHeaders || latestFormat,
      "splitHeaders (OCHK continuation blocks) is a latest-format dialect")
    require(!implicitIndex || (latestFormat && filters.isEmpty && !unlimitedTime),
      "implicitIndex is a latest-format, unfiltered, fixed-dims dialect")
    val nt = timesMicros.length
    val (nl, ny, nx) = (leadtimes.length, yc.length, xc.length)
    require(mean.length == nt * nl * ny * nx && stddev.length == mean.length)
    val dataEs = if (floatData) 4 else 8
    val dtData = if (floatData) dtFloat32 else dtFloat64

    def message(msgType: Int, body: Array[Byte]): Array[Byte] = {
      val padded = (body.length + 7) / 8 * 8
      val le = new Le().u16(msgType).u16(padded).u8(0).u8(0).u8(0).u8(0)
        .raw(body)
      while (le.size < 8 + padded) le.u8(0)
      le.bytes
    }
    def objectHeader(msgs: Seq[Array[Byte]]): Array[Byte] = {
      val body = msgs.flatten.toArray
      new Le().u8(1).u8(0).u16(msgs.size).u32(1).u32(body.length)
        .u32(0) // pad to 8-byte boundary (prefix is 16 bytes total)
        .raw(body).bytes
    }
    def attr(name: String, dt: Array[Byte], ds: Array[Byte],
        data: Array[Byte]): Array[Byte] = {
      val nameB = name.getBytes("UTF-8") :+ 0.toByte
      val le = new Le().u8(1).u8(0)
        .u16(nameB.length).u16(dt.length).u16(ds.length)
      le.raw(nameB).pad(8).raw(dt).pad(8).raw(ds).pad(8).raw(data)
      message(0x000C, le.bytes)
    }
    val unitsStr = "seconds since 1970-01-01 00:00:00"
    val unitsB = unitsStr.getBytes("UTF-8") :+ 0.toByte
    val fillAttr = fillValue.toSeq.map(f =>
      attr("_FillValue", dtFloat64, dataspace(Nil), new Le().f64(f).bytes))
    // mimic netCDF-4's dimension-scale bookkeeping: a reference-class
    // (class 7) attribute the reader must SKIP, not choke on
    val refAttr =
      if (!bookkeepingAttrs) Nil
      else Seq(attr("REFERENCE_LIST",
        new Le().u8(0x17).u8(0).u8(0).u8(0).u32(8L).bytes, // v1 class 7
        dataspace(Nil), new Le().u64(0L).bytes))

    // one object header per dataset; layout message body rewritten once
    // data offsets are known (fixed 18-byte body => stable header size)
    case class Spec(name: String, dims: Seq[Long], dt: Array[Byte], es: Int,
        extraAtts: Seq[Array[Byte]])
    val specs = Seq(
      Spec("time", Seq(nt.toLong), dtFloat64, 8,
        Seq(attr("units", dtString(unitsB.length), dataspace(Nil), unitsB))),
      Spec("leadtime", Seq(nl.toLong), dtInt32, 4, Nil),
      Spec("yc", Seq(ny.toLong), dtFloat64, 8, Nil),
      Spec("xc", Seq(nx.toLong), dtFloat64, 8, Nil),
      Spec("sic_mean", Seq(nt.toLong, nl.toLong, ny.toLong, nx.toLong),
        dtData, dataEs, fillAttr ++ refAttr),
      Spec("sic_stddev", Seq(nt.toLong, nl.toLong, ny.toLong, nx.toLong),
        dtData, dataEs, fillAttr ++ refAttr))

    // ---- per-spec raw data (row-major, fill-masked, final byte form) ----
    def series(s: Spec): Int => Double = s.name match {
      case "time" => i => timesMicros(i) / 1e6
      case "leadtime" => i => leadtimes(i).toDouble
      case "yc" => i => yc(i)
      case "xc" => i => xc(i)
      case "sic_mean" => i => mean(i)
      case "sic_stddev" => i => stddev(i)
    }
    def rawFor(s: Spec): Array[Byte] = {
      val le = new Le()
      val f = series(s)
      val n = s.dims.product.toInt
      var i = 0
      while (i < n) {
        val v = f(i)
        val masked = fillValue match {
          case Some(fl) if v.isNaN && s.name.startsWith("sic_") => fl
          case _ => v
        }
        if (s.es == 4 && s.name == "leadtime") le.u32(masked.toLong)
        else if (s.es == 4) le.f32(masked.toFloat)
        else le.f64(masked)
        i += 1
      }
      le.bytes
    }

    // ---- chunking + filter application (the two 4-D vars only) ----
    val chunkedNames: Set[String] =
      if (chunkX.isDefined || filters.nonEmpty || unlimitedTime)
        Set("sic_mean", "sic_stddev")
      else Set.empty
    val cx = chunkX.getOrElse(nx)
    def applyFilters(full: Array[Byte]): Array[Byte] = {
      var data = full
      filters.foreach {
        case 2 => // shuffle into byte planes
          val n = data.length / dataEs
          val out = new Array[Byte](data.length)
          var j = 0
          while (j < dataEs) {
            var k = 0
            while (k < n) { out(j * n + k) = data(k * dataEs + j); k += 1 }
            j += 1
          }
          data = out
        case 1 => // deflate
          val d = new java.util.zip.Deflater(6)
          d.setInput(data); d.finish()
          val buf = new Array[Byte](data.length + 64)
          val bos = new java.io.ByteArrayOutputStream()
          while (!d.finished()) bos.write(buf, 0, d.deflate(buf))
          d.end()
          data = bos.toByteArray
        case 3 => // fletcher32: append little-endian checksum
          val c = fletcher32(data, data.length)
          data = data ++ Array[Byte](c.toByte, (c >>> 8).toByte,
            (c >>> 16).toByte, (c >>> 24).toByte)
        case _ => () // unknown id: listed in the message, never applied
      }
      data
    }
    case class ChunkBlob(offs: Vector[Long], bytes: Array[Byte])
    def chunksFor(s: Spec, raw: Array[Byte]): Seq[ChunkBlob] = {
      val chunkElems = nl * ny * cx
      for (t <- 0 until nt; x0 <- 0 until nx by cx) yield {
        val full = new Array[Byte](chunkElems * s.es)
        var p = 0
        for (l <- 0 until nl; y <- 0 until ny; xi <- 0 until cx) {
          val x = x0 + xi
          if (x < nx) { // partial edge chunk: zero-padded to full size
            val src = (((t * nl + l) * ny + y) * nx + x) * s.es
            System.arraycopy(raw, src, full, p, s.es)
          }
          p += s.es
        }
        ChunkBlob(Vector(t.toLong, 0L, 0L, x0.toLong, 0L),
          applyFilters(full))
      }
    }

    // ---- "latest format" dialect: v2 OHDR + link messages + v4 layout ----
    if (latestFormat) {
      // v2 message: type(1) size(2) flags(1) body — exact, unpadded
      def msg2(msgType: Int, body: Array[Byte]): Array[Byte] =
        new Le().u8(msgType).u16(body.length).u8(0).raw(body).bytes
      // v2 OHDR: flags 0x01 (2-byte chunk-0 size), no times, checksummed
      def ohdr2(msgs: Seq[Array[Byte]]): Array[Byte] = {
        val body = msgs.flatten.toArray
        val le = new Le().raw("OHDR".getBytes).u8(2).u8(0x01)
          .u16(body.length).raw(body)
        val b = le.bytes
        new Le().raw(b).u32(lookup3(b, 0, b.length)).bytes
      }
      // OCHK continuation block: signature + messages + checksum
      def ochk(msgs: Seq[Array[Byte]]): Array[Byte] = {
        val b = new Le().raw("OCHK".getBytes).raw(msgs.flatten.toArray).bytes
        new Le().raw(b).u32(lookup3(b, 0, b.length)).bytes
      }
      def dataspace2(
          dims: Seq[Long], unlimFirst: Boolean = false): Array[Byte] = {
        val le = new Le().u8(2).u8(dims.size).u8(if (unlimFirst) 1 else 0)
          .u8(if (dims.isEmpty) 0 else 1)
        dims.foreach(le.u64)
        if (unlimFirst) { // max dims: first unlimited (all-ones), rest fixed
          le.u64(Undef)
          dims.drop(1).foreach(le.u64)
        }
        le.bytes
      }
      def attr3(name: String, dt: Array[Byte], ds: Array[Byte],
          data: Array[Byte]): Array[Byte] = {
        val nameB = name.getBytes("UTF-8") :+ 0.toByte
        msg2(0x000C, new Le().u8(3).u8(0)
          .u16(nameB.length).u16(dt.length).u16(ds.length).u8(0)
          .raw(nameB).raw(dt).raw(ds).raw(data).bytes)
      }
      // vlen-of-object-reference datatype: v1 class 9 (sequence), 16-byte
      // stored form, base type v1 class 7 (object reference), 8 bytes
      val dtVlenRef: Array[Byte] = new Le()
        .u8(0x19).u8(0).u8(0).u8(0).u32(16L)
        .u8(0x17).u8(0).u8(0).u8(0).u32(8L).bytes
      def attsFor(s: Spec, gcol: Long): Seq[Array[Byte]] = {
        val units =
          if (s.name == "time")
            Seq(attr3("units", dtString(unitsB.length), dataspace2(Nil), unitsB))
          else Nil
        val fill =
          if (s.name.startsWith("sic_"))
            fillValue.toSeq.map(f => attr3("_FillValue", dtFloat64,
              dataspace2(Nil), new Le().f64(f).bytes))
          else Nil
        // netCDF-4 dimension identity: one 1-element vlen per axis, each
        // pointing at global heap object i+1 (the i-th dim scale's address)
        val dims =
          if (s.name.startsWith("sic_") && dimList.isDefined) {
            val le = new Le()
            for (i <- 0 until 4) { le.u32(1L); le.u64(gcol); le.u32(i + 1L) }
            Seq(attr3("DIMENSION_LIST", dtVlenRef, dataspace2(Seq(4L)),
              le.bytes))
          } else Nil
        units ++ fill ++ dims
      }
      def filterMsg2: Array[Byte] = {
        val le = new Le().u8(2).u8(filters.size)
        filters.foreach { id =>
          val cd: Seq[Long] = id match {
            case 1 => Seq(6L)
            case 2 => Seq(dataEs.toLong)
            case _ => Nil
          }
          le.u16(id).u16(0).u16(cd.size)
          cd.foreach(le.u32)
        }
        msg2(0x000B, le.bytes)
      }
      val filtered = filters.nonEmpty
      // v4 layouts; chunk dims carry the trailing element size, per spec
      def layout4Contiguous(addr: Long, size: Long): Array[Byte] =
        msg2(0x0008, new Le().u8(4).u8(1).u64(addr).u64(size).bytes)
      def layout4Single(addr: Long, nbytes: Long, mask: Int): Array[Byte] = {
        val le = new Le().u8(4).u8(2).u8(if (filtered) 0x02 else 0)
          .u8(5).u8(8)
        Seq(1L, nl.toLong, ny.toLong, cx.toLong, dataEs.toLong).foreach(le.u64)
        le.u8(1)
        if (filtered) { le.u64(nbytes); le.u32(mask.toLong) }
        msg2(0x0008, le.u64(addr).bytes)
      }
      def layout4Fa(faAddr: Long, pageBits: Int): Array[Byte] = {
        val le = new Le().u8(4).u8(2).u8(0).u8(5).u8(8)
        Seq(1L, nl.toLong, ny.toLong, cx.toLong, dataEs.toLong).foreach(le.u64)
        msg2(0x0008, le.u8(3).u8(pageBits).u64(faAddr).bytes)
      }
      // EA creation parameters (libhdf5's defaults); layout-message order
      // is maxBits, ibElmts, sbMinPtrs, dbMinElmts, pageBits — NOT the
      // EAHD order
      val EaMaxBits = 32; val EaIbElmts = 4; val EaSbMinPtrs = 4
      val EaDbMinElmts = 16; val EaPageBits = 10
      def layout4Ea(hdrAddr: Long): Array[Byte] = {
        val le = new Le().u8(4).u8(2).u8(0).u8(5).u8(8)
        Seq(1L, nl.toLong, ny.toLong, cx.toLong, dataEs.toLong).foreach(le.u64)
        le.u8(4).u8(EaMaxBits).u8(EaIbElmts).u8(EaSbMinPtrs)
          .u8(EaDbMinElmts).u8(EaPageBits)
        msg2(0x0008, le.u64(hdrAddr).bytes)
      }
      def layout4Implicit(addr: Long): Array[Byte] = {
        val le = new Le().u8(4).u8(2).u8(0).u8(5).u8(8)
        Seq(1L, nl.toLong, ny.toLong, cx.toLong, dataEs.toLong).foreach(le.u64)
        msg2(0x0008, le.u8(2).u64(addr).bytes)
      }
      // v2 B-tree creation parameters (libhdf5's chunk-index defaults;
      // node size is a fixture knob — a small node forces a depth-1
      // tree, a large one widens maxLeafRec past the 1-byte count field)
      val Bt2NodeSize = bt2NodeSize; val Bt2Split = 100; val Bt2Merge = 40
      // spec's chunk-size field width: bytes to encode the max chunk size
      val bt2SzLen: Int =
        (63 - java.lang.Long.numberOfLeadingZeros(
          (nl.toLong * ny * cx * dataEs).max(1L))).toInt / 8 + 1
      def bt2RecSize: Int =
        if (filtered) 8 + bt2SzLen + 4 + 8 * 4 else 8 + 8 * 4
      def layout4Bt2(hdrAddr: Long): Array[Byte] = {
        val le = new Le().u8(4).u8(2).u8(0).u8(5).u8(8)
        Seq(1L, nl.toLong, ny.toLong, cx.toLong, dataEs.toLong).foreach(le.u64)
        le.u8(5).u32(Bt2NodeSize.toLong).u8(Bt2Split).u8(Bt2Merge)
        msg2(0x0008, le.u64(hdrAddr).bytes)
      }
      def header2(
          s: Spec, addr: Long, aux: Long, mask: Int, gcol: Long,
          contAddr: Long = Undef): Array[Byte] = {
        val layout =
          if (!chunkedNames(s.name))
            Seq(layout4Contiguous(addr, s.dims.product * s.es))
          else {
            val one = !unlimitedTime && !implicitIndex &&
              !btreeV2Index && nt == 1 && cx >= nx
            val l =
              if (unlimitedTime) layout4Ea(addr)
              else if (implicitIndex) layout4Implicit(addr)
              else if (btreeV2Index) layout4Bt2(addr)
              else if (one) layout4Single(addr, aux, mask)
              else layout4Fa(addr, aux.toInt)
            if (filtered) Seq(l, filterMsg2) else Seq(l)
          }
        // the unlimited (appendable) axis shows in the dataspace maxdims
        // of time and every tensor that spans it
        val unlim = unlimitedTime && (s.name == "time" || s.dims.size == 4)
        val core = Seq(
          msg2(0x0001, dataspace2(s.dims, unlimFirst = unlim)),
          msg2(0x0003, s.dt)) ++ layout
        val atts = attsFor(s, gcol)
        if (!splitHeaders) ohdr2(core ++ atts)
        else { // attributes ride an OCHK continuation block
          val contLen = ochk(atts).length.toLong
          ohdr2(core :+ msg2(0x0010,
            new Le().u64(contAddr).u64(contLen).bytes))
        }
      }
      // root group: link info + group info + one hard link per dataset —
      // compactly in the header, or (denseLinks) spilled to the fractal
      // heap + name B-tree whose addresses ride the Link Info message
      def rootOhdr(
          addrs: Map[String, Long], frhp: Long = Undef,
          bthd: Long = Undef): Array[Byte] = {
        val linkInfo = msg2(0x0002,
          new Le().u8(0).u8(0).u64(frhp).u64(bthd).bytes)
        val groupInfo = msg2(0x000A, new Le().u8(0).u8(0).bytes)
        val links =
          if (denseLinks) Nil
          else specs.map { s =>
            val nameB = s.name.getBytes("UTF-8")
            msg2(0x0006, new Le().u8(1).u8(0).u8(nameB.length)
              .raw(nameB).u64(addrs(s.name)).bytes)
          }
        ohdr2(linkInfo +: groupInfo +: links)
      }
      // serialized v1 link message BODY — the byte form a dense group
      // stores as a fractal-heap object
      def linkBody(name: String, addr: Long): Array[Byte] = {
        val nb = name.getBytes("UTF-8")
        new Le().u8(1).u8(0).u8(nb.length).raw(nb).u64(addr).bytes
      }

      val raws = specs.map(s => s.name -> rawFor(s)).toMap
      // (addr, nelmts, startIdx) per extensible-array data block
      case class Placed(blobs: Seq[(ChunkBlob, Long)], fahd: Long,
          fadb: Long, pageBits: Int,
          eaDblks: Seq[(Long, Int, Int)] = Nil, eaIblock: Long = Undef,
          eaHdr: Long = Undef,
          bt2Leaf2: Long = Undef, bt2Btin: Long = Undef)
      val eaElmtSize = if (filtered) 16 else 8
      // directly-addressed data-block geometry for the first
      // 2·log2(sbMinPtrs)=4 super blocks: (nelmts, startIdx) in order
      val eaDblkGeom: Seq[(Int, Int)] = {
        var start = EaIbElmts
        for (u <- 0 until 2 * 2; d <- 0 until (1 << (u / 2))) yield {
          val n = EaDbMinElmts << ((u + 1) / 2)
          val g = (n, start); start += n; g
        }
      }
      val eaIblockLen = 4 + 1 + 1 + 8 + EaIbElmts * eaElmtSize +
        (2 * (EaSbMinPtrs - 1)) * 8 +
        (1 + EaMaxBits - 4 /*log2(16)*/ - 2 * 2) * 8 + 4
      val eaHdrLen = 12 + 6 * 8 + 8 + 4
      // ---- lay out: superblock, root OHDR, dataset OHDRs, data ----
      val sbSize = 48L
      val rootAddr = sbSize
      val rootLen = rootOhdr(specs.map(_.name -> 0L).toMap).length
      var cursor = rootAddr + rootLen
      val ohAddrs = specs.map { s =>
        val len = header2(s, 0L, 0L, 0, 0L).length
        val a = cursor; cursor += len; s.name -> a
      }.toMap
      cursor = (cursor + 7) / 8 * 8
      // OCHK continuation blocks (attribute messages) when split
      val ochkAddrs: Map[String, Long] =
        if (!splitHeaders) Map.empty
        else specs.map { s =>
          val len = ochk(attsFor(s, 0L)).length
          val a = cursor; cursor += (len + 7) / 8 * 8; s.name -> a
        }.toMap
      // global heap collection for DIMENSION_LIST references: header (16)
      // + four 24-byte objects (16-byte header + one 8-byte address each)
      val gcolAddr = if (dimList.isDefined) cursor else Undef
      if (dimList.isDefined) cursor += 112
      val contiguousAddrs = specs.filterNot(s => chunkedNames(s.name)).map {
        s =>
          val bytes = s.dims.product * s.es
          val a = cursor; cursor += (bytes + 7) / 8 * 8; s.name -> a
      }.toMap
      val chunkPlaced = specs.filter(s => chunkedNames(s.name)).map { s =>
        val blobs = chunksFor(s, raws(s.name))
        // implicit index: chunks tightly packed at stride chunkBytes —
        // the reader computes addresses arithmetically
        val placed = blobs.map { b =>
          val a = cursor
          cursor += (if (implicitIndex) b.bytes.length.toLong
                     else (b.bytes.length + 7) / 8 * 8)
          (b, a)
        }
        if (implicitIndex) cursor = (cursor + 7) / 8 * 8
        var pb = 4
        while ((1L << pb) < placed.size) pb += 1
        if (unlimitedTime) {
          val n = placed.size
          require(n <= EaIbElmts + eaDblkGeom.map(_._1).sum,
            s"extensible-array fixture writer: $n chunks exceed the " +
              "directly-addressed space")
          val dblks = eaDblkGeom.takeWhile(_._2 < n).map {
            case (nelmts, start) =>
              val len = 4 + 1 + 1 + 8 + 4 + nelmts * eaElmtSize + 4
              val a = cursor; cursor += (len + 7) / 8 * 8
              (a, nelmts, start)
          }
          val ib = cursor; cursor += (eaIblockLen + 7) / 8 * 8
          val hd = cursor; cursor += (eaHdrLen + 7) / 8 * 8
          s.name -> Placed(placed, Undef, Undef, pb, dblks, ib, hd)
        } else {
          val single =
            !btreeV2Index && (implicitIndex || (nt == 1 && cx >= nx))
          val maxLeafRec = (Bt2NodeSize - 10) / bt2RecSize
          val (fahd, fadb, lf2, btin) =
            if (single) (Undef, Undef, Undef, Undef)
            else if (btreeV2Index && placed.size <= maxLeafRec) {
              // depth-0 tree: one BTLF + the BTHD
              val lfLen = 4 + 1 + 1 + placed.size * bt2RecSize + 4
              val lf = cursor; cursor += (lfLen + 7) / 8 * 8
              val hd = cursor; cursor += 40 // BTHD is 38 bytes, 8-aligned
              (hd, lf, Undef, Undef)
            } else if (btreeV2Index) {
              // depth-1 tree: two BTLF leaves under a BTIN root whose one
              // separator record is the median chunk
              require(placed.size <= 2 * maxLeafRec + 1,
                s"btreeV2Index fixture writer: ${placed.size} chunks " +
                  "exceed a depth-1 tree")
              val k1 = placed.size / 2
              val k2 = placed.size - 1 - k1
              val l1 = cursor
              cursor += (4 + 1 + 1 + k1 * bt2RecSize + 4 + 7) / 8 * 8
              val l2 = cursor
              cursor += (4 + 1 + 1 + k2 * bt2RecSize + 4 + 7) / 8 * 8
              val cntW = (63 - java.lang.Long.numberOfLeadingZeros(
                maxLeafRec.toLong)).toInt / 8 + 1
              val ibLen = 4 + 1 + 1 + bt2RecSize + 2 * (8 + cntW) + 4
              val ib = cursor; cursor += (ibLen + 7) / 8 * 8
              val hd = cursor; cursor += 40
              (hd, l1, l2, ib)
            } else {
              val entrySize = if (filtered) 16 else 8
              val dbLen = 4 + 1 + 1 + 8 + placed.size * entrySize + 4
              val db = cursor; cursor += (dbLen + 7) / 8 * 8
              val hd = cursor; cursor += 32 // FAHD is 28 bytes, 8-aligned
              (hd, db, Undef, Undef)
            }
          s.name -> Placed(placed, fahd, fadb, pb,
            bt2Leaf2 = lf2, bt2Btin = btin)
        }
      }.toMap
      // ---- dense link storage: fractal heap + type-5 name B-tree ----
      // libhdf5's dense-link parameters: width 4, starting/row-0-and-1
      // block size 512, max direct 64 KiB, 32-bit heap offsets, 4096-byte
      // managed ceiling -> 7-byte heap IDs (1 + u32 offset + u16 length);
      // FHDB headers are 21 bytes (checksummed-blocks flag set).
      val DenseBlk = 512; val DenseHdr = 21
      // Block geometry (heapOffset, size) in heap-offset order. Classic
      // mode: libhdf5's parameters (width 4, 512-byte rows 0/1, 64 KiB
      // max direct), capped at the two 512-byte direct rows. Indirect-
      // child mode: a shrunken doubling table (width 2, start 512, max
      // direct 1024) whose root row 3 is the first INDIRECT row — blocks
      // 6-9 are the rows of the row-3 entry-0 child indirect block, so
      // any link packed past 4 KiB lands behind an indirect CHILD (the
      // structure the reader's recursive FHIB expansion decodes).
      val denseGeom: Vector[(Long, Int)] =
        if (denseIndirectChild)
          Vector(0L -> 512, 512L -> 512, // root row 0
            1024L -> 512, 1536L -> 512, // root row 1
            2048L -> 1024, 3072L -> 1024, // root row 2 (max direct size)
            4096L -> 512, 4608L -> 512, // child row 0
            5120L -> 512, 5632L -> 512) // child row 1
        else Vector.tabulate(8)(i => (i.toLong * DenseBlk, DenseBlk))
      val denseNames: Seq[(String, Long)] =
        if (!denseLinks) Nil
        else specs.map(s => s.name -> 0L) ++ // oh addrs patched at render
          (0 until denseLinkPad).map(i => f"pad_$i%03d" -> 0L)
      // pack link bodies into blocks, objects never spanning a boundary:
      // (name, blockIdx, offsetInBlock, length)
      val densePack: Seq[(String, Int, Int, Int)] = {
        var blk = 0; var off = DenseHdr
        denseNames.map { case (n, _) =>
          val len = linkBody(n, 0L).length
          if (blk < denseGeom.size && off + len > denseGeom(blk)._2) {
            blk = blk + 1; off = DenseHdr
          }
          require(blk < denseGeom.size,
            "denseLinks fixture writer: links overflow the authored " +
              s"${denseGeom.size}-block geometry")
          val r = (n, blk, off, len); off += len; r
        }
      }
      val denseNBlocks =
        if (densePack.isEmpty) 0 else densePack.map(_._2).max + 1
      require(!denseIndirectChild || denseNBlocks > 6,
        "denseIndirectChild fixture needs enough links to reach the " +
          "child's blocks — raise denseLinkPad")
      val denseBlockAddrs = (0 until denseNBlocks).map { i =>
        val a = cursor; cursor += denseGeom(i)._2; a
      }
      // classic: >1 block -> root indirect block over the (width 4)
      // direct rows; indirect-child: fixed 4-row (width 2) root whose
      // row 3 entry 0 is a 2-row child indirect block
      val denseW = if (denseIndirectChild) 2 else 4
      val denseRows =
        if (denseIndirectChild) 4
        else if (denseNBlocks <= 1) 0
        else (denseNBlocks + 3) / 4
      val denseChildIbAddr =
        if (!denseIndirectChild) Undef
        else { val a = cursor; cursor += (4 + 1 + 8 + 4 + 4 * 8 + 4 + 7) / 8 * 8; a }
      val denseIbAddr =
        if (denseRows == 0) Undef
        else {
          val a = cursor
          cursor += (4 + 1 + 8 + 4 + denseRows * denseW * 8 + 4 + 7) / 8 * 8
          a
        }
      val denseFrhpAddr =
        if (!denseLinks) Undef
        else { val a = cursor; cursor += 152; a } // FRHP is 146, 8-aligned
      // name-index records sorted by hash (the tree's key order)
      val denseRecs: Seq[(Long, (String, Int, Int, Int))] =
        densePack.map(p =>
          (lookup3(p._1.getBytes("UTF-8"), 0, p._1.length), p))
          .sortBy(_._1)
      // node 4096 in indirect-child mode: the ~170 links that geometry
      // needs fit one depth-0 leaf (the heap indirection is the feature
      // under test, not tree depth — depth-1 has its own fixture)
      val DenseBtNode = if (denseIndirectChild) 4096 else 512
      val DenseRecSize = 11 // hash(4) + heapId(7)
      val denseMaxLeaf = (DenseBtNode - 10) / DenseRecSize
      require(denseRecs.size <= 2 * denseMaxLeaf + 1,
        s"denseLinks fixture writer: ${denseRecs.size} links exceed a " +
          "depth-1 name tree")
      val denseDepth1 = denseRecs.size > denseMaxLeaf
      val denseK1 = if (denseDepth1) denseRecs.size / 2 else denseRecs.size
      val denseK2 = if (denseDepth1) denseRecs.size - 1 - denseK1 else 0
      def denseLeafLen(k: Int): Long = (4 + 1 + 1 + k * DenseRecSize + 4 + 7) / 8 * 8
      val denseLf1 =
        if (!denseLinks) Undef
        else { val a = cursor; cursor += denseLeafLen(denseK1); a }
      val denseLf2 =
        if (!denseDepth1) Undef
        else { val a = cursor; cursor += denseLeafLen(denseK2); a }
      val denseBtin =
        if (!denseDepth1) Undef
        else { // 1 separator record + 2 child pointers (1-byte counts)
          val a = cursor
          cursor += (4 + 1 + 1 + DenseRecSize + 2 * (8 + 1) + 4 + 7) / 8 * 8
          a
        }
      val denseBthd =
        if (!denseLinks) Undef
        else { val a = cursor; cursor += 40; a }
      val eof = cursor

      val out = new Le()
      // superblock v3: checksummed prefix
      val sb = new Le().raw(Signature).u8(3).u8(8).u8(8).u8(0)
        .u64(0L).u64(Undef).u64(eof).u64(rootAddr).bytes
      out.raw(sb).u32(lookup3(sb, 0, sb.length))
      out.raw(rootOhdr(ohAddrs, denseFrhpAddr, denseBthd))
      specs.foreach { s =>
        val cont = ochkAddrs.getOrElse(s.name, Undef)
        if (chunkedNames(s.name)) {
          val p = chunkPlaced(s.name)
          if (unlimitedTime) {
            out.raw(header2(s, p.eaHdr, 0L, 0, gcolAddr, cont))
          } else if (p.fahd == Undef) { // single chunk or implicit base
            val (b, a) = p.blobs.head
            out.raw(header2(s, a, b.bytes.length.toLong, 0, gcolAddr, cont))
          } else
            out.raw(header2(s, p.fahd, p.pageBits.toLong, 0, gcolAddr, cont))
        } else {
          out.raw(header2(s, contiguousAddrs(s.name), 0L, 0, gcolAddr, cont))
        }
      }
      out.pad(8)
      if (splitHeaders) specs.foreach { s =>
        out.raw(ochk(attsFor(s, gcolAddr))).pad(8)
      }
      dimList.foreach { order =>
        require(order.size == 4 && order.forall(ohAddrs.contains),
          s"dimList names $order must each name a dataset")
        out.raw("GCOL".getBytes).u8(1).u8(0).u8(0).u8(0).u64(112L)
        order.zipWithIndex.foreach { case (n, i) =>
          out.u16(i + 1).u16(1).u32(0L).u64(8L).u64(ohAddrs(n))
        }
      }
      specs.filterNot(s => chunkedNames(s.name)).foreach { s =>
        out.raw(raws(s.name)).pad(8)
      }
      specs.filter(s => chunkedNames(s.name)).foreach { s =>
        val p = chunkPlaced(s.name)
        if (implicitIndex) {
          p.blobs.foreach { case (b, _) => out.raw(b.bytes) }
          out.pad(8)
        } else p.blobs.foreach { case (b, _) => out.raw(b.bytes).pad(8) }
        if (unlimitedTime) {
          def elem(le: Le, idx: Int): Unit =
            if (idx < p.blobs.size) {
              val (b, a) = p.blobs(idx)
              le.u64(a)
              if (filtered) { le.u32(b.bytes.length.toLong); le.u32(0L) }
            } else {
              le.u64(Undef)
              if (filtered) { le.u32(0L); le.u32(0L) }
            }
          p.eaDblks.foreach { case (addr, nelmts, start) =>
            val db = new Le().raw("EADB".getBytes).u8(0)
              .u8(if (filtered) 1 else 0).u64(p.eaHdr).u32(start.toLong)
            (0 until nelmts).foreach(i => elem(db, start + i))
            val dbB = db.bytes
            out.raw(dbB).u32(lookup3(dbB, 0, dbB.length)).pad(8)
          }
          val ib = new Le().raw("EAIB".getBytes).u8(0)
            .u8(if (filtered) 1 else 0).u64(p.eaHdr)
          (0 until EaIbElmts).foreach(i => elem(ib, i))
          (0 until 2 * (EaSbMinPtrs - 1)).foreach { i =>
            ib.u64(if (i < p.eaDblks.size) p.eaDblks(i)._1 else Undef)
          }
          (0 until (1 + EaMaxBits - 4 - 2 * 2)).foreach(_ => ib.u64(Undef))
          val ibB = ib.bytes
          out.raw(ibB).u32(lookup3(ibB, 0, ibB.length)).pad(8)
          val totalDblkBytes =
            p.eaDblks.map(d => 4 + 1 + 1 + 8 + 4 + d._2 * eaElmtSize + 4)
              .sum.toLong
          val hd = new Le().raw("EAHD".getBytes).u8(0)
            .u8(if (filtered) 1 else 0)
            .u8(eaElmtSize).u8(EaMaxBits).u8(EaIbElmts).u8(EaDbMinElmts)
            .u8(EaSbMinPtrs).u8(EaPageBits)
            .u64(0L).u64(0L) // secondary blocks: none
            .u64(p.eaDblks.size.toLong).u64(totalDblkBytes)
            .u64(p.blobs.size.toLong).u64(p.blobs.size.toLong)
            .u64(p.eaIblock)
          val hdB = hd.bytes
          out.raw(hdB).u32(lookup3(hdB, 0, hdB.length)).pad(8)
        } else if (btreeV2Index && p.fahd != Undef) {
          val btType = if (filtered) 11 else 10
          // one record: chunk address [+ size/mask if filtered] + scaled
          // offsets (element offsets / chunk dims, rank entries) — records
          // stay in scaled-offset order = the blobs' own t-major, x-minor
          // generation order
          def rec(le: Le, ba: (ChunkBlob, Long)): Unit = {
            val (b, a) = ba
            le.u64(a)
            if (filtered) {
              val sz = b.bytes.length.toLong
              (0 until bt2SzLen).foreach(i =>
                le.u8(((sz >> (8 * i)) & 0xFF).toInt))
              le.u32(0L) // filter mask: all filters applied
            }
            Seq(b.offs(0) / 1, b.offs(1) / nl, b.offs(2) / ny,
              b.offs(3) / cx).foreach(le.u64)
          }
          def leafOut(blobs: Seq[(ChunkBlob, Long)]): Unit = {
            val lf = new Le().raw("BTLF".getBytes).u8(0).u8(btType)
            blobs.foreach(b => rec(lf, b))
            val lfB = lf.bytes
            out.raw(lfB).u32(lookup3(lfB, 0, lfB.length)).pad(8)
          }
          val depth1 = p.bt2Btin != Undef
          val k1 = p.blobs.size / 2
          if (!depth1) leafOut(p.blobs)
          else { // two leaves under a BTIN root; the median record moves up
            val cntW = (63 - java.lang.Long.numberOfLeadingZeros(
              ((Bt2NodeSize - 10) / bt2RecSize).toLong)).toInt / 8 + 1
            leafOut(p.blobs.take(k1))
            leafOut(p.blobs.drop(k1 + 1))
            val ib = new Le().raw("BTIN".getBytes).u8(0).u8(btType)
            rec(ib, p.blobs(k1))
            def ptr(addr: Long, n: Int): Unit = {
              ib.u64(addr)
              (0 until cntW).foreach(i => ib.u8((n >> (8 * i)) & 0xFF))
            }
            ptr(p.fadb, k1)
            ptr(p.bt2Leaf2, p.blobs.size - 1 - k1)
            val ibB = ib.bytes
            out.raw(ibB).u32(lookup3(ibB, 0, ibB.length)).pad(8)
          }
          val hd = new Le().raw("BTHD".getBytes).u8(0).u8(btType)
            .u32(Bt2NodeSize.toLong).u16(bt2RecSize)
            .u16(if (depth1) 1 else 0)
            .u8(Bt2Split).u8(Bt2Merge)
            .u64(if (depth1) p.bt2Btin else p.fadb)
            .u16(if (depth1) 1 else p.blobs.size)
            .u64(p.blobs.size.toLong)
          val hdB = hd.bytes
          out.raw(hdB).u32(lookup3(hdB, 0, hdB.length)).pad(8)
        } else if (p.fahd != Undef) {
          val entrySize = if (filtered) 16 else 8
          val db = new Le().raw("FADB".getBytes).u8(0)
            .u8(if (filtered) 1 else 0).u64(p.fahd)
          p.blobs.foreach { case (b, a) =>
            db.u64(a)
            if (filtered) { db.u32(b.bytes.length.toLong); db.u32(0L) }
          }
          val dbB = db.bytes
          out.raw(dbB).u32(lookup3(dbB, 0, dbB.length)).pad(8)
          val hd = new Le().raw("FAHD".getBytes).u8(0)
            .u8(if (filtered) 1 else 0).u8(entrySize).u8(p.pageBits)
            .u64(p.blobs.size.toLong).u64(p.fadb)
          val hdB = hd.bytes
          out.raw(hdB).u32(lookup3(hdB, 0, hdB.length)).pad(8)
        }
      }
      if (denseLinks) {
        // ---- FHDB direct blocks: packed link bodies, whole-block
        // checksum with the stored field zeroed (the spec serialization)
        val linkAddr = denseNames.map { case (n, _) =>
          n -> (if (n.startsWith("pad_")) ohAddrs("time") else ohAddrs(n))
        }.toMap
        for (b <- 0 until denseNBlocks) {
          val (gOff, gSz) = denseGeom(b)
          val blkBytes = new Array[Byte](gSz)
          val hdr = new Le().raw("FHDB".getBytes).u8(0).u64(denseFrhpAddr)
            .u32(gOff).u32(0L).bytes // checksum zeroed
          System.arraycopy(hdr, 0, blkBytes, 0, DenseHdr)
          densePack.filter(_._2 == b).foreach { case (n, _, off, len) =>
            val body = linkBody(n, linkAddr(n))
            require(body.length == len, "dense link body length drift")
            System.arraycopy(body, 0, blkBytes, off, len)
          }
          val ck = lookup3(blkBytes, 0, gSz)
          val le = new Le().u32(ck)
          System.arraycopy(le.bytes, 0, blkBytes, DenseHdr - 4, 4)
          out.raw(blkBytes)
        }
        if (denseIndirectChild) { // row-3 entry-0 child: 2 rows x width 2
          val ib = new Le().raw("FHIB".getBytes).u8(0).u64(denseFrhpAddr)
            .u32(4096L) // the child's own heap offset
          (0 until 4).foreach(i =>
            ib.u64(if (6 + i < denseNBlocks) denseBlockAddrs(6 + i) else Undef))
          val ibB = ib.bytes
          require(out.size == denseChildIbAddr, "dense child FHIB drift")
          out.raw(ibB).u32(lookup3(ibB, 0, ibB.length)).pad(8)
        }
        if (denseRows > 0) { // root indirect block
          val ib = new Le().raw("FHIB".getBytes).u8(0).u64(denseFrhpAddr)
            .u32(0L) // block offset (4-byte heap offsets)
          if (denseIndirectChild) {
            // rows 0-2 direct (6 entries), row 3 = [child, Undef]
            (0 until 6).foreach(i =>
              ib.u64(if (i < denseNBlocks) denseBlockAddrs(i) else Undef))
            ib.u64(denseChildIbAddr).u64(Undef)
          } else
            (0 until denseRows * 4).foreach(i =>
              ib.u64(if (i < denseNBlocks) denseBlockAddrs(i) else Undef))
          val ibB = ib.bytes
          out.raw(ibB).u32(lookup3(ibB, 0, ibB.length)).pad(8)
        }
        // FRHP header: libhdf5's dense-link creation parameters (classic)
        // or the shrunken doubling table (indirect-child mode)
        val totalObj = densePack.map(_._4.toLong).sum
        val denseManaged =
          denseGeom.take(denseNBlocks).map(_._2.toLong).sum
        val frhp = new Le().raw("FRHP".getBytes).u8(0)
          .u16(7) // heap ID length = 1 + 4 (offset) + 2 (length)
          .u16(0) // no I/O filters
          .u8(0x02) // checksummed direct blocks
          .u32(4096L) // max managed object size
          .u64(0L).u64(Undef) // next huge id, huge B-tree
          .u64(denseManaged - denseNBlocks.toLong * DenseHdr - totalObj)
          .u64(Undef) // free space, free-space manager
          .u64(denseManaged) // managed space
          .u64(denseManaged) // allocated managed space
          .u64(denseManaged) // iterator offset
          .u64(denseNames.size.toLong) // managed objects
          .u64(0L).u64(0L).u64(0L).u64(0L) // huge/tiny sizes + counts
          .u16(denseW) // table width
          .u64(DenseBlk.toLong) // starting block size
          .u64(if (denseIndirectChild) 1024L else 65536L) // max direct size
          .u16(32) // max heap size (bits)
          .u16(1) // starting rows in root indirect block
          .u64(if (denseRows > 0) denseIbAddr else denseBlockAddrs.head)
          .u16(denseRows)
        val frhpB = frhp.bytes
        out.raw(frhpB).u32(lookup3(frhpB, 0, frhpB.length)).pad(8)
        // ---- type-5 name-index v2 B-tree: {hash, heap ID} records
        def heapId(p: (String, Int, Int, Int)): Le => Le = le =>
          le.u8(0).u32(denseGeom(p._2)._1 + p._3).u16(p._4)
        def denseLeaf(addr: Long,
            recs: Seq[(Long, (String, Int, Int, Int))]): Unit = {
          val lf = new Le().raw("BTLF".getBytes).u8(0).u8(5)
          recs.foreach { case (hash, p) => heapId(p)(lf.u32(hash)) }
          val lfB = lf.bytes
          require(out.size == addr, "dense leaf layout drift")
          out.raw(lfB).u32(lookup3(lfB, 0, lfB.length)).pad(8)
        }
        denseLeaf(denseLf1, denseRecs.take(denseK1))
        if (denseDepth1) {
          denseLeaf(denseLf2, denseRecs.drop(denseK1 + 1))
          val sep = denseRecs(denseK1)
          val ib = new Le().raw("BTIN".getBytes).u8(0).u8(5)
          heapId(sep._2)(ib.u32(sep._1))
          ib.u64(denseLf1).u8(denseK1) // child pointer: addr + 1-byte count
          ib.u64(denseLf2).u8(denseK2)
          val ibB = ib.bytes
          out.raw(ibB).u32(lookup3(ibB, 0, ibB.length)).pad(8)
        }
        val hd = new Le().raw("BTHD".getBytes).u8(0).u8(5)
          .u32(DenseBtNode.toLong).u16(DenseRecSize)
          .u16(if (denseDepth1) 1 else 0)
          .u8(100).u8(40) // split/merge percents
          .u64(if (denseDepth1) denseBtin else denseLf1)
          .u16(if (denseDepth1) 1 else denseRecs.size)
          .u64(denseRecs.size.toLong)
        val hdB = hd.bytes
        out.raw(hdB).u32(lookup3(hdB, 0, hdB.length)).pad(8)
      }
      require(out.size.toLong == eof,
        s"latest-format writer layout drift: ${out.size} != $eof")
      val fos = new java.io.FileOutputStream(path)
      try fos.write(out.bytes) finally fos.close()
      return
    }

    // ---- messages ----
    def layoutMsg(addr: Long, size: Long): Array[Byte] =
      message(0x0008, new Le().u8(3).u8(1).u64(addr).u64(size).bytes)
    def chunkedLayoutMsg(btreeAddr: Long): Array[Byte] = {
      val le = new Le().u8(3).u8(2).u8(5).u64(btreeAddr)
      Seq(1, nl, ny, cx, dataEs).foreach(d => le.u32(d.toLong))
      message(0x0008, le.bytes)
    }
    def filterMsg: Array[Byte] = {
      val le = new Le().u8(1).u8(filters.size).u16(0).u32(0)
      filters.foreach { id =>
        val cd: Seq[Long] = id match {
          case 1 => Seq(6L) // deflate level
          case 2 => Seq(dataEs.toLong) // shuffle element size
          case _ => Nil
        }
        le.u16(id).u16(0).u16(0).u16(cd.size)
        cd.foreach(le.u32)
        if (cd.size % 2 == 1) le.u32(0) // pad to 8
      }
      message(0x000B, le.bytes)
    }
    def header(s: Spec, addr: Long, size: Long): Array[Byte] = {
      val layout =
        if (chunkedNames(s.name))
          Seq(chunkedLayoutMsg(addr)) ++
            (if (filters.nonEmpty) Seq(filterMsg) else Nil)
        else Seq(layoutMsg(addr, size))
      objectHeader(Seq(
        message(0x0001, dataspace(s.dims)),
        message(0x0003, s.dt)) ++ layout ++ s.extraAtts)
    }
    def btreeNode(entries: Seq[(ChunkBlob, Long)]): Array[Byte] = {
      val le = new Le().raw("TREE".getBytes).u8(1).u8(0).u16(entries.size)
        .u64(Undef).u64(Undef)
      entries.foreach { case (b, addr) =>
        le.u32(b.bytes.length.toLong).u32(0L) // size, filter mask
        b.offs.foreach(le.u64)
        le.u64(addr)
      }
      // final key: offsets just past the addressed region
      le.u32(0L).u32(0L)
      Seq(nt.toLong, nl.toLong, ny.toLong, nx.toLong, 0L).foreach(le.u64)
      le.bytes
    }

    // ---- lay out the file ----
    val sbSize = 96L
    val rootOhAddr = sbSize
    val rootOh = objectHeader(Seq(
      message(0x0011, new Le().u64(0L).u64(0L).bytes))) // patched below
    val heapAddr = rootOhAddr + rootOh.length
    // heap data: offset 0 reserved (empty string), then 8-aligned names
    val heapData = new Le().u8(0).pad(8)
    val nameOffsets = specs.map(_.name).sorted.map { n =>
      val off = heapData.size.toLong
      heapData.raw(n.getBytes("UTF-8") :+ 0.toByte).pad(8)
      n -> off
    }.toMap
    val heapDataAddr = heapAddr + 32L
    val btreeAddr = heapDataAddr + heapData.size
    val btreeSize = 24L + 24L // one child: key0, child0, key1
    val snodAddr = btreeAddr + btreeSize
    val snodSize = 8L + specs.size * 40L
    var cursor = snodAddr + snodSize
    val ohAddrs = specs.map { s =>
      val len = header(s, 0L, 0L).length // layout bodies are fixed-size
      val a = cursor; cursor += len; s.name -> a
    }.toMap
    cursor = (cursor + 7) / 8 * 8
    val raws = specs.map(s => s.name -> rawFor(s)).toMap
    // contiguous vars: one data segment; chunked vars: blobs then B-tree
    val contiguousAddrs = specs.filterNot(s => chunkedNames(s.name)).map { s =>
      val bytes = s.dims.product * s.es
      val a = cursor; cursor += (bytes + 7) / 8 * 8; s.name -> (a, bytes)
    }.toMap
    val chunkPlacement = specs.filter(s => chunkedNames(s.name)).map { s =>
      val blobs = chunksFor(s, raws(s.name))
      val placed = blobs.map { b =>
        val a = cursor
        cursor += (b.bytes.length + 7) / 8 * 8
        (b, a)
      }
      val bt = cursor
      cursor += btreeNode(placed).length
      cursor = (cursor + 7) / 8 * 8
      s.name -> (placed, bt)
    }.toMap
    val eof = cursor

    val out = new Le()
    // superblock v0
    out.raw(Signature).u8(0).u8(0).u8(0).u8(0).u8(0).u8(8).u8(8).u8(0)
      .u16(4).u16(16).u32(0)
      .u64(0L).u64(Undef).u64(eof).u64(Undef)
      // root symbol table entry: name offset 0, cached btree+heap
      .u64(0L).u64(rootOhAddr).u32(1).u32(0).u64(btreeAddr).u64(heapAddr)
    // root object header with the real symbol-table message
    out.raw(objectHeader(Seq(
      message(0x0011, new Le().u64(btreeAddr).u64(heapAddr).bytes))))
    // local heap
    out.raw("HEAP".getBytes).u8(0).u8(0).u8(0).u8(0)
      .u64(heapData.size.toLong).u64(1L).u64(heapDataAddr)
    out.raw(heapData.bytes)
    // B-tree: one leaf child (the SNOD)
    val sortedNames = specs.map(_.name).sorted
    out.raw("TREE".getBytes).u8(0).u8(0).u16(1).u64(Undef).u64(Undef)
      .u64(nameOffsets(sortedNames.head)).u64(snodAddr)
      .u64(nameOffsets(sortedNames.last))
    // SNOD: entries sorted by link name
    out.raw("SNOD".getBytes).u8(1).u8(0).u16(specs.size)
    sortedNames.foreach { n =>
      out.u64(nameOffsets(n)).u64(ohAddrs(n)).u32(0).u32(0)
        .u64(0L).u64(0L) // scratch
    }
    // dataset object headers with final data / B-tree addresses
    specs.foreach { s =>
      if (chunkedNames(s.name)) out.raw(header(s, chunkPlacement(s.name)._2, 0L))
      else {
        val (addr, bytes) = contiguousAddrs(s.name)
        out.raw(header(s, addr, bytes))
      }
    }
    out.pad(8)
    // data segments / chunk blobs / chunk B-trees, in placement order
    specs.filterNot(s => chunkedNames(s.name)).foreach { s =>
      out.raw(raws(s.name)).pad(8)
    }
    specs.filter(s => chunkedNames(s.name)).foreach { s =>
      val (placed, _) = chunkPlacement(s.name)
      placed.foreach { case (b, _) => out.raw(b.bytes).pad(8) }
      out.raw(btreeNode(placed)).pad(8)
    }
    require(out.size.toLong == eof, s"writer layout drift: ${out.size} != $eof")

    val fos = new java.io.FileOutputStream(path)
    try fos.write(out.bytes) finally fos.close()
  }
}
