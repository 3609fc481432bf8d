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
  *  - superblock version 0 at offset 0 (libhdf5's default write format),
  *    8-byte offsets/lengths;
  *  - the root group via its v1 B-tree + SNOD symbol nodes + local heap
  *    (the "compact-ish" group storage every default-written netCDF-4
  *    file uses);
  *  - version-1 object headers incl. continuation blocks;
  *  - dataspace v1/v2, datatype classes 0 (fixed-point) and 1 (IEEE
  *    float) in either byte order (class 3 strings inside attributes);
  *  - data layout v3: class 1 (contiguous), class 0 (compact), AND
  *    class 2 (chunked — what unlimited-dim or compressed netCDF-4
  *    variables use): v1 chunk B-trees (node type 1, interior levels
  *    recursed), per-chunk filter masks, full-size zero-padded edge
  *    chunks, hyperslab reads that fetch only intersecting chunks;
  *  - filter pipelines v1/v2: deflate (JDK Inflater), shuffle
  *    (byte-plane transpose), fletcher32 (verified with HDF5's
  *    H5_checksum_fletcher32 algorithm, corrupt chunks fail loudly) —
  *    i.e. netCDF4's default shuffle+deflate compression decodes;
  *  - attribute messages v1/v2/v3 (CF `units` on time, `_FillValue`).
  * Rejected LOUDLY, never misread: superblock v1+ ("latest format"
  * files), v2 object headers (`OHDR`), other filters (szip/nbit/
  * scaleoffset), non-atomic data types. The error text names the
  * feature so the user knows what to re-save without.
  *
  * The grid view mirrors [[NetcdfClassic]]: datasets named
  * `time`/`leadtime`/`yc`/`xc` + `sic_mean`/`sic_stddev` (legacy
  * `mean`/`stddev`), dims `(time, leadtime, yc, xc)` validated by SHAPE
  * against the coordinate lengths (HDF5 stores dim identity in
  * DIMENSION_LIST vlen references — out of scope; an actually-transposed
  * tensor with coincidentally matching axis lengths is undetectable here
  * and documented as such). One `readGridSlice` fetches the axis vectors
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

  /** Data layout v3, all three storage classes. `Chunked.dims` carries the
    * layout message's rank+1 chunk dimensions (the trailing entry is the
    * element size, per spec); `filters` is the write-order pipeline.
    */
  private[sources] sealed trait Layout
  private[sources] case class Compact(data: Array[Byte]) extends Layout
  private[sources] case class Contiguous(addr: Long, size: Long) extends Layout
  private[sources] case class Chunked(
      btree: Long, dims: Vector[Long],
      filters: Vector[(Int, Vector[Int])]) extends Layout

  private[sources] case class Dataset(
      name: String, dims: Vector[Long], dtype: Dtype,
      layout: Layout, atts: Map[String, Any])

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

  // ------------------------------------------------------------- superblock

  /** Parses superblock v0 and returns the root group's object header
    * address plus the cached (btree, heap) pair from its symbol table
    * entry scratch space.
    */
  private def readSuperblock(r: Reader): (Long, Long, Long) = {
    val bb = r.fetch(0L, 96)
    val sig = new Array[Byte](8); bb.get(sig)
    require(sig.sameElements(Signature), "not an HDF5 file (bad signature)")
    val sbVersion = bb.get().toInt
    require(sbVersion == 0,
      s"HDF5 superblock version $sbVersion unsupported (v0 only — " +
        "'latest format' files need an external codec)")
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
  }

  // --------------------------------------------------------- object headers

  /** One raw header message: (type, body). Continuations are followed;
    * bodies keep little-endian order.
    */
  private def readMessages(r: Reader, addr: Long): Vector[(Int, ByteBuffer)] = {
    val head = r.fetch(addr, 16)
    val version = head.get().toInt
    require(version == 1,
      s"HDF5 object header version $version unsupported (v1 only — " +
        "'OHDR' v2 headers need an external codec)")
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

  /** Layout v3: compact inline bytes, contiguous (addr, size), or chunked
    * (v1 B-tree address + rank+1 chunk dims, elem size last). Filters are
    * attached by the caller from the separate pipeline message.
    */
  private def parseLayout(bb: ByteBuffer): Layout = {
    val b = bb.duplicate().order(ByteOrder.LITTLE_ENDIAN)
    val version = b.get().toInt
    require(version == 3,
      s"HDF5 data layout version $version unsupported (v3 only)")
    b.get().toInt match {
      case 0 => // compact: size(2) + data
        val n = b.getShort().toInt & 0xFFFF
        val data = new Array[Byte](n)
        b.get(data)
        Compact(data)
      case 1 => // contiguous
        Contiguous(b.getLong(), b.getLong())
      case 2 => // chunked: dimensionality(1), btree addr(8), dims (4 each)
        val ndims = b.get().toInt & 0xFF
        val btree = b.getLong()
        val dims = Vector.fill(ndims)(b.getInt().toLong & 0xFFFFFFFFL)
        Chunked(btree, dims, Vector.empty)
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
  private def parseAttribute(bb: ByteBuffer): (String, Option[Any]) = {
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
    val atts: Map[String, Any] = msgs.filter(_._1 == 0x000C)
      .flatMap { m =>
        val (n, v) = parseAttribute(m._2)
        v.map(x => (n, x)).toSeq
      }.toMap
    Dataset(name, dims, dtype, layout, atts)
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
  private def chunkEntries(
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
    for (e <- chunkEntries(r, ch.btree, ch.dims.size)) {
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
  private def listRoot(r: Reader): Map[String, Long] = {
    val (rootOh, cachedBtree, cachedHeap) = readSuperblock(r)
    val (btree, heap) =
      if (cachedBtree != Undef) (cachedBtree, cachedHeap)
      else {
        val msgs = readMessages(r, rootOh)
        val st = msgs.find(_._1 == 0x0011).getOrElse(
          throw new IllegalArgumentException(
            "HDF5 root group has no symbol table (new-style groups " +
              "need an external codec)"))._2.duplicate()
          .order(ByteOrder.LITTLE_ENDIAN)
        (st.getLong(), st.getLong())
      }
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
  def write(
      path: String, timesMicros: Array[Long], leadtimes: Array[Int],
      yc: Array[Double], xc: Array[Double],
      mean: Array[Double], stddev: Array[Double],
      floatData: Boolean = false, fillValue: Option[Double] = None,
      bookkeepingAttrs: Boolean = false,
      chunkX: Option[Int] = None, filters: Seq[Int] = Nil): Unit = {
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
      if (chunkX.isDefined || filters.nonEmpty) Set("sic_mean", "sic_stddev")
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
