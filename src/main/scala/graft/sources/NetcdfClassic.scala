package graft.sources

import java.nio.ByteBuffer

/** Pure-JVM decoder for NetCDF classic (CDF-1 / CDF-2, a.k.a. NetCDF-3) —
  * closing SURVEY.md S2: the reference's real input is NetCDF opened with
  * `xarray.open_dataset` (processor.py:121-124), and NetCDF classic is a
  * small, fully public big-endian format (magic `CDF\x01`/`CDF\x02`, then
  * dim/attr/var header records, then contiguous fixed-var data and
  * interleaved record-var data). No library is needed: every offset is
  * closed-form from the header, so the source keeps the exact positioned
  * ranged-read access pattern of the `.grid` codec ([[GridFile.readSlice]]).
  *
  * Scope: the format features the IceNet-shaped tensors use —
  *  - dims `(time, leadtime, yc, xc)`, `time` either fixed or the UNLIMITED
  *    record dimension (both occur in the wild; xarray writes either),
  *  - coordinate variables of any numeric type, with CF `units` on `time`
  *    (`"<unit> since <epoch>"`) handled for days/hours/minutes/seconds/
  *    milli/microseconds; absent units = values already in epoch micros,
  *  - data variables `sic_mean`/`sic_stddev` (or the legacy `mean`/`stddev`
  *    spelling, processor.py:126-133) as NC_FLOAT or NC_DOUBLE over
  *    `time x leadtime x yc x xc`, with `_FillValue` and NaN both mapping
  *    to SQL NULL downstream (xarray's masked-cell semantics).
  * Not in scope (fails loudly, never misreads): NetCDF-4/HDF5 containers,
  * transposed data-variable dim orders, CHAR-typed coordinates.
  *
  * Scale notes: [[readGridHeader]] reads only the header region;
  * [[readGridSlice]] reads the axis vectors plus exactly ONE
  * `(leadtime, yc, xc)` slab per requested variable via positioned reads
  * (ranged GETs on object stores) — identical I/O discipline to the `.grid`
  * path, so the one-partition-per-(file, time-slice) planning carries over.
  */
object NetcdfClassic {

  /** Data bytes fetched since JVM start (same amplification guard as
    * [[GridFile.bytesRead]]): tests assert one-slice reads don't scan files.
    */
  val bytesRead = new java.util.concurrent.atomic.AtomicLong(0)

  // nc_type tags (public spec)
  private val NcByte = 1
  private val NcChar = 2
  private val NcShort = 3
  private val NcInt = 4
  private val NcFloat = 5
  private val NcDouble = 6

  private def elemSize(t: Int): Int = t match {
    case NcByte | NcChar => 1
    case NcShort => 2
    case NcInt | NcFloat => 4
    case NcDouble => 8
    case other => throw new IllegalArgumentException(s"unknown nc_type $other")
  }

  private[sources] case class NcDim(name: String, length: Int) {
    def isRecord: Boolean = length == 0
  }

  /** Attribute values: NC_CHAR -> String, numeric -> Vector[Double]. */
  private[sources] case class NcVar(
      name: String, dimIds: Vector[Int], atts: Map[String, Any],
      ncType: Int, begin: Long) {
    def att(n: String): Option[Any] = atts.get(n)
  }

  private[sources] case class NcHeader(
      version: Int, numRecs: Int, dims: Vector[NcDim],
      gatts: Map[String, Any], vars: Vector[NcVar]) {

    def dim(name: String): NcDim =
      dims.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(
          s"NetCDF file lacks dimension '$name' (has ${dims.map(_.name)})"))

    def dimId(name: String): Int = {
      val i = dims.indexWhere(_.name == name)
      require(i >= 0, s"NetCDF file lacks dimension '$name'")
      i
    }

    def variable(names: String*): NcVar =
      vars.find(v => names.contains(v.name)).getOrElse(
        throw new IllegalArgumentException(
          s"NetCDF file lacks variable ${names.mkString("/")} " +
            s"(has ${vars.map(_.name)})"))

    def isRecordVar(v: NcVar): Boolean =
      v.dimIds.headOption.exists(dims(_).isRecord)

    /** Dimension length as seen by data (record dim -> numRecs). */
    def dimLen(id: Int): Int = {
      val d = dims(id)
      if (d.isRecord) numRecs else d.length
    }

    /** Bytes of ONE record of a record variable (product of non-record
      * dims x element size), padded to 4 per the spec.
      */
    private def recordBytes(v: NcVar, padded: Boolean): Long = {
      val raw = v.dimIds.drop(1).map(dims(_).length.toLong).product
        .max(1L) * elemSize(v.ncType)
      if (padded) (raw + 3) / 4 * 4 else raw
    }

    /** Stride between consecutive records: the sum of every record var's
      * padded one-record size — EXCEPT when only one record variable
      * exists, where the spec permits an unpadded stride.
      */
    lazy val recSize: Long = {
      val recVars = vars.filter(isRecordVar)
      if (recVars.size == 1) recordBytes(recVars.head, padded = false)
      else recVars.map(recordBytes(_, padded = true)).sum
    }
  }

  // ---------------------------------------------------------------- header

  /** Parses the header region. The header length isn't recorded anywhere,
    * so read a prefix and retry larger on underflow (headers here are a few
    * hundred bytes; 16 MB is the give-up bound).
    */
  private[sources] def readNcHeader(path: String): NcHeader = {
    val sizes = Seq(8 * 1024, 64 * 1024, 1024 * 1024, 16 * 1024 * 1024)
    val in = openHadoop(path)
    try {
      val fileLen = in._2
      sizes.foreach { n =>
        val take = math.min(n.toLong, fileLen).toInt
        val buf = new Array[Byte](take)
        in._1.readFully(0L, buf)
        bytesRead.addAndGet(take.toLong)
        try return parseHeader(ByteBuffer.wrap(buf))
        catch {
          case _: java.nio.BufferUnderflowException if take < fileLen => () // retry bigger
        }
      }
      throw new IllegalArgumentException(s"$path: NetCDF header exceeds 16 MB")
    } finally in._1.close()
  }

  private def parseHeader(bb: ByteBuffer): NcHeader = {
    require(bb.get() == 'C' && bb.get() == 'D' && bb.get() == 'F',
      "not a NetCDF classic file (bad magic)")
    val version = bb.get().toInt
    require(version == 1 || version == 2,
      s"unsupported NetCDF variant $version (CDF-1/CDF-2 only; " +
        "NetCDF-4/HDF5 needs an external codec)")
    val numRecs = bb.getInt() // STREAMING (-1) not supported; treat as count
    val dims = readTaggedList(bb, 0x0A).map { _ =>
      NcDim(readName(bb), bb.getInt())
    }
    val gatts = readAttMap(bb)
    val vars = readTaggedList(bb, 0x0B).map { _ =>
      val name = readName(bb)
      val nd = bb.getInt()
      val dimIds = Vector.fill(nd)(bb.getInt())
      val atts = readAttMap(bb)
      val ncType = bb.getInt()
      bb.getInt() // vsize: recomputed from dims (spec notes it can overflow)
      val begin = if (version == 1) bb.getInt().toLong & 0xFFFFFFFFL else bb.getLong()
      NcVar(name, dimIds, atts, ncType, begin)
    }
    NcHeader(version, numRecs, dims, gatts, vars)
  }

  /** `ABSENT` (two zero ints) or `tag nelems`; returns a unit range to map
    * over so element parsing stays at the call site.
    */
  private def readTaggedList(bb: ByteBuffer, tag: Int): Vector[Unit] = {
    val t = bb.getInt()
    val n = bb.getInt()
    require(t == tag || (t == 0 && n == 0),
      s"malformed NetCDF header: expected tag $tag or ABSENT, got $t")
    Vector.fill(n)(())
  }

  private def readName(bb: ByteBuffer): String = {
    val n = bb.getInt()
    val bytes = new Array[Byte](n)
    bb.get(bytes)
    skipPad(bb, n)
    new String(bytes, "UTF-8")
  }

  private def readAttMap(bb: ByteBuffer): Map[String, Any] =
    readTaggedList(bb, 0x0C).map { _ =>
      val name = readName(bb)
      val t = bb.getInt()
      val n = bb.getInt()
      val value: Any = t match {
        case NcChar =>
          val bytes = new Array[Byte](n)
          bb.get(bytes)
          skipPad(bb, n)
          new String(bytes, "UTF-8")
        case _ =>
          val vs = Vector.fill(n)(readNumeric(bb, t))
          skipPad(bb, n * elemSize(t))
          vs
      }
      name -> value
    }.toMap

  private def readNumeric(bb: ByteBuffer, t: Int): Double = t match {
    case NcByte => bb.get().toDouble
    case NcShort => bb.getShort().toDouble
    case NcInt => bb.getInt().toDouble
    case NcFloat => bb.getFloat().toDouble
    case NcDouble => bb.getDouble()
    case NcChar => throw new IllegalArgumentException("CHAR is not numeric")
  }

  private def skipPad(bb: ByteBuffer, n: Int): Unit = {
    var pad = (4 - n % 4) % 4
    while (pad > 0) { bb.get(); pad -= 1 }
  }

  // ------------------------------------------------------------- grid view

  /** Accepted spellings per axis/variable (legacy rename shim,
    * processor.py:126-133, handled at decode here since the DSv2 schema is
    * fixed long-form).
    */
  private val TimeNames = Seq("time")
  private val LeadNames = Seq("leadtime")
  private val YNames = Seq("yc")
  private val XNames = Seq("xc")
  private val MeanNames = Seq("sic_mean", "mean")
  private val StddevNames = Seq("sic_stddev", "stddev")

  def readGridHeader(path: String): GridFile.Header = {
    val h = readNcHeader(path)
    GridFile.Header(
      h.dimLen(h.dimId("time")), h.dim("leadtime").length,
      h.dim("yc").length, h.dim("xc").length)
  }

  /** One time-slice in [[GridFile.GridSlice]] form, so the DSv2 reader is
    * codec-agnostic. Reads: time scalar (one element), full axis vectors
    * (small by contract), one slab per requested data variable.
    */
  def readGridSlice(
      path: String, timeIdx: Int,
      needMean: Boolean, needStddev: Boolean): GridFile.GridSlice = {
    val h = readNcHeader(path)
    val nt = h.dimLen(h.dimId("time"))
    require(timeIdx >= 0 && timeIdx < nt, s"$path: time slice $timeIdx not in [0,$nt)")
    val nl = h.dim("leadtime").length
    val ny = h.dim("yc").length
    val nx = h.dim("xc").length
    val in = openHadoop(path)
    try {
      val stream = in._1
      def fetch(off: Long, n: Int): ByteBuffer = {
        val buf = new Array[Byte](n)
        stream.readFully(off, buf)
        bytesRead.addAndGet(n.toLong)
        ByteBuffer.wrap(buf)
      }
      def elemOffset(v: NcVar, idx: Long): Long =
        if (h.isRecordVar(v)) v.begin + idx * h.recSize
        else v.begin + idx * elemSize(v.ncType)
      def readVector(v: NcVar, n: Int): Array[Double] = {
        require(!h.isRecordVar(v), s"coordinate ${v.name} on the record dim unsupported")
        val bb = fetch(v.begin, n * elemSize(v.ncType))
        Array.fill(n)(readNumeric(bb, v.ncType))
      }
      // time: one element, CF units applied
      val timeVar = h.variable(TimeNames: _*)
      val rawTime = readNumeric(
        fetch(elemOffset(timeVar, timeIdx.toLong), elemSize(timeVar.ncType)),
        timeVar.ncType)
      val timeMicros = toEpochMicros(rawTime, timeVar.att("units"))
      val leads = readVector(h.variable(LeadNames: _*), nl).map(_.toInt)
      val yc = readVector(h.variable(YNames: _*), ny)
      val xc = readVector(h.variable(XNames: _*), nx)
      val sliceVals = nl * ny * nx
      def slab(names: Seq[String]): Array[Double] = {
        val v = h.variable(names: _*)
        val expect = Vector("time", "leadtime", "yc", "xc").map(h.dimId)
        require(v.dimIds == expect,
          s"${v.name} dims ${v.dimIds} != (time, leadtime, yc, xc) $expect; " +
            "transposed layouts unsupported")
        val es = elemSize(v.ncType)
        val off =
          if (h.isRecordVar(v)) v.begin + timeIdx.toLong * h.recSize
          else v.begin + timeIdx.toLong * sliceVals * es
        val bb = fetch(off, sliceVals * es)
        val out = new Array[Double](sliceVals)
        var i = 0
        while (i < sliceVals) { out(i) = readNumeric(bb, v.ncType); i += 1 }
        // CF _FillValue -> NaN (the container's masked-cell encoding when
        // the writer didn't use NaN directly)
        v.att("_FillValue") match {
          case Some(fv: Vector[_]) if fv.nonEmpty =>
            val f = fv.head.asInstanceOf[Double]
            var j = 0
            while (j < sliceVals) { if (out(j) == f) out(j) = Double.NaN; j += 1 }
          case _ => ()
        }
        out
      }
      val mean =
        if (needMean) slab(MeanNames) else Array.fill(sliceVals)(Double.NaN)
      val stddev =
        if (needStddev) slab(StddevNames) else Array.fill(sliceVals)(Double.NaN)
      GridFile.GridSlice(nl, ny, nx, timeMicros, leads, yc, xc, mean, stddev)
    } finally in._1.close()
  }

  /** CF time units: `"<unit> since <date>"`. Missing/unparseable units =
    * values already epoch micros (the `.grid` convention).
    */
  private[graft] def toEpochMicros(value: Double, units: Option[Any]): Long =
    units match {
      case Some(s: String) =>
        val m = "(?i)^\\s*(\\w+)\\s+since\\s+(.+?)\\s*$".r
        s match {
          case m(unit, epoch) =>
            val mult = unit.toLowerCase match {
              case "days" | "day" => 86400000000L
              case "hours" | "hour" => 3600000000L
              case "minutes" | "minute" => 60000000L
              case "seconds" | "second" | "secs" => 1000000L
              case "milliseconds" | "millisecond" => 1000L
              case "microseconds" | "microsecond" => 1L
              case other =>
                throw new IllegalArgumentException(s"unsupported time unit '$other'")
            }
            parseEpochMicros(epoch) + math.round(value * mult)
          case _ => math.round(value)
        }
      case _ => math.round(value)
    }

  /** `yyyy-MM-dd[ HH:mm:ss[.S]]` (space or 'T'), optional trailing zone. */
  private def parseEpochMicros(s: String): Long = {
    val norm = s.trim.replace('T', ' ').stripSuffix("Z").trim
    val withTime = if (norm.contains(' ')) norm else s"$norm 00:00:00"
    val fmt = java.time.format.DateTimeFormatter.ofPattern(
      "yyyy-M-d H:m:s[.SSS]")
    val ldt = java.time.LocalDateTime.parse(withTime, fmt)
    ldt.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L +
      ldt.getNano / 1000L
  }

  private def openHadoop(
      path: String): (org.apache.hadoop.fs.FSDataInputStream, Long) = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(new org.apache.hadoop.conf.Configuration())
    (fs.open(p), fs.getFileStatus(p).getLen)
  }

  // ----------------------------------------------------------------- write

  /** Byte-authors a CDF-1/CDF-2 file with the IceNet tensor shape — the
    * fixture/spec writer (and a usable exporter). `recordTime = true` makes
    * `time` the UNLIMITED dimension (interleaved record layout);
    * `floatData = true` stores the data variables as NC_FLOAT (the real
    * files' type — values must be float-exact for lossless round-trips).
    * Time is stored as NC_DOUBLE seconds since 1970-01-01 with CF units, so
    * the reader's unit conversion is exercised on every fixture.
    */
  def write(
      path: String, timesMicros: Array[Long], leadtimes: Array[Int],
      yc: Array[Double], xc: Array[Double],
      mean: Array[Double], stddev: Array[Double],
      recordTime: Boolean = false, floatData: Boolean = false,
      version: Int = 1, fillValue: Option[Double] = None): Unit = {
    require(version == 1 || version == 2, "CDF-1 or CDF-2 only")
    val nt = timesMicros.length
    val (nl, ny, nx) = (leadtimes.length, yc.length, xc.length)
    require(mean.length == nt * nl * ny * nx && stddev.length == mean.length)
    val dataType = if (floatData) NcFloat else NcDouble
    val sliceVals = nl * ny * nx

    case class V(name: String, dimIds: Vector[Int], atts: Seq[(String, Any)],
        ncType: Int, nElems: Long) {
      def isRecord: Boolean = recordTime && dimIds.headOption.contains(0)
      /** Bytes at `begin`: full var if fixed, ONE record's worth if record. */
      def extent: Long = {
        val n = if (isRecord) nElems / nt else nElems
        (n * elemSize(ncType) + 3) / 4 * 4
      }
    }
    val timeAtts = Seq("units" -> "seconds since 1970-01-01 00:00:00")
    val fillAtts = fillValue.toSeq.map("_FillValue" -> Vector(_))
    val vars = Vector(
      V("time", Vector(0), timeAtts, NcDouble, nt.toLong),
      V("leadtime", Vector(1), Nil, NcInt, nl.toLong),
      V("yc", Vector(2), Nil, NcDouble, ny.toLong),
      V("xc", Vector(3), Nil, NcDouble, nx.toLong),
      V("sic_mean", Vector(0, 1, 2, 3), fillAtts, dataType, mean.length.toLong),
      V("sic_stddev", Vector(0, 1, 2, 3), fillAtts, dataType, stddev.length.toLong))

    // header serializer; begins patched on the second pass
    def headerBytes(begins: Map[String, Long]): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      val out = new java.io.DataOutputStream(bos)
      def wName(n: String): Unit = {
        val b = n.getBytes("UTF-8")
        out.writeInt(b.length); out.write(b)
        (0 until (4 - b.length % 4) % 4).foreach(_ => out.writeByte(0))
      }
      def wAtts(atts: Seq[(String, Any)]): Unit = {
        if (atts.isEmpty) { out.writeInt(0); out.writeInt(0) }
        else {
          out.writeInt(0x0C); out.writeInt(atts.size)
          atts.foreach {
            case (n, s: String) =>
              wName(n); out.writeInt(NcChar)
              val b = s.getBytes("UTF-8")
              out.writeInt(b.length); out.write(b)
              (0 until (4 - b.length % 4) % 4).foreach(_ => out.writeByte(0))
            case (n, vs: Vector[_]) =>
              wName(n); out.writeInt(NcDouble); out.writeInt(vs.size)
              vs.foreach(v => out.writeDouble(v.asInstanceOf[Double]))
            case (n, other) =>
              throw new IllegalArgumentException(s"attr $n: $other")
          }
        }
      }
      out.write(Array[Byte]('C', 'D', 'F', version.toByte))
      out.writeInt(if (recordTime) nt else 0)
      out.writeInt(0x0A); out.writeInt(4)
      Seq("time" -> (if (recordTime) 0 else nt), "leadtime" -> nl,
        "yc" -> ny, "xc" -> nx).foreach { case (n, len) =>
        wName(n); out.writeInt(len)
      }
      wAtts(Nil) // no global attrs
      out.writeInt(0x0B); out.writeInt(vars.size)
      vars.foreach { v =>
        wName(v.name)
        out.writeInt(v.dimIds.size); v.dimIds.foreach(out.writeInt)
        wAtts(v.atts)
        out.writeInt(v.ncType)
        val oneRec = if (v.isRecord) v.nElems / nt else v.nElems
        out.writeInt(((oneRec * elemSize(v.ncType) + 3) / 4 * 4).toInt)
        val b = begins.getOrElse(v.name, 0L)
        if (version == 1) out.writeInt(b.toInt) else out.writeLong(b)
      }
      out.flush(); bos.toByteArray
    }

    val hdrLen = headerBytes(Map.empty).length.toLong
    val fixed = vars.filterNot(_.isRecord)
    val record = vars.filter(_.isRecord)
    val begins = scala.collection.mutable.Map.empty[String, Long]
    var off = hdrLen
    fixed.foreach { v => begins(v.name) = off; off += v.extent }
    record.foreach { v => begins(v.name) = off; off += v.extent }
    val recSize = record.map(_.extent).sum // >1 record var => padded stride

    val out = new java.io.DataOutputStream(new java.io.BufferedOutputStream(
      new java.io.FileOutputStream(path)))
    try {
      out.write(headerBytes(begins.toMap))
      def wData(v: V, values: Int => Double, from: Int, count: Long): Unit = {
        var i = 0L
        while (i < count) {
          val raw = values(from + i.toInt)
          val enc = fillValue match {
            case Some(f) if raw.isNaN && (v.name == "sic_mean" ||
              v.name == "sic_stddev") => f
            case _ => raw
          }
          v.ncType match {
            case NcInt => out.writeInt(enc.toInt)
            case NcFloat => out.writeFloat(enc.toFloat)
            case NcDouble => out.writeDouble(enc)
            case t => throw new IllegalArgumentException(s"writer type $t")
          }
          i += 1
        }
        val written = count * elemSize(v.ncType)
        (0 until ((4 - written % 4) % 4).toInt).foreach(_ => out.writeByte(0))
      }
      def series(v: V): Int => Double = v.name match {
        case "time" => i => timesMicros(i) / 1e6 // stored as CF seconds
        case "leadtime" => i => leadtimes(i).toDouble
        case "yc" => i => yc(i)
        case "xc" => i => xc(i)
        case "sic_mean" => i => mean(i)
        case "sic_stddev" => i => stddev(i)
      }
      fixed.foreach(v => wData(v, series(v), 0, v.nElems))
      if (recordTime) (0 until nt).foreach { t =>
        record.foreach { v =>
          val perRec = (v.nElems / nt).toInt
          wData(v, series(v), t * perRec, perRec.toLong)
        }
      }
      require(recSize >= 0) // keep the val referenced; layout derives from extents
    } finally out.close()
  }
}
