package graft.sources

import java.io.{DataOutputStream, FileOutputStream}
import java.util
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DataSource V2 for gridded forecast tensors — the engine-native ingest
  * path for the reference's NetCDF input (SURVEY.md S2,
  * processor.py:121-190). Three container codecs share the chassis,
  * sniffed by magic ([[GridCodec]]): real NetCDF classic (CDF-1/CDF-2)
  * decoded in pure JVM bytes ([[NetcdfClassic]] — `.nc`, the reference's
  * actual file type), the contiguous/uncompressed slice of NetCDF-4/HDF5
  * ([[Hdf5Netcdf]] — what fixed-shape uncompressed xarray/netCDF4 output
  * occupies; chunked/deflate variants fail loudly naming the feature), and
  * `.grid` — a minimal self-describing binary tensor with the SAME logical
  * shape: dims (time, leadtime, yc, xc) + variables (sic_mean,
  * sic_stddev). The Spark integration (table, schema, partition planning,
  * column pruning, long-form flatten) is codec-agnostic.
  *
  * ==NetCDF-to-seam mapping (what a real codec replaces, item by item)==
  * The IceNet files (opened with `xarray.open_dataset`,
  * processor.py:122) carry:
  *  - dims `(time, leadtime, yc, xc)` (processor.py:123-124's logged
  *    `xr.dims`) -> [[GridFile.Header]] `(nTime, nLead, nY, nX)`. A NetCDF
  *    codec reads these from the file's dimension records instead of the
  *    GRD1 fixed header; `readHeader` is one metadata read either way.
  *  - coordinate variables `time` (epoch-like datetime64), `leadtime`
  *    (days), `yc`/`xc` (km, converted x1000 to metres downstream at
  *    processor.py:157-166 / `Ingest.toMeters`) -> the axis block of
  *    [[GridFile.GridSlice]] (`timeMicros`, `leadtimes`, `yc`, `xc`).
  *  - data variables `sic_mean`/`sic_stddev` (float arrays over
  *    `time x leadtime x yc x xc`, NaN = land/masked cell; legacy files
  *    name them `mean`/`stddev`, renamed at processor.py:126-133 —
  *    handled engine-side by `Ingest.renameShim`) -> the two slabs of
  *    [[GridFile.readSlice]]. NaN -> SQL NULL happens in the reader
  *    ([[GriddedPartitionReader.get]]), mirroring xarray's NaN semantics.
  *  - global attrs `geospatial_lat_max` / `geospatial_lat_min` /
  *    `keywords` (hemisphere detection, processor.py:137-150) -> driver
  *    metadata, handled by `Ingest.detectHemisphere`; they never enter the
  *    tensor path.
  *  - aux vars `lat`/`lon`/`Lambert_Azimuthal_Grid` (CRS container) are
  *    DROPPED by the reference immediately after flatten
  *    (processor.py:171-180); the source never materializes them and the
  *    LAEA math lives in `icenet.Laea`.
  * The per-slice positioned read maps to
  * `variable.read(origin=[t,0,0,0], shape=[1,nLead,nY,nX])` in a
  * netCDF-java integration — HDF5 chunk reads at exactly the same
  * granularity as [[GridFile.readSlice]]'s ranged reads, so the
  * one-partition-per-time-slice planning carries over unchanged.
  *
  * Scale design: one InputPartition per (file, time-slice) so a multi-file
  * multi-date drop parallelizes without any shuffle; the reader streams
  * cells and never materializes the tensor; column pruning is pushed into
  * the reader (pruned variables are skipped, not decoded).
  *
  * Usage: `spark.read.format("gridded").load(pathToGridFileOrDir)`.
  */
class GriddedSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "gridded"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    GriddedSource.Schema
  override def getTable(
      schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new GriddedTable(GriddedSource.optionPaths(properties.asScala.toMap))
}

object GriddedSource {
  /** Resolves the DSv2 path options: `load(p)` arrives as option "path";
    * `load(p1, p2, ...)` arrives as option "paths" holding a JSON-encoded
    * string array (the DataFrameReader contract). The r1 code treated the
    * JSON blob as a literal filesystem path, silently breaking multi-path
    * loads.
    */
  private[sources] def optionPaths(props: Map[String, String]): Seq[String] = {
    val multi = props.get("paths").toSeq.flatMap { json =>
      // the value is a JSON string array produced by DataFrameReader.load
      val m = new com.fasterxml.jackson.databind.ObjectMapper()
      m.readValue(json, classOf[Array[String]]).toSeq
    }
    val single = props.get("path").toSeq
    (single ++ multi).distinct
  }

  /** Long-form schema — the post-flatten shape of processor.py:158-160. */
  val Schema: StructType = StructType(Seq(
    StructField("time", TimestampType, nullable = false),
    StructField("leadtime", IntegerType, nullable = false),
    StructField("yc", DoubleType, nullable = false),
    StructField("xc", DoubleType, nullable = false),
    StructField("sic_mean", DoubleType, nullable = true),
    StructField("sic_stddev", DoubleType, nullable = true)))
}

private[sources] class GriddedTable(paths: Seq[String]) extends Table with SupportsRead {
  override def name(): String = s"gridded:${paths.mkString(",")}"
  override def schema(): StructType = GriddedSource.Schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    val fromOptions = GriddedSource.optionPaths(
      options.asCaseSensitiveMap().asScala.toMap)
    new GriddedScanBuilder(if (fromOptions.nonEmpty) fromOptions else paths)
  }
}

private[sources] class GriddedScanBuilder(paths: Seq[String])
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = GriddedSource.Schema
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema
  override def build(): Scan = new GriddedScan(paths, required)
}

private[sources] class GriddedScan(paths: Seq[String], required: StructType)
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this

  override def planInputPartitions(): Array[InputPartition] = {
    val files = paths.flatMap(resolveFiles).distinct
    files.flatMap { f =>
      val header = GridCodec.readHeader(f)
      // one partition per time slice: multi-date files parallelize freely
      (0 until header.nTime).map(t => GriddedPartition(f, t): InputPartition)
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory = {
    val names = required.fieldNames
    new GriddedReaderFactory(names)
  }

  /** Resolves through the Hadoop FileSystem API, so any URI Spark can reach
    * (hdfs://, s3a://, local) works — not just java.io.File paths.
    */
  private def resolveFiles(p: String): Seq[String] = {
    val hPath = new org.apache.hadoop.fs.Path(p)
    val conf = org.apache.spark.sql.SparkSession.active.sessionState.newHadoopConf()
    val fs = hPath.getFileSystem(conf)
    val status = fs.getFileStatus(hPath)
    if (status.isDirectory)
      fs.listStatus(hPath).toSeq
        .filter(s => s.isFile && GridCodec.Extensions.exists(s.getPath.getName.endsWith))
        .map(_.getPath.toUri.toString).sorted
    else Seq(p)
  }
}

private[sources] case class GriddedPartition(file: String, timeIdx: Int)
    extends InputPartition

private[sources] class GriddedReaderFactory(requiredCols: Array[String])
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[GriddedPartition]
    new GriddedPartitionReader(p.file, p.timeIdx, requiredCols)
  }
}

/** Streams one time-slice of one file as long-form rows.
  *
  * Reads ONLY the assigned slice: the `.grid` layout is fixed-stride, so the
  * byte offset of the (timeIdx) slab of each variable is closed-form from
  * the header ([[GridFile.readSlice]]). A file with T dates is decoded in T
  * slice-sized reads across its T partitions — O(fileSize) total I/O — and
  * no task ever holds more than one slice in memory. (The r1 reader called
  * GridFile.read(file) per partition: O(T x fileSize) amplification.)
  * Variables pruned from `requiredCols` are never read (skip, not decode).
  */
private[sources] class GriddedPartitionReader(
    file: String, timeIdx: Int, requiredCols: Array[String])
    extends PartitionReader[InternalRow] {
  private val grid = GridCodec.readSlice(
    file, timeIdx,
    needMean = requiredCols.contains("sic_mean"),
    needStddev = requiredCols.contains("sic_stddev"))
  private var lead = 0
  private var yi = 0
  private var xi = -1
  private val row = new Array[Any](requiredCols.length)

  override def next(): Boolean = {
    xi += 1
    if (xi >= grid.nX) { xi = 0; yi += 1 }
    if (yi >= grid.nY) { yi = 0; lead += 1 }
    lead < grid.nLead
  }

  override def get(): InternalRow = {
    val flat = (lead * grid.nY + yi) * grid.nX + xi
    var i = 0
    while (i < requiredCols.length) {
      row(i) = requiredCols(i) match {
        case "time"     => grid.timeMicros
        case "leadtime" => grid.leadtimes(lead)
        case "yc"       => grid.yc(yi)
        case "xc"       => grid.xc(xi)
        case "sic_mean" =>
          val v = grid.mean(flat); if (v.isNaN) null else v
        case "sic_stddev" =>
          val v = grid.stddev(flat); if (v.isNaN) null else v
      }
      i += 1
    }
    InternalRow.fromSeq(row.toSeq)
  }

  override def close(): Unit = ()
}

/** Codec dispatch: sniffs the 4-byte magic and routes to the `.grid`
  * container ([[GridFile]], `GRD1`) or the NetCDF classic decoder
  * ([[NetcdfClassic]], `CDF\x01`/`CDF\x02`) — so `.nc` files, the
  * reference's actual input (processor.py:121), read through the SAME DSv2
  * chassis (per-(file, slice) partitions, pruning, positioned reads) with
  * no plan-level difference. The sniff is one 4-byte positioned read per
  * header/slice call — noise next to the slab reads it precedes.
  */
object GridCodec {
  val Extensions: Seq[String] = Seq(".grid", ".nc")

  private sealed trait Kind
  private case object Classic extends Kind // CDF-1/CDF-2
  private case object Hdf5 extends Kind // NetCDF-4 container (bounded slice)
  private case object Grid extends Kind // GRD1

  private def sniff(path: String): Kind = {
    val p = new org.apache.hadoop.fs.Path(path)
    val in = p.getFileSystem(new org.apache.hadoop.conf.Configuration()).open(p)
    try {
      val magic = new Array[Byte](8)
      in.readFully(0L, magic)
      if (magic(0) == 'C' && magic(1) == 'D' && magic(2) == 'F' &&
        (magic(3) == 1 || magic(3) == 2)) Classic
      else if (magic.sameElements(Hdf5Netcdf.Signature)) Hdf5
      else Grid
    } finally in.close()
  }

  def readHeader(path: String): GridFile.Header = sniff(path) match {
    case Classic => NetcdfClassic.readGridHeader(path)
    case Hdf5 => Hdf5Netcdf.readGridHeader(path)
    case Grid => GridFile.readHeader(path)
  }

  def readSlice(
      path: String, timeIdx: Int,
      needMean: Boolean = true, needStddev: Boolean = true): GridFile.GridSlice =
    sniff(path) match {
      case Classic => NetcdfClassic.readGridSlice(path, timeIdx, needMean, needStddev)
      case Hdf5 => Hdf5Netcdf.readGridSlice(path, timeIdx, needMean, needStddev)
      case Grid => GridFile.readSlice(path, timeIdx, needMean, needStddev)
    }
}

/** The `.grid` container codec — the ONLY piece a real NetCDF integration
  * replaces. Layout (big-endian, DataOutputStream):
  * magic "GRD1", nTime, nLead, nY, nX, times[µs since epoch], leadtimes,
  * yc[], xc[], mean[t][l][y][x], stddev[t][l][y][x] (NaN = masked cell).
  */
object GridFile {
  case class Header(nTime: Int, nLead: Int, nY: Int, nX: Int)

  /** One decoded time-slice: axes + the (lead, y, x) slabs of the requested
    * variables. Pruned variables are all-NaN arrays that were never read.
    */
  case class GridSlice(
      nLead: Int, nY: Int, nX: Int,
      timeMicros: Long, leadtimes: Array[Int],
      yc: Array[Double], xc: Array[Double],
      mean: Array[Double], stddev: Array[Double])

  /** Total data bytes read by [[readSlice]] since JVM start — lets tests
    * assert that reading one slice of a T-slice file does NOT scan the
    * whole file (the I/O-amplification regression guard).
    */
  val bytesRead = new java.util.concurrent.atomic.AtomicLong(0)

  /** Opens through the Hadoop FileSystem API so the codec reads the same
    * URIs the scan resolves (file:, hdfs:, s3a:, ...). Positioned reads on
    * FSDataInputStream are the idiom remote stores implement efficiently
    * (ranged GETs), which is exactly the access pattern seek-to-slice needs.
    */
  private def open(path: String): org.apache.hadoop.fs.FSDataInputStream = {
    val p = new org.apache.hadoop.fs.Path(path)
    p.getFileSystem(new org.apache.hadoop.conf.Configuration()).open(p)
  }

  def readHeader(path: String): Header = {
    val in = open(path)
    try {
      require(in.readInt() == 0x47524431, s"$path: not a GRD1 file")
      Header(in.readInt(), in.readInt(), in.readInt(), in.readInt())
    } finally in.close()
  }

  /** Reads the header/axes region plus ONLY the (timeIdx) slab of each
    * requested variable, seeking past everything else. The format is
    * fixed-stride, so every offset is closed-form:
    * headerBytes = 20 + 8 nT + 4 nL + 8 nY + 8 nX,
    * mean slab t at headerBytes + t*sliceBytes,
    * stddev slab t at headerBytes + nT*sliceBytes + t*sliceBytes,
    * with sliceBytes = 8 * nL * nY * nX.
    */
  def readSlice(
      path: String, timeIdx: Int,
      needMean: Boolean = true, needStddev: Boolean = true): GridSlice = {
    val in = open(path)
    try {
      require(in.readInt() == 0x47524431, s"$path: not a GRD1 file")
      val (nt, nl, ny, nx) = (in.readInt(), in.readInt(), in.readInt(), in.readInt())
      require(timeIdx >= 0 && timeIdx < nt, s"$path: time slice $timeIdx not in [0,$nt)")
      val timeBuf = readAt(in, 20L + 8L * timeIdx, 8)
      val timeMicros = java.nio.ByteBuffer.wrap(timeBuf).getLong()
      // axis block (leadtimes, yc, xc) in one contiguous read
      val axes = java.nio.ByteBuffer.wrap(
        readAt(in, 20L + 8L * nt, 4 * nl + 8 * (ny + nx)))
      val leads = Array.fill(nl)(axes.getInt())
      val yc = Array.fill(ny)(axes.getDouble())
      val xc = Array.fill(nx)(axes.getDouble())
      val headerBytes = 20L + 8L * nt + 4L * nl + 8L * ny + 8L * nx
      val sliceVals = nl * ny * nx
      def slab(varIdx: Int): Array[Double] = {
        val bb = java.nio.ByteBuffer.wrap(readAt(
          in, headerBytes + (varIdx.toLong * nt + timeIdx) * 8L * sliceVals,
          8 * sliceVals))
        val out = new Array[Double](sliceVals)
        bb.asDoubleBuffer().get(out)
        out
      }
      val mean =
        if (needMean) slab(0) else Array.fill(sliceVals)(Double.NaN)
      val stddev =
        if (needStddev) slab(1) else Array.fill(sliceVals)(Double.NaN)
      GridSlice(nl, ny, nx, timeMicros, leads, yc, xc, mean, stddev)
    } finally in.close()
  }

  private def readAt(
      in: org.apache.hadoop.fs.FSDataInputStream, offset: Long, n: Int): Array[Byte] = {
    val buf = new Array[Byte](n)
    in.readFully(offset, buf) // positioned read: a ranged GET on object stores
    bytesRead.addAndGet(n.toLong)
    buf
  }

  /** Test/fixture writer. */
  def write(
      path: String, timesMicros: Array[Long], leadtimes: Array[Int],
      yc: Array[Double], xc: Array[Double],
      mean: Array[Double], stddev: Array[Double]): Unit = {
    val out = new DataOutputStream(new java.io.BufferedOutputStream(
      new FileOutputStream(path)))
    try {
      out.writeInt(0x47524431)
      out.writeInt(timesMicros.length); out.writeInt(leadtimes.length)
      out.writeInt(yc.length); out.writeInt(xc.length)
      timesMicros.foreach(out.writeLong)
      leadtimes.foreach(out.writeInt)
      yc.foreach(out.writeDouble)
      xc.foreach(out.writeDouble)
      mean.foreach(out.writeDouble)
      stddev.foreach(out.writeDouble)
    } finally out.close()
  }
}
