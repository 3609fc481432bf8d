package graft.sources

import java.io.{DataInputStream, DataOutputStream, FileInputStream, FileOutputStream}
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
  * processor.py:121-190). The real NetCDF4/HDF5 codec is unavailable in
  * this offline container, so the container format is `.grid` — a minimal
  * self-describing binary tensor with the SAME logical shape as the IceNet
  * NetCDF files: dims (time, leadtime, yc, xc) + variables
  * (sic_mean, sic_stddev). Swapping the byte-level decoder for a NetCDF
  * library touches ONLY [[GridFile]]; the Spark integration (table,
  * schema, partition planning, column pruning, long-form flatten) is the
  * production surface.
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
    new GriddedTable(properties.asScala.getOrElse("paths",
      properties.asScala.getOrElse("path", "")))
}

object GriddedSource {
  /** Long-form schema — the post-flatten shape of processor.py:158-160. */
  val Schema: StructType = StructType(Seq(
    StructField("time", TimestampType, nullable = false),
    StructField("leadtime", IntegerType, nullable = false),
    StructField("yc", DoubleType, nullable = false),
    StructField("xc", DoubleType, nullable = false),
    StructField("sic_mean", DoubleType, nullable = true),
    StructField("sic_stddev", DoubleType, nullable = true)))
}

private[sources] class GriddedTable(path: String) extends Table with SupportsRead {
  override def name(): String = s"gridded:$path"
  override def schema(): StructType = GriddedSource.Schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new GriddedScanBuilder(
      Option(options.get("path")).orElse(Option(options.get("paths")))
        .getOrElse(path))
}

private[sources] class GriddedScanBuilder(path: String)
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = GriddedSource.Schema
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema
  override def build(): Scan = new GriddedScan(path, required)
}

private[sources] class GriddedScan(path: String, required: StructType)
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this

  override def planInputPartitions(): Array[InputPartition] = {
    val files = resolveFiles(path)
    files.flatMap { f =>
      val header = GridFile.readHeader(f)
      // one partition per time slice: multi-date files parallelize freely
      (0 until header.nTime).map(t => GriddedPartition(f, t): InputPartition)
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory = {
    val names = required.fieldNames
    new GriddedReaderFactory(names)
  }

  private def resolveFiles(p: String): Seq[String] = {
    val f = new java.io.File(p)
    if (f.isDirectory)
      f.listFiles().filter(_.getName.endsWith(".grid")).map(_.getPath).sorted.toSeq
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

/** Streams one time-slice of one file as long-form rows. */
private[sources] class GriddedPartitionReader(
    file: String, timeIdx: Int, requiredCols: Array[String])
    extends PartitionReader[InternalRow] {
  private val grid = GridFile.read(file) // slice-sized files; header + axes + slab
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
    val flat = ((timeIdx * grid.nLead + lead) * grid.nY + yi) * grid.nX + xi
    var i = 0
    while (i < requiredCols.length) {
      row(i) = requiredCols(i) match {
        case "time"     => grid.timesMicros(timeIdx)
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

/** The `.grid` container codec — the ONLY piece a real NetCDF integration
  * replaces. Layout (big-endian, DataOutputStream):
  * magic "GRD1", nTime, nLead, nY, nX, times[µs since epoch], leadtimes,
  * yc[], xc[], mean[t][l][y][x], stddev[t][l][y][x] (NaN = masked cell).
  */
object GridFile {
  case class Header(nTime: Int, nLead: Int, nY: Int, nX: Int)
  case class Grid(
      nTime: Int, nLead: Int, nY: Int, nX: Int,
      timesMicros: Array[Long], leadtimes: Array[Int],
      yc: Array[Double], xc: Array[Double],
      mean: Array[Double], stddev: Array[Double])

  def readHeader(path: String): Header = {
    val in = new DataInputStream(new FileInputStream(path))
    try {
      require(in.readInt() == 0x47524431, s"$path: not a GRD1 file")
      Header(in.readInt(), in.readInt(), in.readInt(), in.readInt())
    } finally in.close()
  }

  def read(path: String): Grid = {
    val in = new DataInputStream(new java.io.BufferedInputStream(
      new FileInputStream(path)))
    try {
      require(in.readInt() == 0x47524431, s"$path: not a GRD1 file")
      val (nt, nl, ny, nx) = (in.readInt(), in.readInt(), in.readInt(), in.readInt())
      val times = Array.fill(nt)(in.readLong())
      val leads = Array.fill(nl)(in.readInt())
      val yc = Array.fill(ny)(in.readDouble())
      val xc = Array.fill(nx)(in.readDouble())
      val n = nt * nl * ny * nx
      val mean = Array.fill(n)(in.readDouble())
      val stddev = Array.fill(n)(in.readDouble())
      Grid(nt, nl, ny, nx, times, leads, yc, xc, mean, stddev)
    } finally in.close()
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
