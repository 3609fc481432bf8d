package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.sources.{GridFile, NetcdfClassic}

/** NetCDF classic (CDF-1/CDF-2) decoding — SURVEY.md S2's last gap. The
  * files are byte-authored by [[NetcdfClassic.write]] (itself a from-spec
  * serializer, not a library), then decoded through the SAME DSv2 `gridded`
  * reader as `.grid` files: fixed and record-dim layouts, CDF-2 64-bit
  * offsets, NC_FLOAT data, `_FillValue` masking, CF time units, pruning
  * I/O, and bit-parity with the `.grid` codec on identical logical content.
  */
class NetcdfClassicSpec extends SparkSpec {

  private def us(s: String): Long = Timestamp.valueOf(s).getTime * 1000L

  // 2 times x 2 leads x 2y x 3x, cell (y=1, x=2) masked everywhere —
  // mirrors GriddedSourceSpec's .grid fixture shape
  private val nT = 2; private val nL = 2; private val nY = 2; private val nX = 3
  private val times = Array(us("2020-06-01 00:00:00"), us("2020-06-08 00:00:00"))
  private def slab(t: Int): Array[Double] = (for {
    l <- 0 until nL; y <- 0 until nY; x <- 0 until nX
  } yield if (y == 1 && x == 2) Double.NaN
          else 0.1 * (t + 1) + 0.01 * l + 0.001 * y + 0.0001 * x).toArray
  private val mean = slab(0) ++ slab(1)
  private val stddev = mean.map(_ / 10)
  private val leads = Array(1, 2)
  private val yc = Array(100.0, 125.0)
  private val xc = Array(200.0, 225.0, 250.0)

  private def writeNc(path: String, recordTime: Boolean = false,
      floatData: Boolean = false, version: Int = 1,
      fillValue: Option[Double] = None): String = {
    NetcdfClassic.write(path, times, leads, yc, xc, mean, stddev,
      recordTime = recordTime, floatData = floatData, version = version,
      fillValue = fillValue)
    path
  }

  private def readDf(path: String) = spark.read.format("gridded").load(path)

  private def assertDecodes(path: String): Unit = {
    val df = readDf(path)
    assert(df.count() == nT * nL * nY * nX)
    val r = df.filter(col("leadtime") === 1 && col("yc") === 100.0 &&
      col("xc") === 200.0 &&
      col("time") === Timestamp.valueOf("2020-06-01 00:00:00")).head()
    assert(math.abs(r.getAs[Double]("sic_mean") - 0.1) < 1e-9)
    assert(df.filter(col("sic_mean").isNull).count() == nT * nL) // masked cell
    assert(df.rdd.getNumPartitions == nT) // per-slice planning carries over
  }

  test("CDF-1, fixed time dim: full decode through the DSv2 reader") {
    assertDecodes(writeNc(tmpDir("nc1") + "/fc.nc"))
  }

  test("CDF-1, time as the UNLIMITED record dim (interleaved layout)") {
    assertDecodes(writeNc(tmpDir("ncrec") + "/fc.nc", recordTime = true))
  }

  test("CDF-2 (64-bit offsets), record layout") {
    assertDecodes(writeNc(tmpDir("nc2") + "/fc.nc", recordTime = true, version = 2))
  }

  test("NC_FLOAT data variables decode (float-exact fixture values)") {
    // float-exact values: k/64 survives the float round-trip bit-exactly
    val m2 = Array.tabulate(mean.length)(i => (i % 64) / 64.0)
    val p = tmpDir("ncf") + "/fc.nc"
    NetcdfClassic.write(p, times, leads, yc, xc, m2, m2.map(_ / 2),
      floatData = true)
    val df = readDf(p)
    assert(df.count() == nT * nL * nY * nX)
    assert(df.filter(col("sic_mean").isNull).count() == 0)
    val got = df.filter(col("leadtime") === 2 && col("yc") === 125.0 &&
      col("xc") === 250.0 &&
      col("time") === Timestamp.valueOf("2020-06-08 00:00:00"))
      .head().getAs[Double]("sic_mean")
    assert(got == (mean.length - 1) % 64 / 64.0)
  }

  test("_FillValue cells surface as SQL nulls (fill encoding, not NaN)") {
    val p = writeNc(tmpDir("ncfill") + "/fc.nc", fillValue = Some(-999.0))
    val df = readDf(p)
    assert(df.filter(col("sic_mean").isNull).count() == nT * nL)
    assert(df.filter(col("sic_mean") === -999.0).count() == 0)
  }

  test("CF time units: days-since epoch converts to the same timestamps") {
    // hand-check the unit math the writer's seconds-since path rides on
    assert(NetcdfClassic.toEpochMicros(1.0, Some("days since 2020-06-01")) ==
      us("2020-06-02 00:00:00"))
    assert(NetcdfClassic.toEpochMicros(12.0, Some("hours since 2020-06-01 06:00:00")) ==
      us("2020-06-01 18:00:00"))
    assert(NetcdfClassic.toEpochMicros(5.0e6, None) == 5000000L)
  }

  test(".nc and .grid decode to identical DataFrames on identical content") {
    val dir = tmpDir("parity")
    GridFile.write(s"$dir/a.grid", times, leads, yc, xc, mean, stddev)
    writeNc(s"$dir/b.nc", recordTime = true)
    val g = readDf(s"$dir/a.grid").orderBy("time", "leadtime", "yc", "xc").collect()
    val n = readDf(s"$dir/b.nc").orderBy("time", "leadtime", "yc", "xc").collect()
    assert(g.toSeq == n.toSeq)
  }

  test("directory load unions .grid and .nc files through one scan") {
    val dir = tmpDir("mixed")
    GridFile.write(s"$dir/a.grid", Array(times(0)), leads, yc, xc,
      slab(0), slab(0).map(_ / 10))
    NetcdfClassic.write(s"$dir/b.nc", Array(times(1)), leads, yc, xc,
      slab(1), slab(1).map(_ / 10))
    val df = readDf(dir)
    assert(df.count() == nT * nL * nY * nX)
    assert(df.select("time").distinct().count() == 2)
  }

  test("slice reads stay O(slice), not O(file): pruning + seeking guard") {
    val dir = tmpDir("ncseek")
    val t4 = Array.tabulate(4)(i => us(f"2022-01-0${i + 1} 00:00:00"))
    val vals = Array.tabulate(4 * nL * nY * nX)(_.toDouble)
    NetcdfClassic.write(s"$dir/big.nc", t4, leads, yc, xc, vals,
      vals.map(_ / 10), recordTime = true)
    val dataBytes = 2L * vals.length * 8
    val before = NetcdfClassic.bytesRead.get()
    // prune to sic_mean only: stddev slabs must never be fetched
    val s = readDf(s"$dir/big.nc").agg(sum("sic_mean")).head().getDouble(0)
    assert(s == vals.sum)
    val delta = NetcdfClassic.bytesRead.get() - before
    // per slice: header prefix (~8KB floor) + axes + ONE variable's slab
    val headerOverhead = 4 * 2 * 8192L // 4 partitions x (header + slice) reads
    assert(delta < dataBytes / 2 + headerOverhead,
      s"read $delta bytes; one-variable share is ${dataBytes / 2}")
  }

  test("unrecognized bytes fail loudly, never misread") {
    val p = tmpDir("ncbad") + "/fake.nc"
    // neither CDF, HDF5, nor GRD1 magic: must throw, never decode garbage
    java.nio.file.Files.write(java.nio.file.Paths.get(p),
      "not a tensor container, honest".getBytes ++ new Array[Byte](64))
    val e = intercept[Exception] { readDf(p).collect() }
    assert(e.getMessage != null)
  }
}
