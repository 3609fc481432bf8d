package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.icenet.{Ingest, North, Pipeline, TableOps}
import graft.sources.GridFile

/** DataSource V2 gridded-source tests: decode correctness, masked cells,
  * column pruning, per-time-slice partitioning, and the full NetCDF-shaped
  * path: .grid file -> long form -> icenet pipeline.
  */
class GriddedSourceSpec extends SparkSpec {

  private def us(s: String): Long =
    Timestamp.valueOf(s).getTime * 1000L

  /** 2 times x 2 leads x 2y x 3x grid; cell (y=1,x=2) masked at all coords. */
  private lazy val gridDir: String = {
    val dir = tmpDir("grid")
    val ny = 2; val nx = 3; val nl = 2
    val times = Array(us("2020-06-01 00:00:00"), us("2020-06-08 00:00:00"))
    def slab(t: Int) = (for {
      l <- 0 until nl; y <- 0 until ny; x <- 0 until nx
    } yield if (y == 1 && x == 2) Double.NaN
            else 0.1 * (t + 1) + 0.01 * l + 0.001 * y + 0.0001 * x).toArray
    GridFile.write(s"$dir/fc.grid", times, Array(1, 2),
      Array(100.0, 125.0), Array(200.0, 225.0, 250.0),
      slab(0) ++ slab(1), slab(0).map(_ / 10) ++ slab(1).map(_ / 10))
    dir
  }

  private lazy val df = spark.read.format("gridded").load(s"$gridDir/fc.grid")

  test("decodes the full long form: one row per (time, lead, y, x) cell") {
    assert(df.count() == 2 * 2 * 2 * 3)
    assert(df.columns.toSeq ==
      Seq("time", "leadtime", "yc", "xc", "sic_mean", "sic_stddev"))
    val r = df.filter(col("leadtime") === 1 && col("yc") === 100.0 &&
      col("xc") === 200.0 && col("time") === Timestamp.valueOf("2020-06-01 00:00:00"))
      .head()
    // t=0, l=0, y=0, x=0 -> 0.1*(0+1) + 0.01*0 + 0.001*0 + 0.0001*0
    assert(math.abs(r.getAs[Double]("sic_mean") - 0.1) < 1e-12)
  }

  test("masked cells (NaN in the container) surface as nulls") {
    assert(df.filter(col("sic_mean").isNull).count() == 2 * 2) // per time x lead
  }

  test("column pruning reaches the reader") {
    val pruned = spark.read.format("gridded").load(s"$gridDir/fc.grid")
      .select("xc", "leadtime")
    assert(pruned.queryExecution.executedPlan.toString.contains("xc"))
    assert(pruned.distinct().count() == 6) // 3 xc x 2 leads
  }

  test("one input partition per time slice") {
    assert(df.rdd.getNumPartitions == 2)
  }

  test("multi-path load: load(p1, p2) unions both files") {
    val dir = tmpDir("multi")
    def flat(v: Double) = Array.fill(1 * 1 * 2)(v) // nl=1, ny=1, nx=2
    GridFile.write(s"$dir/a.grid", Array(us("2021-01-01 00:00:00")), Array(1),
      Array(1.0), Array(2.0, 3.0), flat(0.5), flat(0.05))
    GridFile.write(s"$dir/b.grid", Array(us("2021-01-02 00:00:00")), Array(1),
      Array(1.0), Array(2.0, 3.0), flat(0.7), flat(0.07))
    val two = spark.read.format("gridded").load(s"$dir/a.grid", s"$dir/b.grid")
    assert(two.count() == 4)
    assert(two.select("time").distinct().count() == 2)
  }

  test("slice-seeking reader: bytes read ~ data size, not nTime x file size") {
    val dir = tmpDir("seek")
    val nT = 4; val nl = 2; val ny = 4; val nx = 4
    val times = (1 to nT).map(i => us(f"2022-01-0$i 00:00:00")).toArray
    val vals = Array.tabulate(nT * nl * ny * nx)(_.toDouble)
    GridFile.write(s"$dir/big.grid", times, Array(1, 2),
      Array.tabulate(ny)(_ * 1.0), Array.tabulate(nx)(_ * 1.0),
      vals, vals.map(_ / 10))
    val dataBytes = 2L * nT * nl * ny * nx * 8 // both variables, all slices
    val before = GridFile.bytesRead.get()
    val n = spark.read.format("gridded").load(s"$dir/big.grid").count()
    assert(n == nT * nl * ny * nx)
    val delta = GridFile.bytesRead.get() - before
    // each of the nT slice partitions re-reads only its slab + tiny axes;
    // the old whole-file-per-partition reader would cost ~nT x dataBytes
    assert(delta < dataBytes + nT * 1024L,
      s"read $delta bytes for $dataBytes bytes of data")
  }

  test("pruned variables are skipped, not decoded") {
    // fc.grid data region = 2 vars x 2t x (2l x 2y x 3x) x 8B = 384B;
    // reading only sic_mean must stay under one variable's share + axes
    val before = GridFile.bytesRead.get()
    spark.read.format("gridded").load(s"$gridDir/fc.grid")
      .agg(sum("sic_mean")).collect()
    val delta = GridFile.bytesRead.get() - before
    assert(delta < 384, s"expected < one-variable read, got $delta bytes")
  }

  test("end-to-end: .grid file through the icenet pipeline") {
    val wh = tmpDir("gridwh")
    val p = new Pipeline(spark, wh, North)
    // the gridded source lacks lat/lon columns (CRS-derived; dropped by the
    // reference anyway) — Ingest handles their absence.
    p.ingest(df.filter(col("time") === Timestamp.valueOf("2020-06-01 00:00:00")))
    p.ingest(df.filter(col("time") === Timestamp.valueOf("2020-06-08 00:00:00")))
    assert(TableOps.read(spark, p.cellPath).count() == 6)
    // 5 wet cells x 2 leads per generation
    assert(TableOps.read(spark, p.forecastPath).count() == 20)
    val latest = TableOps.read(spark, p.latestPath)
    assert(latest.select(max("date_forecast_generated")).head().getDate(0)
      == java.sql.Date.valueOf("2020-06-08"))
    assert(TableOps.read(spark, p.metaPath).count() == 2)
  }
}
