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
