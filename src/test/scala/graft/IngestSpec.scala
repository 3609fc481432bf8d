package graft

import java.sql.{Date, Timestamp}
import org.apache.spark.sql.DataFrame
import graft.icenet._

/** Reference-semantics tests for the ingest stage (processor.py:117-190). */
class IngestSpec extends SparkSpec {
  import spark.implicits._

  private def raw(
      meanName: String = "sic_mean", stdName: String = "sic_stddev"): DataFrame = {
    val t0 = Timestamp.valueOf("2020-06-01 00:00:00")
    Seq(
      // (time, leadtime, xc, yc, lat, lon, mean, std)
      (t0, 1, 100.0, 200.0, 85.0, 10.0, Some(0.5), Some(0.1)),
      (t0, 1, 125.0, 200.0, 85.1, 10.1, Some(0.0), Some(0.0)),  // filtered: mean==0
      (t0, 2, 100.0, 225.0, 85.2, 10.2, None, None),            // dropped: null (land)
      (t0, 2, 125.0, 225.0, 85.3, 10.3, Some(0.9), Some(0.2))
    ).toDF("time", "leadtime", "xc", "yc", "lat", "lon", meanName, stdName)
  }

  test("P1 rename shim maps legacy mean/stddev, leaves modern names alone") {
    val legacy = Ingest.renameShim(raw("mean", "stddev"))
    assert(legacy.columns.contains("sic_mean") && legacy.columns.contains("sic_stddev"))
    assert(!legacy.columns.contains("mean"))
    val modern = Ingest.renameShim(raw())
    assert(modern.columns.count(_ == "sic_mean") == 1)
  }

  test("P2+P3 filterValid keeps only positive-mean, non-null rows") {
    val out = Ingest.filterValid(raw())
    assert(out.count() == 2)
    assert(out.agg(org.apache.spark.sql.functions.min("sic_mean"))
      .head().getDouble(0) > 0)
  }

  test("P5 km->m integer downcast") {
    val m = Ingest.toMeters(raw()).select("xc_m", "yc_m").distinct().collect()
    assert(m.map(r => (r.getInt(0), r.getInt(1))).toSet ==
      Set((100000, 200000), (125000, 200000), (100000, 225000), (125000, 225000)))
  }

  test("P6+P8 forecast dates = date(time) + leadtime days") {
    val d = Ingest.deriveDates(raw())
      .select("leadtime", "date_forecast_generated", "date_forecast_for")
      .distinct().collect()
    d.foreach { r =>
      assert(r.getDate(1) == Date.valueOf("2020-06-01"))
      val expected = Date.valueOf(s"2020-06-0${1 + r.getInt(0)}")
      assert(r.getDate(2) == expected)
    }
  }

  test("load produces forecast-shaped frame with float4 measures") {
    val out = Ingest.load(raw("mean", "stddev"))
    assert(out.columns.sorted.toSeq == Seq("date_forecast_for",
      "date_forecast_generated", "sea_ice_concentration_mean",
      "sea_ice_concentration_stddev", "xc_m", "yc_m"))
    assert(out.schema("sea_ice_concentration_mean").dataType.typeName == "float")
    assert(out.count() == 2)
  }

  // hemisphere truth table (processor.py:137-150)
  test("P9 hemisphere: lat_max>80 -> north, regardless of keywords") {
    assert(Ingest.detectHemisphere(Some(85.0), None, "south stuff") == North)
  }
  test("P9 hemisphere: lat_min<-80 -> south") {
    assert(Ingest.detectHemisphere(None, Some(-85.0), "") == South)
  }
  test("P9 hemisphere: keyword fallback") {
    assert(Ingest.detectHemisphere(Some(70.0), Some(-70.0), "Arctic north sea ice") == North)
    assert(Ingest.detectHemisphere(None, None, "Antarctic SOUTH") == South)
  }
  test("P9 hemisphere: ambiguous or absent -> error") {
    intercept[IllegalArgumentException](Ingest.detectHemisphere(None, None, "north south"))
    intercept[IllegalArgumentException](Ingest.detectHemisphere(None, None, "equator"))
  }

  test("regrid: 2x2 block census with exact index recovery and NaN mask") {
    // one (time, leadtime), a 2x4 grid -> two coarse cells; the first
    // block carries a NaN mask cell (excluded), the second is clean
    val t0 = Timestamp.valueOf("2020-03-01 00:00:00")
    val rows = Seq(
      // block (yi_c=0, xi_c=0): cells (y0,x0)=0.1, (y0,x1)=NaN,
      //                         (y1,x0)=0.3, (y1,x1)=0.5
      (t0, 1, -537.5, -262.5, 0.1), (t0, 1, -537.5, -237.5, Double.NaN),
      (t0, 1, -512.5, -262.5, 0.3), (t0, 1, -512.5, -237.5, 0.5),
      // block (yi_c=0, xi_c=1): 0.2, 0.4, 0.6, 0.8
      (t0, 1, -537.5, -212.5, 0.2), (t0, 1, -537.5, -187.5, 0.4),
      (t0, 1, -512.5, -212.5, 0.6), (t0, 1, -512.5, -187.5, 0.8)
    ).toDF("time", "leadtime", "yc", "xc", "sic_mean")
    val got = Ingest.regrid(rows)
      .select("xc_m", "yc_m", "n_cells", "sic_min", "sic_max", "sic_avg")
      .as[(Int, Int, Long, Double, Double, Double)].collect()
      .sortBy(_._1).toSeq
    assert(got.map(g => (g._1, g._2, g._3, g._4, g._5)) == Seq(
      (-250000, -525000, 3L, 0.1, 0.5),
      (-200000, -525000, 4L, 0.2, 0.8)))
    // means up to aggregation-order ulps (the gate's 6-dp rounding
    // absorbs them; exactness there is argued from the 0.025-grid)
    assert(math.abs(got.head._6 - 0.3) < 1e-12)
    assert(math.abs(got(1)._6 - 0.5) < 1e-12)
    val e = intercept[IllegalArgumentException](Ingest.regrid(rows, factor = 1))
    assert(e.getMessage.contains("factor"))
  }

  test("climatologyAnomaly: per-(cell, leadtime) mean across dates, " +
    "single-date cells anomaly zero") {
    val loaded = Seq(
      (1000, 2000, Date.valueOf("2020-03-01"), Date.valueOf("2020-03-02"), 0.2f),
      (1000, 2000, Date.valueOf("2020-03-02"), Date.valueOf("2020-03-03"), 0.4f),
      (1000, 2000, Date.valueOf("2020-03-01"), Date.valueOf("2020-03-03"), 0.5f)
    ).toDF("xc_m", "yc_m", "date_forecast_generated", "date_forecast_for",
      "sea_ice_concentration_mean")
    val got = Ingest.climatologyAnomaly(loaded)
      .select("date_forecast_generated", "leadtime", "n_obs", "clim_mean",
        "anomaly")
      .as[(Date, Long, Long, Double, Double)].collect()
      .map(r => (r._1.toString, r._2) -> ((r._3, r._4, r._5))).toMap
    // leadtime 1 across both dates: clim = (0.2f + 0.4f)/2 in double
    val clim = (0.2f.toDouble + 0.4f.toDouble) / 2
    assert(got(("2020-03-01", 1L)) ==
      ((2L, clim, 0.2f.toDouble - clim)))
    assert(got(("2020-03-02", 1L)) ==
      ((2L, clim, 0.4f.toDouble - clim)))
    // leadtime 2 seen once: climatology = itself, anomaly exactly 0
    assert(got(("2020-03-01", 2L)) == ((1L, 0.5f.toDouble, 0.0)))
  }

  test("iceExtent: 15% threshold census with exact integer area") {
    val loaded = Seq(
      // leadtime 1 on 03-01: sic 0.10 (below), 0.16, 0.9 (above) -> 2 ice
      (1000, 2000, Date.valueOf("2020-03-01"), Date.valueOf("2020-03-02"), 0.10f),
      (1500, 2000, Date.valueOf("2020-03-01"), Date.valueOf("2020-03-02"), 0.16f),
      (2000, 2000, Date.valueOf("2020-03-01"), Date.valueOf("2020-03-02"), 0.90f),
      // leadtime 2: "0.15" is not float-representable — the stored value
      // is 0.150000005..., strictly ABOVE the threshold, and BOTH engines
      // see the same float, so it counts (pinning the representation
      // semantics rather than pretending the literal is exact)
      (1000, 2000, Date.valueOf("2020-03-01"), Date.valueOf("2020-03-03"), 0.15f)
    ).toDF("xc_m", "yc_m", "date_forecast_generated", "date_forecast_for",
      "sea_ice_concentration_mean")
    val got = Ingest.iceExtent(loaded)
      .select("leadtime", "n_cells", "n_ice_cells", "extent_km2")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq((1L, 3L, 2L, 1250L), (2L, 1L, 1L, 625L)))
  }
}
