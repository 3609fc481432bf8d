package graft

import java.sql.{Date, Timestamp}
import org.apache.spark.sql.functions._
import graft.ops.Temporal

/** Temporal operators: SCD2 interval construction (ordering, ties,
  * point-in-time lookup) and calendar gap-fill (span bounds,
  * carry-forward, observation flags).
  */
class TemporalSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("scd2: versions chain half-open, last is current; ties broken by the id") {
    val changes = Seq(
      (1L, 100L, ts("2024-01-01 00:00:00"), "bronze"),
      (1L, 101L, ts("2024-02-01 00:00:00"), "silver"),
      (1L, 102L, ts("2024-02-01 00:00:00"), "gold"), // same ts: id orders it
      (2L, 103L, ts("2024-03-01 00:00:00"), "basic")
    ).toDF("user_id", "change_id", "ts", "tier")
    val got = Temporal.scd2(changes, Seq("user_id"), Seq("ts", "change_id"))
      .select("change_id", "tier", "valid_to", "is_current")
      .as[(Long, String, Option[Timestamp], Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got(100L) == (("bronze", Some(ts("2024-02-01 00:00:00")), false)))
    assert(got(101L) == (("silver", Some(ts("2024-02-01 00:00:00")), false)),
      "tied timestamps yield a zero-length interval, deterministically ordered")
    assert(got(102L) == (("gold", None, true)))
    assert(got(103L) == (("basic", None, true)))
  }

  test("asOfVersion returns exactly one version per key at any instant") {
    val changes = Seq(
      (1L, 100L, ts("2024-01-01 00:00:00"), "bronze"),
      (1L, 101L, ts("2024-02-01 00:00:00"), "silver")
    ).toDF("user_id", "change_id", "ts", "tier")
    val scd = Temporal.scd2(changes, Seq("user_id"), Seq("ts", "change_id"))
    def at(t: String) = Temporal.asOfVersion(scd, lit(ts(t)))
      .select("tier").as[String].collect().toSeq
    assert(at("2024-01-15 00:00:00") == Seq("bronze"))
    assert(at("2024-02-01 00:00:00") == Seq("silver"), "half-open: boundary belongs to the new version")
    assert(at("2023-12-31 00:00:00") == Seq())
  }

  test("gapFill: per-key spans, carry-forward values, observation flags") {
    val daily = Seq(
      (1L, Date.valueOf("2024-01-01"), 5L),
      (1L, Date.valueOf("2024-01-04"), 7L), // 2 missing days between
      (2L, Date.valueOf("2024-01-10"), 1L)  // singleton span
    ).toDF("user_id", "d", "n")
    val got = Temporal.gapFill(daily, "user_id", "d", "n")
      .select("user_id", "d", "is_observed", "n")
      .as[(Long, Date, Boolean, Long)].collect()
      .map(r => (r._1, r._2.toString) -> ((r._3, r._4))).toMap
    assert(got.size == 5, "4-day span for user 1 + 1 day for user 2")
    assert(got((1L, "2024-01-01")) == ((true, 5L)))
    assert(got((1L, "2024-01-02")) == ((false, 5L)))
    assert(got((1L, "2024-01-03")) == ((false, 5L)))
    assert(got((1L, "2024-01-04")) == ((true, 7L)))
    assert(got((2L, "2024-01-10")) == ((true, 1L)))
  }

  test("interpolate: straight line through gaps, flat beyond the anchors") {
    val daily = Seq(
      (1L, Date.valueOf("2024-01-01"), 1L),
      (1L, Date.valueOf("2024-01-04"), 7L), // gap of 2: expect 3, 5
      (1L, Date.valueOf("2024-01-05"), 4L)
    ).toDF("user_id", "d", "n")
    val got = Temporal.interpolate(daily, "user_id", "d", "n")
      .select("d", "is_observed", "n")
      .as[(Date, Boolean, Double)].collect()
      .map(r => r._1.toString -> ((r._2, r._3))).toMap
    assert(got("2024-01-01") == ((true, 1.0)))
    assert(got("2024-01-02") == ((false, 3.0)))
    assert(got("2024-01-03") == ((false, 5.0)))
    assert(got("2024-01-04") == ((true, 7.0)))
    assert(got("2024-01-05") == ((true, 4.0)))
  }

  test("interpolate: fractional slopes round at 6, observed rows stay exact") {
    val daily = Seq(
      (1L, Date.valueOf("2024-01-01"), 0L),
      (1L, Date.valueOf("2024-01-04"), 1L) // slope 1/3
    ).toDF("user_id", "d", "n")
    val got = Temporal.interpolate(daily, "user_id", "d", "n")
      .select("d", "n").as[(Date, Double)].collect()
      .map(r => r._1.toString -> r._2).toMap
    assert(got("2024-01-02") == 0.333333)
    assert(got("2024-01-03") == 0.666667)
  }

  test("ewma: renormalized geometric weights, exact hand values") {
    val df = Seq(
      ("a", 1L, 1L, 1.0), ("a", 2L, 2L, 2.0), ("a", 3L, 3L, 4.0),
      ("b", 1L, 4L, 10.0) // second key: no cross-key leakage
    ).toDF("k", "t", "id", "x")
    val got = Temporal.ewma(df, "k", "t", "id", "x")
      .select("k", "t", "ewma").as[(String, Long, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    // a@1: 1; a@2: (0.5*1 + 2)/1.5; a@3: (0.25 + 1 + 4)/1.75; b@1: 10
    assert(got(("a", 1L)) == 1.0)
    assert(got(("a", 2L)) == 1.666667)
    assert(got(("a", 3L)) == 3.0)
    assert(got(("b", 1L)) == 10.0)
  }

  test("ewma: span truncates the kernel and renormalizes over it") {
    val df = Seq(("a", 1L, 1L, 1.0), ("a", 2L, 2L, 2.0), ("a", 3L, 3L, 4.0))
      .toDF("k", "t", "id", "x")
    val got = Temporal.ewma(df, "k", "t", "id", "x", span = 2)
      .select("t", "ewma").as[(Long, Double)].collect().toMap
    // t=3 sees only [2, 4]: (0.5*2 + 4) / 1.5
    assert(got(3L) == 3.333333)
  }

  test("acf: alternating series gives -1 at lag 1 and +1 at lag 2") {
    val series = (1 to 10)
      .map(t => (t.toLong, if (t % 2 == 1) 1.0 else 2.0)).toDF("t", "v")
    val got = Temporal.acf(series, "t", "v", maxLag = 2)
      .select("lag", "acf", "n_pairs").as[(Int, Double, Long)]
      .collect().sortBy(_._1).toSeq
    assert(got == Seq((1, -1.0, 9L), (2, 1.0, 8L)))
  }

  test("seasonalDecompose: pure weekly pattern decomposes exactly") {
    // 21 days from Mon Jan 1; Sundays spike to 17, everything else 10:
    // full-window trend = (6*10 + 17)/7 = 11, seasonal = +6 Sun / -1 rest,
    // residual 0 wherever the trend is defined
    val days = (0 until 21).map { i =>
      val d = Date.valueOf(java.time.LocalDate.of(2024, 1, 1).plusDays(i))
      val v = if (java.time.LocalDate.of(2024, 1, 1).plusDays(i)
        .getDayOfWeek == java.time.DayOfWeek.SUNDAY) 17.0 else 10.0
      (d, v)
    }.toDF("day", "v")
    val rows = Temporal.seasonalDecompose(days, "day", "v")
      .select("day", "dow", "trend", "seasonal", "residual")
      .as[(Date, Int, Option[Double], Option[Double], Option[Double])]
      .collect().map(r => r._1.toString -> r).toMap
    assert(rows("2024-01-01")._3.isEmpty, "edge day has no full window")
    val wed = rows("2024-01-10")
    assert((wed._3, wed._4, wed._5) == (Some(11.0), Some(-1.0), Some(0.0)))
    assert(rows("2024-01-14")._2 == 0, "Sunday maps to dow 0")
    assert(rows("2024-01-14")._4.contains(6.0))
    assert(rows("2024-01-14")._5.contains(0.0))
  }

  test("backlogSweep: hand intervals — same-date close-before-open, peak " +
    "and first peak date exact") {
    // supplier 1: items open [d1,d3), [d1,d2), [d2,d4) — at d2 one closes
    // and one opens (net 0), so concurrency is 2 at d1, 2 at d2, 1 at d3:
    // peak 2 FIRST at d1. supplier 2: single item, peak 1.
    val li = Seq(
      (100L, 1L, "1995-01-03"), // ships d3
      (101L, 1L, "1995-01-02"), // ships d2
      (102L, 1L, "1995-01-04"), // ships d4 (opens d2)
      (103L, 2L, "1995-01-05")
    ).toDF("l_orderkey", "l_suppkey", "l_shipdate")
    val o = Seq(
      (100L, "1995-01-01"), (101L, "1995-01-01"),
      (102L, "1995-01-02"), (103L, "1995-01-01")
    ).toDF("o_orderkey", "o_orderdate")
    val got = Temporal.backlogSweep(li, o)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDate(2).toString))
    assert(got.toSeq == Seq((1L, 2L, "1995-01-01"), (2L, 1L, "1995-01-01")))
  }
  test("theilSen: median pairwise slope resists the outlier OLS bends to") {
    import java.sql.Date
    val daily = Seq(
      (Date.valueOf("2024-01-01"), 0L), (Date.valueOf("2024-01-02"), 1L),
      (Date.valueOf("2024-01-03"), 2L), (Date.valueOf("2024-01-04"), 100L)
    ).toDF("day", "cnt")
    // slopes: 1,1,1 among the clean days; 33.3/49.5/98 into the outlier;
    // lower median of 6 at position 3 -> slope 1 (the robust answer)
    val got = Temporal.theilSen(daily, "day", "cnt")
      .as[(Long, Long, Long, Long, Double)].collect().head
    assert(got._1 == 4L && got._2 == 6L && got._5 == 1.0)

    // odd pair count: exact middle pair selected with its rational
    val odd = Seq(
      (Date.valueOf("2024-01-01"), 1L), (Date.valueOf("2024-01-02"), 2L),
      (Date.valueOf("2024-01-03"), 10L)).toDF("day", "cnt")
    val g2 = Temporal.theilSen(odd, "day", "cnt")
      .as[(Long, Long, Long, Long, Double)].collect().head
    assert(g2 == ((3L, 3L, 9L, 2L, 4.5)))
  }

  test("fifoAllocate: hand case — splits, single lots, and a shortfall") {
    // supply lots [0,5), [5,8); demands [0,4), [4,7), [7,9):
    // d1 -> 1 lot/4; d2 -> 2 lots/3 (1 from lot1, 2 from lot2);
    // d3 -> 1 lot/1, short 1
    val sup = Seq(("p", 5L, 1), ("p", 3L, 2)).toDF("k", "q", "seq")
    val dem = Seq(("p", 4L, 1), ("p", 3L, 2), ("p", 2L, 3))
      .toDF("k", "q", "seq")
    val got = Temporal.fifoAllocate(sup, dem, "k", "q", Seq("seq"))
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq((1L, 2L, 6L, 5L, 1L), (2L, 1L, 3L, 3L, 0L)))
  }

  test("fifoAllocate: demand with no supply at all lands in the 0-lot " +
    "bucket; zero-qty rows are dropped") {
    val sup = Seq(("a", 5L, 1), ("b", 0L, 1)).toDF("k", "q", "seq")
    val dem = Seq(("a", 5L, 1), ("b", 2L, 1)).toDF("k", "q", "seq")
    val got = Temporal.fifoAllocate(sup, dem, "k", "q", Seq("seq"))
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    // a: exactly served from one lot; b: supply row was zero-qty ->
    // dropped -> unserved
    assert(got == Seq((0L, 1L, 2L, 0L, 2L), (1L, 1L, 5L, 5L, 0L)))
  }

  test("timeWeightedAvg: holding-duration weights, last sample weighs 0, " +
    "single-sample key is NULL") {
    val df = Seq(
      (1L, Timestamp.valueOf("2024-01-01 00:00:00"), 10.0, 1L),
      (1L, Timestamp.valueOf("2024-01-01 00:00:10"), 20.0, 2L),
      (1L, Timestamp.valueOf("2024-01-01 00:00:30"), 99.0, 3L),
      (2L, Timestamp.valueOf("2024-01-01 00:00:00"), 7.0, 4L)
    ).toDF("user_id", "ts", "value", "event_id")
    val got = Temporal.timeWeightedAvg(df, "user_id", "ts", "value",
      "event_id").orderBy("user_id").collect()
    // user 1: (10*10s + 20*20s)/30s = 16.666667; the 99 holds 0 seconds
    assert(got(0).getLong(1) == 3L && got(0).getLong(2) == 30000000L)
    assert(got(0).getDouble(3) == 16.666667)
    assert(got(1).getLong(1) == 1L && got(1).getLong(2) == 0L)
    assert(got(1).isNullAt(3))
  }

  test("leadLagCorrelation: perfect correlation at the true lag, " +
    "partial below it") {
    // orders on days 0..3 with counts 1,2,4,3; shipments exactly one day
    // later with the same counts -> r(lag 1) = 1 over all 4 days
    def d(day: Int) = Date.valueOf(java.time.LocalDate.ofEpochDay(day.toLong))
    val orders = Seq(0 -> 1, 1 -> 2, 2 -> 4, 3 -> 3)
      .flatMap { case (day, n) => Seq.fill(n)(d(day)) }
      .toDF("o_orderdate")
    val li = Seq(1 -> 1, 2 -> 2, 3 -> 4, 4 -> 3)
      .flatMap { case (day, n) => Seq.fill(n)(d(day)) }
      .toDF("l_shipdate")
    val byLag = Temporal.leadLagCorrelation(orders, li, maxLag = 2)
      .as[(Long, Long, Option[Double])].collect()
      .map { case (l, n, r) => l -> ((n, r)) }.toMap
    // sqrt(v)*sqrt(v) reconstructs v only to 1 ulp, so r sits within an
    // ulp of 1 — identically so in any IEEE engine (the parity the
    // oracle relies on), hence tolerance here, exactness cross-engine
    assert(byLag(1L)._1 == 4L &&
      byLag(1L)._2.exists(r => math.abs(r - 1.0) < 1e-12))
    // lag 0: 3 co-observed days (1..3): x=(2,4,3), y=(1,2,4) -> |r| < 1
    assert(byLag(0L)._1 == 3L && byLag(0L)._2.exists(r => math.abs(r) < 1.0))
  }

  test("leadLagCorrelation: zero-variance series yield NULL r, not NaN") {
    def d(day: Int) = Date.valueOf(java.time.LocalDate.ofEpochDay(day.toLong))
    val orders = Seq(d(0), d(1)).toDF("o_orderdate") // constant x = 1
    val li = Seq(d(0), d(1)).toDF("l_shipdate")
    val got = Temporal.leadLagCorrelation(orders, li, maxLag = 0)
      .as[(Long, Long, Option[Double])].collect().toSeq
    assert(got == Seq((0L, 2L, None)))
  }

  test("seasonalNaiveBacktest: hand series - exact cents and WAPE") {
    def d(day: Int) = Date.valueOf(java.time.LocalDate.ofEpochDay(day.toLong))
    // one order per day, days 0..8; price 100.00 on days 0..6, then
    // 110.00 (day 7), 95.50 (day 8): only days 7 and 8 have a 7-back
    // forecast. day 7: slot 0, err 10.00; day 8: slot 1, err 4.50
    val orders = ((0 to 6).map(i => (d(i), 100.00)) ++
      Seq((d(7), 110.00), (d(8), 95.50)))
      .toDF("o_orderdate", "o_totalprice")
    val got = Temporal.seasonalNaiveBacktest(orders)
      .as[(Long, Long, Long, Long, Double)].collect().toSeq
    // wape slot0 = 1000/11000 = .090909; slot1 = 450/9550 = .047120
    assert(got == Seq((0L, 1L, 1000L, 11000L, 0.090909),
      (1L, 1L, 450L, 9550L, 0.047120)))
  }
}
