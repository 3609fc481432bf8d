package graft

import java.sql.Timestamp
import graft.streaming.EventAggs

/** Behavioral event analytics: cohort retention and top path trigrams
  * against hand-built event streams.
  */
class EventAnalyticsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("retention: cohort is first-seen day, offsets count distinct users") {
    val events = Seq(
      // user 1: cohort Jan 1, returns day 1 and day 2 (twice on day 2)
      (1L, 1L, ts("2024-01-01 10:00:00"), "view", 0.0, "{}"),
      (2L, 1L, ts("2024-01-02 10:00:00"), "view", 0.0, "{}"),
      (3L, 1L, ts("2024-01-03 10:00:00"), "view", 0.0, "{}"),
      (4L, 1L, ts("2024-01-03 11:00:00"), "click", 0.0, "{}"),
      // user 2: same cohort, only day 0
      (5L, 2L, ts("2024-01-01 09:00:00"), "view", 0.0, "{}"),
      // user 3: later cohort, beyond-window activity excluded
      (6L, 3L, ts("2024-01-05 09:00:00"), "view", 0.0, "{}"),
      (7L, 3L, ts("2024-01-20 09:00:00"), "view", 0.0, "{}")
    ).toDF("event_id", "user_id", "ts", "event_type", "value", "props")
    val got = EventAggs.retention(events, maxOffsetDays = 7)
      .collect()
      .map(r => (r.getDate(0).toString, r.getInt(1)) -> r.getLong(2)).toMap
    assert(got(("2024-01-01", 0)) == 2L)
    assert(got(("2024-01-01", 1)) == 1L)
    assert(got(("2024-01-01", 2)) == 1L, "two same-day events count one user")
    assert(got(("2024-01-05", 0)) == 1L)
    assert(!got.contains(("2024-01-05", 15)), "offset beyond window excluded")
  }

  test("topPaths: trigrams follow per-user (ts, event_id) order across users") {
    def e(id: Long, user: Long, t: String, typ: String) =
      (id, user, ts(t), typ, 0.0, "{}")
    val events = Seq(
      e(1, 1, "2024-01-01 10:00:00", "view"),
      e(2, 1, "2024-01-01 10:01:00", "click"),
      e(3, 1, "2024-01-01 10:02:00", "purchase"),
      e(4, 2, "2024-01-01 11:00:00", "view"),
      e(5, 2, "2024-01-01 11:01:00", "click"),
      e(6, 2, "2024-01-01 11:02:00", "purchase"),
      e(7, 2, "2024-01-01 11:03:00", "view"),
      // same-timestamp tie inside user 3: event_id orders it
      e(8, 3, "2024-01-01 12:00:00", "view"),
      e(9, 3, "2024-01-01 12:00:00", "click"),
      e(10, 3, "2024-01-01 12:00:00", "error")
    ).toDF("event_id", "user_id", "ts", "event_type", "value", "props")
    val got = EventAggs.topPaths(events, k = 10)
      .collect().map(r =>
        (r.getString(0), r.getString(1), r.getString(2)) -> r.getLong(3)).toMap
    assert(got(("view", "click", "purchase")) == 2L)
    assert(got(("click", "purchase", "view")) == 1L)
    assert(got(("view", "click", "error")) == 1L, "tie resolved by event_id")
    assert(got.size == 3, "paths never span users")
  }

  test("rfmSegments: clean quartiles score 1..4 on every axis") {
    // user k: k events of value 10k each, last active day 9+k — so f, m
    // rise with k while recency falls, and every axis scores k for user k
    val rows = for {
      k <- 1 to 4
      j <- 1 to k
    } yield ((k * 10 + j).toLong, k.toLong,
      ts(f"2024-01-${9 + k}%02d 0$j:00:00"), "view", k * 10.0, "{}")
    val events = rows.toDF("event_id", "user_id", "ts", "event_type", "value", "props")
    val got = EventAggs.rfmSegments(events)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getString(7)))).toMap
    assert(got(1L) == ((3L, 1L, 10.0, "111")))
    assert(got(2L) == ((2L, 2L, 40.0, "222")))
    assert(got(3L) == ((1L, 3L, 90.0, "333")))
    assert(got(4L) == ((0L, 4L, 160.0, "444")))
  }

  test("lastTouchAttribution: latest preceding touch wins; same-ts ties by event_id") {
    val events = Seq(
      (1L, 1L, ts("2024-01-01 10:00:00"), "view", 0.0, "{}"),
      (2L, 1L, ts("2024-01-01 11:00:00"), "click", 0.0, "{}"),
      (3L, 1L, ts("2024-01-01 12:00:00"), "purchase", 9.0, "{}"),
      // user 2: purchase BEFORE any touch -> unattributed
      (4L, 2L, ts("2024-01-01 08:00:00"), "purchase", 5.0, "{}"),
      (5L, 2L, ts("2024-01-01 09:00:00"), "view", 0.0, "{}"),
      // user 3: two touches at the SAME instant -> higher event_id wins
      (6L, 3L, ts("2024-01-01 10:00:00"), "view", 0.0, "{}"),
      (7L, 3L, ts("2024-01-01 10:00:00"), "error", 0.0, "{}"),
      (8L, 3L, ts("2024-01-01 10:30:00"), "purchase", 2.0, "{}")
    ).toDF("event_id", "user_id", "ts", "event_type", "value", "props")
    val got = EventAggs.lastTouchAttribution(events)
      .collect().map(r => r.getLong(0) ->
        ((Option(r.get(4)).map(_.toString.toLong), Option(r.getString(5))))).toMap
    assert(got(3L) == ((Some(2L), Some("click"))))
    assert(got(4L) == ((None, None)), "no preceding touch, no credit")
    assert(got(8L) == ((Some(7L), Some("error"))), "tie resolved by event_id")
  }

  test("changepoint: CUSUM peaks at the level shift") {
    // daily counts 1,1,5,5 -> mu 3, cusum -2,-4,-2,0: day 2 is the shift
    val rows = Seq(
      (1L, ts("2024-01-01 10:00:00")),
      (2L, ts("2024-01-02 10:00:00"))) ++
      (3 to 7).map(i => (i.toLong, ts("2024-01-03 10:00:00"))) ++
      (8 to 12).map(i => (i.toLong, ts("2024-01-04 10:00:00")))
    val events = rows.map { case (id, t) => (id, 1L, t, "view", 0.0, "{}") }
      .toDF("event_id", "user_id", "ts", "event_type", "value", "props")
    val r = EventAggs.changepoint(events).collect().head
    assert(r.getDate(0).toString == "2024-01-02")
    assert(r.getDouble(1) == -4.0 && r.getDouble(2) == 3.0 && r.getLong(3) == 4L)
  }

  test("stickiness: trailing-7-day WAU counts a user once per window") {
    val events = Seq(
      (1L, 1L, ts("2024-01-01 10:00:00"), "view", 0.0, "{}"),
      (2L, 2L, ts("2024-01-01 11:00:00"), "view", 0.0, "{}"),
      (3L, 2L, ts("2024-01-03 09:00:00"), "view", 0.0, "{}"),
      (4L, 2L, ts("2024-01-03 10:00:00"), "click", 0.0, "{}")
    ).toDF("event_id", "user_id", "ts", "event_type", "value", "props")
    val got = EventAggs.stickiness(events)
      .collect().map(r => r.getDate(0).toString ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(got("2024-01-01") == ((2L, 2L, 1.0)))
    // day 3: DAU = u2 only; WAU = both (u1's day-1 activity supports it;
    // u2's two activity days count once)
    assert(got("2024-01-03") == ((1L, 2L, 0.5)))
    assert(got.size == 2, "only days with activity appear")
  }

  test("markovTransitions: Laplace-smoothed probs over the observed destinations") {
    def e(id: Long, user: Long, t: String, typ: String) =
      (id, user, ts(t), typ, 0.0, "{}")
    // user 1: a -> b -> a -> b gives cells (a,b)=2, (b,a)=1; k = 2
    val events = Seq(
      e(1, 1, "2024-01-01 10:00:00", "a"),
      e(2, 1, "2024-01-01 10:01:00", "b"),
      e(3, 1, "2024-01-01 10:02:00", "a"),
      e(4, 1, "2024-01-01 10:03:00", "b")
    ).toDF("event_id", "user_id", "ts", "event_type", "value", "props")
    val got = EventAggs.markovTransitions(events)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getDouble(3)))).toMap
    assert(got(("a", "b")) == ((2L, 0.75)))     // (2+1)/(2+2)
    assert(got(("b", "a")) == ((1L, 0.666667))) // (1+1)/(1+2)
    assert(got.size == 2)
  }

  test("ltvCurve: cohorted cumulative revenue and per-user LTV") {
    val events = Seq(
      (1L, 1L, ts("2024-01-01 10:00:00"), "purchase", 5.0, "{}"),
      (2L, 1L, ts("2024-01-02 10:00:00"), "purchase", 3.0, "{}"),
      (3L, 2L, ts("2024-01-01 12:00:00"), "purchase", 2.0, "{}"),
      (4L, 3L, ts("2024-01-02 09:00:00"), "purchase", 4.0, "{}")
    ).toDF("event_id", "user_id", "ts", "event_type", "value", "props")
    val got = EventAggs.ltvCurve(events)
      .select("cohort", "age_days", "revenue", "cum_revenue", "cohort_users",
        "ltv_per_user")
      .collect()
      .map(r => (r.getDate(0).toString, r.getInt(1)) ->
        ((r.getDouble(2), r.getDouble(3), r.getLong(4), r.getDouble(5))))
      .toMap
    // Jan-1 cohort: u1+u2 spend 7 on day 0, u1 adds 3 on day 1
    assert(got(("2024-01-01", 0)) == ((7.0, 7.0, 2L, 3.5)))
    assert(got(("2024-01-01", 1)) == ((3.0, 10.0, 2L, 5.0)))
    assert(got(("2024-01-02", 0)) == ((4.0, 4.0, 1L, 4.0)))
  }

  test("userSnapshot: recency, windowed frequency, value, breadth") {
    val events = Seq(
      (1L, 1L, ts("2024-01-01 10:00:00"), "view", 1.0, "{}"),
      (2L, 1L, ts("2024-01-10 10:00:00"), "purchase", 2.5, "{}"),
      (3L, 2L, ts("2024-01-10 09:00:00"), "view", 4.0, "{}")
    ).toDF("event_id", "user_id", "ts", "event_type", "value", "props")
    val got = EventAggs.userSnapshot(events)
      .collect().map(r => r.getLong(0) ->
        ((r.getInt(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getDouble(5), r.getLong(6)))).toMap
    // horizon = Jan 10; u1's Jan-1 view is outside 7d but inside 28d
    assert(got(1L) == ((0, 2L, 1L, 2L, 3.5, 2L)))
    assert(got(2L) == ((0, 1L, 1L, 1L, 4.0, 1L)))
  }

  test("typeBigrams: per-user adjacency only, (ts, event_id) tie order") {
    def t(s: String) = Timestamp.valueOf(s)
    val ev = Seq(
      // user 1: a -> b -> a; the b/a at 10:01 tie-breaks on event_id
      (1L, 10L, t("2024-01-01 10:00:00"), "a"),
      (2L, 10L, t("2024-01-01 10:01:00"), "b"),
      (3L, 10L, t("2024-01-01 10:01:00"), "a"),
      // user 2: c alone (no pair); never pairs with user 1's stream
      (4L, 20L, t("2024-01-01 10:00:30"), "c")
    ).toDF("event_id", "user_id", "ts", "event_type")
    val got = EventAggs.typeBigrams(ev)
      .collect().map(r => ((r.getString(0), r.getString(1)), r.getLong(2)))
      .toMap
    assert(got == Map(("a", "b") -> 1L, ("b", "a") -> 1L))
  }

  test("multiTouchAttribution: linear splits, u-shape 40/20/40 with " +
    "degenerations, out-of-window touches excluded") {
    def t(s: String) = Timestamp.valueOf(s)
    val ev = Seq(
      // user 1: three in-window touches (view, click, view) + purchase
      (1L, 10L, t("2024-01-10 09:00:00"), "view"),
      (2L, 10L, t("2024-01-10 10:00:00"), "click"),
      (3L, 10L, t("2024-01-10 11:00:00"), "view"),
      (4L, 10L, t("2024-01-10 12:00:00"), "purchase"),
      // user 2: one in-window + one 10 days stale
      (5L, 20L, t("2023-12-25 12:00:00"), "click"),
      (6L, 20L, t("2024-01-04 09:00:00"), "click"),
      (7L, 20L, t("2024-01-04 12:00:00"), "purchase")
    ).toDF("event_id", "user_id", "ts", "event_type")
    val lin = EventAggs.multiTouchAttribution(ev, model = "linear")
      .select("event_type", "n_touches", "credit_e6")
      .as[(String, Long, Long)].collect().toSeq
    // user 1: 1e6 div 3 = 333333 per touch; user 2: single 1000000
    assert(lin == Seq(("click", 2L, 333333L + 1000000L),
      ("view", 2L, 666666L)))
    val u = EventAggs.multiTouchAttribution(ev, model = "u_shaped")
      .select("event_type", "n_touches", "credit_e6")
      .as[(String, Long, Long)].collect().toSeq
    // user 1: first view 400000, middle click 200000, last view 400000;
    // user 2: single touch keeps 1000000
    assert(u == Seq(("click", 2L, 200000L + 1000000L),
      ("view", 2L, 800000L)))
    val e = intercept[IllegalArgumentException](
      EventAggs.multiTouchAttribution(ev, model = "shapley"))
    assert(e.getMessage.contains("model"))
  }

  test("pointInTimeTrainingSet: features strictly pre-cutoff, label " +
    "strictly from the window, no-history users excluded") {
    val events = Seq(
      // user 1: 2 events on 2 days before cutoff (one purchase), one
      // event inside the label window -> label 1
      (1L, ts("2024-01-20 10:00:00"), 1L, "view"),
      (2L, ts("2024-01-22 11:00:00"), 1L, "purchase"),
      (3L, ts("2024-01-25 09:00:00"), 1L, "click"),
      // user 2: pre-cutoff only -> label 0
      (4L, ts("2024-01-23 08:00:00"), 2L, "view"),
      // user 3: first seen inside the window -> EXCLUDED (no features)
      (5L, ts("2024-01-26 12:00:00"), 3L, "signup"),
      // user 4: activity only AFTER the label window -> label 0
      (6L, ts("2024-01-21 07:00:00"), 4L, "error"),
      (7L, ts("2024-01-31 00:00:00"), 4L, "view")
    ).toDF("event_id", "ts", "user_id", "event_type")
    val got = graft.streaming.EventAggs.pointInTimeTrainingSet(events)
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      (1L, 2L, 1L, 2L, 2L, 2L, 1L), // 2 events, 1 purchase, 2 days,
                                    // last on 01-22 -> 2 days back, 2 types
      (2L, 1L, 0L, 1L, 1L, 1L, 0L),
      (4L, 1L, 0L, 1L, 3L, 1L, 0L)))
  }

  test("latenessCensus: late iff behind the per-type running max by more " +
    "than the delay; first-of-stream never late") {
    val events = Seq(
      // type a, arrival by event_id: t=100min, then 95min (5min back -
      // inside the 10min delay, on time), then 85min (15min behind the
      // running max 100 - LATE), then 200min (new max)
      (1L, ts("2024-01-01 01:40:00"), 7L, "a"),
      (2L, ts("2024-01-01 01:35:00"), 7L, "a"),
      (3L, ts("2024-01-01 01:25:00"), 7L, "a"),
      (4L, ts("2024-01-01 03:20:00"), 7L, "a"),
      // type b: single event - no watermark yet, never late
      (5L, ts("2024-01-01 00:01:00"), 8L, "b")
    ).toDF("event_id", "ts", "user_id", "event_type")
    val got = graft.streaming.EventAggs.latenessCensus(events)
      .as[(String, Long, Long, Double)].collect().toSeq
    assert(got == Seq(("a", 4L, 1L, 0.25), ("b", 1L, 0L, 0.0)))
  }

  test("hourlyProfile: per-type hour shares in exact fixed point") {
    val events = Seq(
      (1L, ts("2024-01-01 09:10:00"), 1L, "click"),
      (2L, ts("2024-01-02 09:50:00"), 2L, "click"),
      (3L, ts("2024-01-01 17:00:00"), 1L, "click"),
      (4L, ts("2024-01-01 09:00:00"), 1L, "view")
    ).toDF("event_id", "ts", "user_id", "event_type")
    val got = graft.streaming.EventAggs.hourlyProfile(events)
      .as[(String, Long, Long, Double)].collect().toSeq
    assert(got == Seq(("click", 9L, 2L, 0.666667), ("click", 17L, 1L, 0.333333),
      ("view", 9L, 1L, 1.0)))
  }
}
