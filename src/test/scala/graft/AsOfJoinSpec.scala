package graft

import java.sql.Timestamp
import graft.operators.AsOfJoin

/** Edge-case tests for the as-of join (the oracle covers the bulk data path;
  * these pin the boundary semantics).
  */
class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private val left = Seq(
    (1L, 10L, ts("2024-01-01 10:00:00"), "a"),
    (2L, 10L, ts("2024-01-01 12:00:00"), "b"),
    (3L, 10L, ts("2024-01-01 09:00:00"), "early"), // before any right row
    (4L, 20L, ts("2024-01-01 12:00:00"), "other-key"),
    (5L, 30L, ts("2024-01-01 12:00:00"), "no-right-key")
  ).toDF("id", "k", "t", "tag")

  private val right = Seq(
    (10L, ts("2024-01-01 10:00:00"), 100.0), // equal ts as left id=1 -> inclusive
    (10L, ts("2024-01-01 11:30:00"), 200.0),
    (20L, ts("2024-01-01 11:00:00"), 300.0)
  ).toDF("k", "rt", "rv")

  private lazy val out = AsOfJoin.leftAsOf(left, right, "k", "t", "rt", Seq("rv"))
    .select("id", "rv").as[(Long, Option[Double])].collect().toMap

  test("matches the latest right row at-or-before the left time (inclusive)") {
    assert(out(1L).contains(100.0)) // equal timestamp matches
    assert(out(2L).contains(200.0)) // latest of two priors
  }

  test("left rows before any right row, or with unseen keys, get null") {
    assert(out(3L).isEmpty)
    assert(out(5L).isEmpty)
  }

  test("keys do not leak across partitions") {
    assert(out(4L).contains(300.0))
  }

  test("output keeps exactly the left rowcount and columns + payload") {
    val df = AsOfJoin.leftAsOf(left, right, "k", "t", "rt", Seq("rv"))
    assert(df.count() == 5)
    assert(df.columns.toSeq == Seq("id", "k", "t", "tag", "rv"))
  }

  test("a matched right row's NULL payload stays NULL (struct atomicity)") {
    val l = Seq((1L, 10L, ts("2024-01-01 12:00:00"))).toDF("id", "k", "t")
    val r = Seq(
      (10L, ts("2024-01-01 10:00:00"), Option(100.0), "x"),
      (10L, ts("2024-01-01 11:30:00"), Option.empty[Double], "y")
    ).toDF("k", "rt", "rv", "rw")
    val out = AsOfJoin.leftAsOf(l, r, "k", "t", "rt", Seq("rv", "rw"))
      .select("rv", "rw").as[(Option[Double], String)].head()
    // the matched (latest) right row has rv=NULL: it must surface as NULL,
    // not as the stale 100.0 from the older row — and rv/rw must come from
    // the SAME right row
    assert(out == ((None, "y")))
  }

  test("colliding payload names are rejected") {
    intercept[IllegalArgumentException] {
      AsOfJoin.leftAsOf(left, right.withColumnRenamed("rv", "tag"),
        "k", "t", "rt", Seq("tag"))
    }
  }

  test("forward direction: earliest at-or-after match, inclusive equal, " +
    "nothing-after yields null") {
    val l2 = Seq(
      (1L, 10L, ts("2024-01-01 10:00:00"), "eq"),      // equal-ts right
      (2L, 10L, ts("2024-01-01 10:30:00"), "between"), // next is 11:30
      (3L, 10L, ts("2024-01-01 12:00:00"), "after-all")
    ).toDF("id", "k", "t", "tag")
    val got = AsOfJoin.leftAsOfForward(l2, right, "k", "t", "rt", Seq("rv"))
      .select("id", "rv").as[(Long, Option[Double])].collect().toMap
    assert(got(1L).contains(100.0)) // inclusive at the same instant
    assert(got(2L).contains(200.0)) // the NEXT one, not the previous
    assert(got(3L).isEmpty)         // no right row at-or-after
  }

  test("right-side ties on (key, time) resolve to the largest payload " +
    "tuple — deterministic under any partitioning") {
    val l2 = Seq((1L, 10L, ts("2024-01-01 12:00:00"), "x"))
      .toDF("id", "k", "t", "tag")
    val dupRight = Seq(
      (10L, ts("2024-01-01 11:00:00"), 100.0),
      (10L, ts("2024-01-01 11:00:00"), 300.0), // same instant, larger value
      (10L, ts("2024-01-01 11:00:00"), 200.0)
    ).toDF("k", "rt", "rv").repartition(3) // scatter the tie rows
    val got = AsOfJoin.leftAsOf(l2, dupRight, "k", "t", "rt", Seq("rv"))
      .select("id", "rv").as[(Long, Option[Double])].collect().toMap
    assert(got(1L).contains(300.0))
  }

  test("tolerance: stale matches null out atomically at the exact " +
    "microsecond boundary, fresh matches survive") {
    // id=1 matches at 0 lag (inside any tolerance); id=2's latest match
    // is 30:00.000001 old — ONE microsecond past a 30-minute tolerance
    val l2 = Seq(
      (1L, 10L, ts("2024-01-01 10:00:00"), "x"),
      (2L, 10L, ts("2024-01-01 12:00:00.000001"), "y")
    ).toDF("id", "k", "t", "tag")
    val r2 = Seq(
      (10L, ts("2024-01-01 10:00:00"), 100.0),
      (10L, ts("2024-01-01 11:30:00"), 200.0)
    ).toDF("k", "rt", "rv")
    val tol = 1800L * 1000000L
    val got = AsOfJoin.leftAsOfTolerance(l2, r2, "k", "t", "rt", Seq("rv"), tol)
      .select("id", "rv").as[(Long, Option[Double])].collect().toMap
    assert(got(1L).contains(100.0))
    assert(got(2L).isEmpty) // 1 microsecond past the bound
    // exactly AT the bound is inclusive
    val l3 = Seq((3L, 10L, ts("2024-01-01 12:00:00"), "z"))
      .toDF("id", "k", "t", "tag")
    val at = AsOfJoin.leftAsOfTolerance(l3, r2, "k", "t", "rt", Seq("rv"), tol)
      .select("id", "rv").as[(Long, Option[Double])].collect().toMap
    assert(at(3L).contains(200.0))
  }

  test("nearest: closer side wins, exact equidistance goes backward") {
    val r2 = Seq(
      (10L, ts("2024-01-01 10:00:00"), 100.0),
      (10L, ts("2024-01-01 11:00:00"), 200.0)
    ).toDF("k", "rt", "rv")
    val l2 = Seq(
      (1L, 10L, ts("2024-01-01 10:10:00")), // 10 min back vs 50 min fwd
      (2L, 10L, ts("2024-01-01 10:50:00")), // 50 min back vs 10 min fwd
      (3L, 10L, ts("2024-01-01 10:30:00")), // EXACT tie -> backward
      (4L, 10L, ts("2024-01-01 09:00:00")), // nothing before -> forward
      (5L, 10L, ts("2024-01-01 12:00:00")), // nothing after -> backward
      (6L, 99L, ts("2024-01-01 10:30:00"))  // no right rows at all
    ).toDF("id", "k", "t")
    val got = AsOfJoin.leftAsOfNearest(l2, r2, "k", "t", "rt", Seq("rv"))
      .select("id", "rv").as[(Long, Option[Double])].collect().toMap
    assert(got(1L).contains(100.0))
    assert(got(2L).contains(200.0))
    assert(got(3L).contains(100.0)) // pinned: ties go backward
    assert(got(4L).contains(100.0))
    assert(got(5L).contains(200.0))
    assert(got(6L).isEmpty)
  }

  test("nearest: one-microsecond asymmetry breaks the tie") {
    val r2 = Seq(
      (10L, ts("2024-01-01 10:00:00"), 100.0),
      (10L, ts("2024-01-01 11:00:00"), 200.0)
    ).toDF("k", "rt", "rv")
    // 10:30:00.000001 sits one microsecond CLOSER to 11:00 than to 10:00
    val l2 = Seq((1L, 10L, ts("2024-01-01 10:30:00.000001")))
      .toDF("id", "k", "t")
    val got = AsOfJoin.leftAsOfNearest(l2, r2, "k", "t", "rt", Seq("rv"))
      .select("id", "rv").as[(Long, Option[Double])].collect().toMap
    assert(got(1L).contains(200.0))
  }
}
