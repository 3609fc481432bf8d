package graft

import java.sql.Timestamp
import org.apache.spark.sql.DataFrame
import graft.ops.IncrementalAgg

/** Incremental aggregate maintenance: merged partials must equal the full
  * recompute, merging must be associative, and empty batches must be
  * no-ops — the algebraic contract that makes partial state safe to keep.
  */
class IncrementalAggSpec extends SparkSpec {
  import spark.implicits._

  private def orders(days: Seq[(String, Double)]): DataFrame =
    days.zipWithIndex.map { case ((d, p), i) =>
      (i.toLong, Timestamp.valueOf(s"$d 00:00:00"), p)
    }.toDF("o_orderkey", "o_orderdate", "o_totalprice")

  private val all = orders(Seq(
    "2000-01-01" -> 10.0, "2000-01-01" -> 20.0, "2000-01-02" -> 5.5,
    "2000-01-03" -> 7.25, "2000-01-03" -> 2.75, "2000-01-03" -> 1.0))

  private def collectFinal(state: DataFrame): Map[String, (Double, Long, Double)] =
    IncrementalAgg.finalizeDaily(state)
      .as[(java.sql.Date, Double, Long, Double)].collect()
      .map(r => r._1.toString -> ((r._2, r._3, r._4))).toMap

  test("merge of split partials equals the full recompute") {
    val a = IncrementalAgg.dailyOrderPartials(all.filter("o_orderkey < 3"))
    val b = IncrementalAgg.dailyOrderPartials(all.filter("o_orderkey >= 3"))
    val merged = collectFinal(IncrementalAgg.mergePartials(Seq(a, b)))
    val full = collectFinal(IncrementalAgg.dailyOrderPartials(all))
    assert(merged == full)
    // hand check one group: 2000-01-03 -> sum 11.0 over 3 orders
    assert(merged("2000-01-03") == ((11.0, 3L, 3.6667)))
  }

  test("merging is associative and order-insensitive") {
    val parts = Seq("o_orderkey < 2", "o_orderkey >= 2 AND o_orderkey < 4",
      "o_orderkey >= 4").map(p =>
      IncrementalAgg.dailyOrderPartials(all.filter(p)))
    val leftFold = collectFinal(IncrementalAgg.mergePartials(
      Seq(IncrementalAgg.mergePartials(parts.take(2)), parts(2))))
    val rightFold = collectFinal(IncrementalAgg.mergePartials(
      Seq(parts(0), IncrementalAgg.mergePartials(parts.drop(1)))))
    val flat = collectFinal(IncrementalAgg.mergePartials(parts.reverse))
    assert(leftFold == rightFold && rightFold == flat)
  }

  test("avg_order rounds a decimal half-tie UP, in exact integer space") {
    // The CORRECTNESS_r06/r07 failure class: a 2-dp-exact sum over n=8
    // whose quotient ends exactly in 5 at the 5th decimal.
    // 7 × 264515.44 + 264515.45 = 2116123.53; /8 = 264515.44125 — a true
    // tie at 4 dp. round(double, 4) is engine-dependent here (Spark's
    // decimal-string HALF_UP says .4413, rounding the binary double —
    // one ulp below the tie — says .4412). The integer fixed-point rule
    // (cents*200 + n) div (2n) is half-up by construction:
    // (211612353*200 + 8) div 16 = 2645154413 → 264515.4413.
    val tie = orders(Seq.fill(7)("2000-02-01" -> 264515.44) :+
      ("2000-02-01" -> 264515.45))
    val out = collectFinal(IncrementalAgg.dailyOrderPartials(tie))
    assert(out("2000-02-01") == ((2116123.53, 8L, 264515.4413)))
  }

  test("avg_order below the tie still rounds down (half-up only at ties)") {
    // 3 × 1.00 + 0.01 = 3.01 over 4 → 0.7525 exactly at 4 dp (no 5th
    // decimal), and 10.00 + 0.01 over 3 → 3.336666... → 3.3367.
    val df = orders(Seq("2000-03-01" -> 1.0, "2000-03-01" -> 1.0,
      "2000-03-01" -> 1.0, "2000-03-01" -> 0.01,
      "2000-03-02" -> 10.0, "2000-03-02" -> 0.01))
    val out = collectFinal(IncrementalAgg.dailyOrderPartials(df))
    assert(out("2000-03-01") == ((3.01, 4L, 0.7525)))
    assert(out("2000-03-02") == ((10.01, 2L, 5.005)))
  }

  test("empty batch is a no-op") {
    val base = IncrementalAgg.dailyOrderPartials(all)
    val empty = IncrementalAgg.dailyOrderPartials(all.filter("o_orderkey < 0"))
    assert(collectFinal(IncrementalAgg.mergePartials(Seq(base, empty))) ==
      collectFinal(base))
  }

  // ---- joinDelta: insert-only delta rule for a join view ----

  private val factAll = Seq((1L, 10, "a"), (2L, 10, "b"), (3L, 20, "c"),
    (4L, 30, "d"), (5L, 20, "e")).toDF("fid", "k", "ftag")
  private val dimAll = Seq((10, "X"), (20, "Y"), (40, "Z"))
    .toDF("k", "dtag")

  private def viewRows(df: DataFrame): Set[(Long, Int, String, String)] =
    df.select("fid", "k", "ftag", "dtag")
      .as[(Long, Int, String, String)].collect().toSet

  test("joinDelta: standing view + delta equals the full-recompute join") {
    val (aOld, aDelta) = (factAll.filter("fid <= 3"), factAll.filter("fid > 3"))
    val (bOld, bDelta) = (dimAll.filter("k <= 10"), dimAll.filter("k > 10"))
    val standing = aOld.join(bOld, "k")
    val maintained = standing.unionByName(
      IncrementalAgg.joinDelta(aOld, aDelta, bOld, bDelta, "k"))
    assert(viewRows(maintained) == viewRows(factAll.join(dimAll, "k")))
  }

  test("joinDelta terms are disjoint: no row is produced twice") {
    val (aOld, aDelta) = (factAll.filter("fid <= 3"), factAll.filter("fid > 3"))
    val (bOld, bDelta) = (dimAll.filter("k <= 10"), dimAll.filter("k > 10"))
    val standing = aOld.join(bOld, "k")
    val maintained = standing.unionByName(
      IncrementalAgg.joinDelta(aOld, aDelta, bOld, bDelta, "k"))
    assert(maintained.count() == factAll.join(dimAll, "k").count())
  }

  test("joinDelta with empty deltas is empty") {
    val none = factAll.filter("fid < 0")
    val noDim = dimAll.filter("k < 0")
    assert(IncrementalAgg.joinDelta(factAll, none, dimAll, noDim, "k")
      .count() == 0)
  }

  test("topK: merging per-batch top-k and re-truncating equals the full " +
    "recompute, including cross-batch displacement and ties") {
    import org.apache.spark.sql.functions.col
    // group g: batch A holds [10, 9, 8], batch B [9.5, 1] — B's 9.5 must
    // displace A's 9 in the merged top-2; tie 9.5 vs 9.5 resolved by id
    val a = Seq(("g", 1L, 10.0), ("g", 2L, 9.0), ("g", 3L, 8.0),
      ("h", 4L, 1.0)).toDF("grp", "id", "v")
    val b = Seq(("g", 5L, 9.5), ("g", 6L, 1.0), ("g", 7L, 9.5))
      .toDF("grp", "id", "v")
    val ord = Seq(col("v").desc, col("id").asc)
    def top(df: org.apache.spark.sql.DataFrame) =
      IncrementalAgg.topK(df, Seq("grp"), ord, 2)
    val maintained = top(top(a).unionByName(top(b)))
      .select("grp", "rank", "id", "v")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .toSet
    val full = top(a.unionByName(b)).select("grp", "rank", "id", "v")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .toSet
    assert(maintained == full)
    assert(full == Set(("g", 1L, 1L), ("g", 2L, 5L), ("h", 1L, 4L)))
  }

  test("topK: a stale rank column in the state is re-derived, not trusted") {
    import org.apache.spark.sql.functions.{col, lit}
    val state = Seq(("g", 1L, 5.0)).toDF("grp", "id", "v")
      .withColumn("rank", lit(99L))
    val got = IncrementalAgg.topK(state, Seq("grp"),
      Seq(col("v").desc, col("id")), 2).collect().head
    assert(got.getAs[Long]("rank") == 1L)
  }
}
