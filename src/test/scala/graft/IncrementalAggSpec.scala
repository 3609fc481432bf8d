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
}
