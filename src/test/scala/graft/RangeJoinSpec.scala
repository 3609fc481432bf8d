package graft

import org.apache.spark.sql.AnalysisException
import org.apache.spark.sql.functions._
import graft.operators.RangeJoin

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private def points = Seq(
    (1L, 0L), (2L, 99L), (3L, 100L), (4L, 150L), (5L, 200L), (6L, 201L),
    (7L, 1000L)
  ).toDF("pid", "t")

  private def intervals = Seq(
    (10L, 100L, 200L), // inclusive both ends; spans two 100-bins
    (11L, 150L, 150L), // degenerate single-instant interval
    (12L, 900L, 1100L) // spans three bins
  ).toDF("iid", "lo", "hi")

  test("binned result equals the naive cross-join filter, boundaries inclusive") {
    val binned = RangeJoin.pointInInterval(points, "t", intervals, "lo", "hi",
        binWidth = 100L)
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    val naive = points.crossJoin(intervals)
      .filter(col("t") >= col("lo") && col("t") <= col("hi"))
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    assert(binned == naive)
    // the inclusive ends and the instant interval are all present
    assert(binned.contains((3L, 10L)) && binned.contains((5L, 10L)))
    assert(binned == Set((3L, 10L), (4L, 10L), (5L, 10L), (4L, 11L), (7L, 12L)))
  }

  test("bin width much smaller or larger than intervals changes cost, never results") {
    for (w <- Seq(7L, 1000L)) {
      val got = RangeJoin.pointInInterval(points, "t", intervals, "lo", "hi",
          binWidth = w)
        .select("pid", "iid").as[(Long, Long)].collect().toSet
      assert(got == Set((3L, 10L), (4L, 10L), (5L, 10L), (4L, 11L), (7L, 12L)),
        s"binWidth $w")
    }
  }

  test("negative timestamps bin correctly (floor, not truncate-toward-zero)") {
    val p = Seq((1L, -150L), (2L, -50L)).toDF("pid", "t")
    val i = Seq((10L, -160L, -140L)).toDF("iid", "lo", "hi")
    val got = RangeJoin.pointInInterval(p, "t", i, "lo", "hi", binWidth = 100L)
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 10L)))
  }

  test("an interval spanning too many bins fails fast instead of exploding") {
    val wide = Seq((99L, 0L, 1000000L)).toDF("iid", "lo", "hi")
    val ex = intercept[Exception] {
      RangeJoin.pointInInterval(points, "t", wide, "lo", "hi",
        binWidth = 100L, maxBinsPerInterval = 64).count()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => e.getMessage +: messages(e.getCause))
    assert(messages(ex).exists(m => m != null && m.contains("RangeJoin")),
      s"expected the guard's message, got: $ex")
  }
}
