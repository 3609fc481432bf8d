package graft

import org.apache.spark.sql.functions._
import graft.operators.Skyline

/** 2-D skyline: equivalence to the naive dominance semantics, bucket-count
  * invariance (bucketing shapes the plan, never the answer), tie handling,
  * and the no-cartesian plan shape.
  */
class SkylineSpec extends SparkSpec {
  import spark.implicits._

  // deterministic pseudo-random points with deliberate duplicates and ties
  private def points = (1 to 300).map { i =>
    val x = (i * 37 % 100).toDouble
    val y = i * 53 % 50
    (i.toLong, x, y)
  }.toDF("id", "x", "y")

  /** Reference semantics: the O(n²) dominance filter, computed driver-side
    * on the collected fixture (trusted by inspection, never by plan).
    */
  private def naiveSkyline(rows: Seq[(Long, Double, Int)]): Set[Long] =
    rows.filter { case (_, ax, ay) =>
      !rows.exists { case (_, bx, by) =>
        bx <= ax && by >= ay && (bx < ax || by > ay)
      }
    }.map(_._1).toSet

  test("matches naive dominance semantics") {
    val expected = naiveSkyline(
      points.as[(Long, Double, Int)].collect().toSeq)
    val got = Skyline.skyline2D(points, "x", "y")
      .select("id").as[Long].collect().toSet
    assert(got == expected)
  }

  test("bucket count never changes the answer") {
    val base = Skyline.skyline2D(points, "x", "y", buckets = 256)
      .select("id").as[Long].collect().toSet
    for (b <- Seq(1, 3, 7, 1024)) {
      val alt = Skyline.skyline2D(points, "x", "y", buckets = b)
        .select("id").as[Long].collect().toSet
      assert(alt == base, s"buckets=$b diverged")
    }
  }

  test("duplicate frontier points all survive; dominated duplicates all drop") {
    val df = Seq(
      (1L, 1.0, 10), (2L, 1.0, 10), // duplicate frontier point
      (3L, 1.0, 9),                 // same x, smaller y -> dominated
      (4L, 0.5, 10),                // cheaper, same y -> dominates 1,2? no: y equal, x smaller -> dominates
      (5L, 2.0, 20)                 // pricier but taller -> frontier
    ).toDF("id", "x", "y")
    val got = Skyline.skyline2D(df, "x", "y")
      .select("id").as[Long].collect().toSet
    // 4 dominates 1 and 2 (x strictly smaller, y equal); 3 dominated by all
    assert(got == Set(4L, 5L))
  }

  test("degenerate single-x input keeps only the y-max rows") {
    val df = Seq((1L, 5.0, 1), (2L, 5.0, 9), (3L, 5.0, 9)).toDF("id", "x", "y")
    val got = Skyline.skyline2D(df, "x", "y")
      .select("id").as[Long].collect().toSet
    assert(got == Set(2L, 3L))
  }

  test("plan never builds the O(n^2) dominance join") {
    val plan = Skyline.skyline2D(points, "x", "y")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"),
      s"skyline must not plan a cartesian dominance join:\n$plan")
  }
}
