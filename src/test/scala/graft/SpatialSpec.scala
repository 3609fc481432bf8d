package graft

import graft.ops.Spatial

/** Grid-blocked radius join: hand-checkable pairs (boundary-inclusive,
  * cross-cell, just-outside excluded), exactly-once pair emission, parity
  * with the quadratic reference on a seeded cloud, and density ordering.
  */
class SpatialSpec extends SparkSpec {
  import spark.implicits._

  private def pts(rows: (Long, Long, Long)*) =
    rows.toDF("id", "x", "y")

  test("radiusJoin: boundary inclusive, cross-cell found, outside excluded") {
    // r=10: (1)-(2) at distance exactly 10 (kept, boundary); (1)-(3) at
    // sqrt(101) > 10 (dropped); (4)-(5) straddle the cell border at
    // x=9,11 (cross-cell, distance 2, kept)
    val p = pts((1L, 0L, 0L), (2L, 10L, 0L), (3L, 10L, 1L),
      (4L, 9L, 50L), (5L, 11L, 50L))
    val got = Spatial.radiusJoin(p, r = 10)
      .as[(Long, Long, Long)].collect().toSet
    assert(got.contains((1L, 2L, 100L)))
    assert(got.contains((4L, 5L, 4L)))
    assert(!got.exists { case (a, b, _) => (a, b) == ((1L, 3L)) })
    // (2)-(3) at distance 1 also qualifies
    assert(got == Set((1L, 2L, 100L), (2L, 3L, 1L), (4L, 5L, 4L)))
  }

  test("radiusJoin emits each qualifying pair exactly once (no 9x dups)") {
    val p = pts((1L, 5L, 5L), (2L, 6L, 5L)) // same cell, 8 shared neighbors
    val rows = Spatial.radiusJoin(p, r = 10).collect()
    assert(rows.length == 1)
  }

  test("radiusJoin matches the quadratic reference on a seeded cloud") {
    val cloud = (0L until 400L).map(i =>
      (i, i * 37 % 200, i * 61 % 200))
    val p = pts(cloud: _*).repartition(7)
    val r = 15
    val got = Spatial.radiusJoin(p, r)
      .as[(Long, Long, Long)].collect().toSet
    val want = (for {
      (a, xa, ya) <- cloud; (b, xb, yb) <- cloud if a < b
      d2 = (xa - xb) * (xa - xb) + (ya - yb) * (ya - yb)
      if d2 <= r.toLong * r
    } yield (a, b, d2)).toSet
    assert(got == want, s"${got.size} vs ${want.size} pairs")
  }

  test("knnWithin: nearest-first with id tie-break, radius cutoff, " +
    "cross-cell recovery, k truncation") {
    // query id 50 at (100,100) [cell (90,90) at r=10 -> boundary-near];
    // neighbors: 1@(101,100) d2=1; 2@(99,101) d2=2 (different cell);
    // 3@(103,104) d2=25; 4@(100,92) d2=64; 5@(120,120) d2=800 outside
    // r=10; 6 is another query-residue point far away (no self rows)
    val p = pts((50L, 100L, 100L), (1L, 101L, 100L), (2L, 99L, 101L),
      (3L, 103L, 104L), (4L, 100L, 92L), (5L, 120L, 120L),
      (100L, 500L, 500L))
    val got = Spatial.knnWithin(p, r = 10, k = 3)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(got == Set(
      (50L, 1L, 1L, 1L), (50L, 2L, 2L, 2L), (50L, 3L, 25L, 3L)))
    // k larger than matches: all in-radius neighbors come back, ranked
    val all = Spatial.knnWithin(p, r = 10, k = 10)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(all == got + ((50L, 4L, 64L, 4L)))
    // exact-distance tie at the same d2: lower id wins the lower rank
    val tied = pts((0L, 10L, 10L), (7L, 11L, 10L), (3L, 10L, 11L))
    val ranks = Spatial.knnWithin(tied, r = 5, k = 2, queryMod = 100)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(ranks == Set((0L, 3L, 1L, 1L), (0L, 7L, 1L, 2L)))
  }

  test("density: counts per cell, hotspots first, coordinate tie-break") {
    val p = pts((1L, 0L, 0L), (2L, 10L, 10L), (3L, 49L, 49L), // cell (0,0)
      (4L, 50L, 0L), (5L, 60L, 10L), // cell (50,0)
      (6L, 0L, 50L)) // cell (0,50)
    val got = Spatial.density(p, c = 50, topK = 10)
      .as[(Long, Long, Long)].collect().toSeq
    assert(got == Seq((0L, 0L, 3L), (50L, 0L, 2L), (0L, 50L, 1L)))
  }
}
