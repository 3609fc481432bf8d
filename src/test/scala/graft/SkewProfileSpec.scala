package graft

import org.apache.spark.sql.functions._
import graft.operators.SkewProfile

/** Skew diagnostics: exact counts/ranks/shares, power-of-two bucketing,
  * and the no-global-sort plan shape of the bounded-heap top-k.
  */
class SkewProfileSpec extends SparkSpec {
  import spark.implicits._

  // 1 hot key (60 rows), 3 warm (10 each), 40 singletons: 130 rows
  private def skewed = {
    val rows =
      Seq.fill(60)(100L) ++
        (1L to 3L).flatMap(k => Seq.fill(10)(k)) ++
        (200L until 240L)
    rows.map(k => (k, s"payload$k")).toDF("k", "v")
  }

  test("hotKeys: exact counts, deterministic rank, corpus share") {
    val top = SkewProfile.hotKeys(skewed, "k", k = 5)
      .orderBy("rnk").collect()
    assert(top.length == 5)
    val first = top.head
    assert(first.getAs[Long]("k") == 100L && first.getAs[Long]("cnt") == 60L)
    assert(first.getAs[Long]("rnk") == 1L)
    assert(math.abs(first.getAs[Double]("share") - 60.0 / 130.0) < 1e-6)
    // warm keys tie at 10 -> rank by key ascending
    assert(top.slice(1, 4).map(_.getAs[Long]("k")).toSeq == Seq(1L, 2L, 3L))
    // rank 5 is the smallest singleton
    assert(top(4).getAs[Long]("k") == 200L && top(4).getAs[Long]("cnt") == 1L)
  }

  test("hotKeys ranks with the bounded heap, not a global sort") {
    val plan = SkewProfile.hotKeys(skewed, "k", k = 5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("topk_agg"), s"expected the TopKAggregate in:\n$plan")
    assert(!plan.contains("rangepartitioning"),
      s"a global sort exchange would move O(keys), not O(k):\n$plan")
  }

  test("histogram: keys land in exact power-of-two buckets") {
    val h = SkewProfile.histogram(skewed, "k")
      .collect().map(r => r.getAs[Long]("bucket_lo") ->
        ((r.getAs[Long]("n_keys"), r.getAs[Long]("n_rows"), r.getAs[Long]("max_cnt"))))
      .toMap
    // cnt=60 -> bucket 32; cnt=10 -> bucket 8; cnt=1 -> bucket 1
    assert(h(32L) == ((1L, 60L, 60L)))
    assert(h(8L) == ((3L, 30L, 10L)))
    assert(h(1L) == ((40L, 40L, 1L)))
    assert(h.keySet == Set(1L, 8L, 32L))
  }

  test("histogram row volume reconciles with the input") {
    val total = SkewProfile.histogram(skewed, "k")
      .agg(sum("n_rows")).as[Long].head()
    assert(total == 130L)
  }

  test("hotKeys excludes NULL keys from ranks AND the share denominator") {
    // 3 NULL-keyed rows alongside a hot key: NULLs are not salting
    // candidates (no equi-join shuffle ever moves them) and must not
    // dilute the share of real keys — the documented policy.
    val withNulls = (Seq.fill(4)(Option(7L)) ++ Seq.fill(3)(Option.empty[Long])
      ++ Seq(Option(8L))).map(k => (k, "v")).toDF("k", "v")
    val top = SkewProfile.hotKeys(withNulls, "k", k = 10).orderBy("rnk").collect()
    assert(top.map(_.getAs[Long]("k")).toSeq == Seq(7L, 8L))
    assert(math.abs(top.head.getAs[Double]("share") - 4.0 / 5.0) < 1e-6)
  }
  test("saltedDistinct: value-salting reproduces the plain distinct exactly") {
    // key a: values {1, 2, 33, 34, 2} (4 distinct, 5 rows); key b: {1} —
    // values chosen to land in DIFFERENT salt residues (mod 32) and to
    // repeat across rows, so both the add-across-salts and the
    // within-salt dedup paths are exercised
    val df = Seq(("a", 1L), ("a", 2L), ("a", 33L), ("a", 34L), ("a", 2L),
      ("b", 1L)).toDF("k", "v")
    val got = SkewProfile.saltedDistinct(df, "k", "v", salts = 32)
      .orderBy("k").as[(String, Long, Long)].collect().toSeq
    assert(got == Seq(("a", 5L, 4L), ("b", 1L, 1L)))
    // nulls excluded from rows and distincts, like count_distinct
    val withNull = Seq(("a", Option(1L)), ("a", Option.empty[Long]))
      .toDF("k", "v")
    assert(SkewProfile.saltedDistinct(withNull, "k", "v")
      .as[(String, Long, Long)].collect().toSeq == Seq(("a", 1L, 1L)))
    val e = intercept[IllegalArgumentException](
      SkewProfile.saltedDistinct(df, "k", "v", salts = 1))
    assert(e.getMessage.contains("salts"))
  }
}
