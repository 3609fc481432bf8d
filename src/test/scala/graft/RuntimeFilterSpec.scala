package graft

import org.apache.spark.sql.functions._
import graft.operators.RuntimeFilter

/** Bloom runtime filter: exact semi-join semantics (false positives never
  * escape), real pre-exchange row reduction, bounded sketch, empty-build
  * short-circuit.
  */
class RuntimeFilterSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"
  private def fact = Tables.lineitem(spark, dir)
  private def dim = Tables.part(spark, dir).filter($"p_size" <= 5)

  test("bloomSemiJoin is bit-identical to a plain left_semi join") {
    val got = RuntimeFilter.bloomSemiJoin(fact, "l_partkey", dim, "p_partkey")
    val f = fact
    val d = dim
    val want = f.join(d, f("l_partkey") === d("p_partkey"), "left_semi")
    assert(got.schema == want.schema)
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
  }

  test("the sketch rejects non-matching probe rows before the join") {
    val sketch = RuntimeFilter.keyBloom(dim, "p_partkey").get
    val pre = fact.filter(RuntimeFilter.mightContain(sketch, $"l_partkey"))
    val total = fact.count()
    val exact = RuntimeFilter.bloomSemiJoin(fact, "l_partkey", dim, "p_partkey").count()
    val kept = pre.count()
    assert(exact > 0, "fixture precondition: the semi-join must be non-vacuous")
    assert(kept >= exact, "a Bloom filter has no false negatives")
    assert(kept < total,
      s"the sketch must reject rows pre-exchange (kept $kept of $total)")
  }

  test("the might_contain prefilter sits on the probe side below the join") {
    val plan = RuntimeFilter
      .bloomSemiJoin(fact, "l_partkey", dim, "p_partkey")
      .queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"),
      s"expected a native might_contain predicate in:\n$plan")
  }

  test("sketch size is bounded by expectedItems/fpp, never size-of-data") {
    val small = RuntimeFilter.keyBloom(dim, "p_partkey",
      expectedItems = Some(1000L), fpp = 0.03).get
    // 1000 items at 3% fpp -> ~7.3k bits -> under 2 KB serialized
    assert(small.length < 2048, s"sketch was ${small.length} B")
  }

  test("sketch is memoized per canonicalized plan; recheck rebuilds") {
    // dim is a def: each call builds a NEW DataFrame, so a hit proves the
    // cache matches on the canonicalized plan, not object identity
    val a = RuntimeFilter.keyBloom(dim, "p_partkey").get
    val b = RuntimeFilter.keyBloom(dim, "p_partkey").get
    assert(a eq b, "second build of the same plan must hit the cache")
    val fresh = RuntimeFilter.keyBloom(dim, "p_partkey", recheck = true).get
    assert(!(fresh eq a) && fresh.length == a.length)
  }

  test("self-sized sketch matches the build side, not a fixed guess") {
    val blob = RuntimeFilter.keyBloom(dim, "p_partkey", recheck = true).get
    // tens of build rows at sf0.001 -> well under 1 KB; a fixed 4M-item
    // guess would be ~3.8 MB
    assert(blob.length < 1024, s"sketch was ${blob.length} B")
  }

  test("empty build side short-circuits to an empty result, schema intact") {
    val none = dim.filter(lit(false))
    val out = RuntimeFilter.bloomSemiJoin(fact, "l_partkey", none, "p_partkey")
    assert(out.schema == fact.schema)
    assert(out.isEmpty)
  }
}
