package graft

import org.apache.spark.sql.catalyst.plans.logical.ResolvedHint
import graft.operators.Broadcasting

/** Guard-railed broadcast (VERDICT r3 #3): proven-small sides broadcast,
  * oversized ones degrade to a shuffle join or fail fast — a misuse must
  * never silently OOM the driver at scale.
  */
class BroadcastingSpec extends SparkSpec {
  import spark.implicits._

  private def hasBroadcastHint(df: org.apache.spark.sql.DataFrame): Boolean =
    df.queryExecution.analyzed.collectFirst { case h: ResolvedHint => h }.isDefined

  test("small side (plan estimate under bound) broadcasts without a probe") {
    val dim = Seq((1, "a"), (2, "b")).toDF("k", "v")
    assert(hasBroadcastHint(Broadcasting.checked(dim)))
  }

  test("pessimistic estimate but few rows: probe rescues the broadcast") {
    val dim = Seq.tabulate(10)(i => (i, s"v$i")).toDF("k", "v")
    // maxEstBytes = 1 forces the probe; 10 rows <= maxRows -> broadcast
    val out = Broadcasting.checked(dim, maxEstBytes = 1L, maxRows = 100)
    assert(hasBroadcastHint(out))
  }

  test("oversized side degrades to an unhinted frame (shuffle join)") {
    val dim = Seq.tabulate(50)(i => (i, s"v$i")).toDF("k", "v")
    val out = Broadcasting.checked(dim, maxEstBytes = 1L, maxRows = 10)
    assert(!hasBroadcastHint(out))
    // and the degraded frame still joins correctly
    val fact = Seq.tabulate(50)(i => (i, i * 10)).toDF("k", "n")
    assert(fact.join(out, Seq("k")).count() == 50)
  }

  test("checkedOrFail: oversized side fails fast with size evidence") {
    val dim = Seq.tabulate(50)(i => (i, s"v$i")).toDF("k", "v")
    val e = intercept[IllegalStateException] {
      Broadcasting.checkedOrFail(dim, maxEstBytes = 1L, maxRows = 10,
        tag = "test side")
    }
    assert(e.getMessage.contains("test side"))
    assert(e.getMessage.contains("refusing to broadcast"))
  }

  test("probe is bounded: limit stops counting at maxRows + 1") {
    // behavioural proof: a degenerate bound still terminates fast on a
    // large-ish frame (the probe scans at most maxRows + 1 rows)
    val big = spark.range(1000000).toDF("k")
    val out = Broadcasting.checked(big, maxEstBytes = 1L, maxRows = 5)
    assert(!hasBroadcastHint(out))
  }
}
