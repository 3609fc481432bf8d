package graft

import org.apache.spark.sql.functions._
import graft.ops.Expectations._

/** Data-quality expectations: per-rule-type violation counting (including
  * the unevaluable-row policy), rule ordering, and the fused-scan shape.
  */
class ExpectationsSpec extends SparkSpec {
  import spark.implicits._

  private def facts = Seq(
    (1L, Option(5.0), Option("ok")),
    (2L, Option(500.0), Option("ok")),     // out of range
    (3L, Option.empty[Double], Option("ok")), // NULL range input -> violation
    (3L, Option(6.0), Option.empty[String]),  // dup id + null tag
    (4L, Option(7.0), Option("bad!"))
  ).toDF("id", "x", "tag")

  test("row rules: holds, fails, and unevaluable all counted correctly") {
    val got = check(facts, Seq(
      NotNull("tag"),
      InRange("x", 0, 100),
      Matches("tag", "^[a-z]+$")))
      .orderBy("ordinal")
      .select("rule", "n_violations", "n_checked", "pass")
      .as[(String, Long, Long, Boolean)].collect().toSeq
    assert(got == Seq(
      ("tag_not_null", 1L, 5L, false),
      // 500 out of range + NULL x is unevaluable -> 2
      ("x_in_range", 2L, 5L, false),
      // "bad!" fails the regex, NULL tag is unevaluable -> 2
      ("tag_matches", 2L, 5L, false)))
  }

  test("unique and foreign-key rules count keyed violations") {
    val dim = Seq(1L, 2L, 3L).toDF("k")
    val got = check(facts, Seq(
      Unique(Seq("id")),
      ForeignKey(Seq("id"), dim, Seq("k"), "id_dim")))
      .orderBy("ordinal")
      .select("rule", "n_violations", "n_checked", "pass")
      .as[(String, Long, Long, Boolean)].collect().toSeq
    assert(got == Seq(
      ("id_unique", 1L, 5L, false),   // id 3 appears twice
      ("id_dim_fk", 1L, 5L, false))) // id 4 missing from dim
  }

  test("a fully clean table passes every rule") {
    val clean = Seq((1L, 1.0, "a"), (2L, 2.0, "b")).toDF("id", "x", "tag")
    val got = check(clean, Seq(
      NotNull("tag"), InRange("x", 0, 10), Unique(Seq("id"))))
    assert(got.filter(!col("pass")).count() == 0)
    assert(got.count() == 3)
  }

  test("all row rules fuse into a single scan of the input") {
    val p = check(facts, Seq(
      NotNull("tag"), InRange("x", 0, 100), Matches("tag", "x"),
      NotNull("x"), InRange("id", 0, 10)))
      .queryExecution.sparkPlan.toString
    val scans = "LocalTableScan".r.findAllIn(p).size
    assert(scans == 1, s"5 row rules must share one scan, got $scans:\n$p")
  }
}
