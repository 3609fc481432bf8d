package graft

import graft.icenet.TableOps

/** Upsert-semantics tests (S5/S6/S7): the reference's ON CONFLICT behavior
  * must hold — first-write-wins converges, last-write-wins overwrites, and
  * re-running is always a fixed point (processor.py:256,333,395-401,444-448).
  */
class TableOpsSpec extends SparkSpec {
  import spark.implicits._

  test("S5 insertIgnore: first write wins, re-ingest is a fixed point") {
    val path = tmpDir("s5") + "/t"
    val v1 = Seq((1, "a"), (2, "b")).toDF("k", "v")
    val v2 = Seq((1, "CHANGED"), (3, "c")).toDF("k", "v")
    TableOps.insertIgnore(spark, path, v1, Seq("k"))
    TableOps.insertIgnore(spark, path, v2, Seq("k"))
    val got = TableOps.read(spark, path).as[(Int, String)].collect().toSet
    assert(got == Set((1, "a"), (2, "b"), (3, "c"))) // key 1 kept original
    TableOps.insertIgnore(spark, path, v2, Seq("k")) // re-run converges
    assert(TableOps.read(spark, path).count() == 3)
  }

  test("S5 insertIgnore collapses duplicate keys within one batch") {
    val path = tmpDir("s5dup") + "/t"
    val batch = Seq((1, "x"), (1, "y"), (2, "z")).toDF("k", "v")
    TableOps.insertIgnore(spark, path, batch, Seq("k"))
    assert(TableOps.read(spark, path).count() == 2)
  }

  test("S6 upsert: last write wins on matched keys, keeps unmatched") {
    val path = tmpDir("s6") + "/t"
    val v1 = Seq((1, 10L), (2, 20L)).toDF("k", "n")
    val v2 = Seq((2, 99L), (3, 30L)).toDF("k", "n")
    TableOps.upsert(spark, path, v1, Seq("k"))
    TableOps.upsert(spark, path, v2, Seq("k"))
    val got = TableOps.read(spark, path).as[(Int, Long)].collect().toSet
    assert(got == Set((1, 10L), (2, 99L), (3, 30L)))
    TableOps.upsert(spark, path, v2, Seq("k")) // idempotent
    assert(TableOps.read(spark, path).as[(Int, Long)].collect().toSet == got)
  }

  test("S7 overwriteView: full recompute replaces previous content") {
    val path = tmpDir("s7") + "/v"
    TableOps.overwriteView(spark, path, Seq((1, "old")).toDF("k", "v"))
    TableOps.overwriteView(spark, path, Seq((2, "new")).toDF("k", "v"))
    val got = TableOps.read(spark, path).as[(Int, String)].collect().toSet
    assert(got == Set((2, "new")))
  }

  test("partitioned write: date-partition columns survive round-trip") {
    val path = tmpDir("part") + "/t"
    val df = Seq(("2020-01-01", 1), ("2020-01-02", 2))
      .toDF("d", "n").withColumn("d", org.apache.spark.sql.functions.to_date($"d"))
    TableOps.insertIgnore(spark, path, df, Seq("d", "n"), partitionCols = Seq("d"))
    val got = TableOps.read(spark, path)
    assert(got.count() == 2 && got.columns.toSet == Set("d", "n"))
  }
}
