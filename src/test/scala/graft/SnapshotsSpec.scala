package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import graft.icenet.Snapshots

/** Snapshot versioning: time travel by version and by commit time, crash
  * windows (orphaned dirs, stale pointer), retention, and loud failure on
  * expired reads.
  */
class SnapshotsSpec extends SparkSpec {
  import spark.implicits._

  private def hfs(path: String) =
    new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def commitN(path: String, n: Int): Long =
    Snapshots.commit(spark, path,
      Seq.tabulate(n)(i => (i.toLong, s"v$n-row$i")).toDF("id", "payload"))

  test("commit/read: latest by default, any retained version by number") {
    val t = tmpDir("snap")
    assert(Snapshots.currentVersion(spark, t).isEmpty)
    assert(commitN(t, 1) == 1L)
    assert(commitN(t, 2) == 2L)
    assert(commitN(t, 3) == 3L)
    assert(Snapshots.read(spark, t).count() == 3)
    assert(Snapshots.read(spark, t, Some(1L)).count() == 1)
    assert(Snapshots.read(spark, t, Some(2L)).as[(Long, String)].collect()
      .forall(_._2.startsWith("v2-")))
    val h = Snapshots.history(spark, t)
    assert(h.map(_._1) == Seq(1L, 2L, 3L))
    assert(h.map(_._3) == Seq(false, false, true))
    assert(h.map(_._2).sorted == h.map(_._2), "commit times ascend")
  }

  test("asOf resolves by transaction time from the commit markers") {
    val t = tmpDir("snap")
    commitN(t, 1); commitN(t, 2)
    val Seq((_, t1, _), (_, t2, _)) = Snapshots.history(spark, t)
    assert(Snapshots.asOf(spark, t, t2).count() == 2)
    assert(Snapshots.asOf(spark, t, math.max(t1, t2 - 1)).count() == 1)
    intercept[IllegalStateException](Snapshots.asOf(spark, t, t1 - 1))
  }

  test("an uncommitted (crash-orphaned) version dir is invisible; its number is never reused") {
    val t = tmpDir("snap")
    commitN(t, 1)
    hfs(t).mkdirs(new Path(t, "_versions/v00000007")) // crash before _commit
    assert(Snapshots.history(spark, t).map(_._1) == Seq(1L))
    assert(Snapshots.read(spark, t).count() == 1)
    intercept[IllegalArgumentException](Snapshots.read(spark, t, Some(7L)))
    assert(commitN(t, 2) == 8L, "next version counts past the orphan")
  }

  test("vacuum removes every crash orphan and nothing committed") {
    val t = tmpDir("snap")
    commitN(t, 1)
    commitN(t, 2)
    // crash debris at the HEAD of the sequence — beyond expire's reach
    hfs(t).mkdirs(new Path(t, "_versions/v00000009"))
    hfs(t).mkdirs(new Path(t, "_versions/v00000011"))
    assert(Snapshots.vacuum(spark, t) == Seq(9L, 11L))
    assert(!hfs(t).exists(new Path(t, "_versions/v00000009")))
    assert(Snapshots.history(spark, t).map(_._1) == Seq(1L, 2L),
      "committed versions survive")
    assert(Snapshots.read(spark, t).count() == 2)
    assert(Snapshots.vacuum(spark, t).isEmpty, "idempotent once clean")
    assert(commitN(t, 3) == 3L, "vacuumed numbers are reusable again")
  }

  test("stale or missing pointer: readers fall back to the max committed version") {
    val t = tmpDir("snap")
    commitN(t, 1); commitN(t, 2)
    hfs(t).delete(new Path(t, "_latest"), false) // crash between delete+rename
    assert(Snapshots.currentVersion(spark, t).contains(2L))
    assert(Snapshots.read(spark, t).count() == 2)
    assert(commitN(t, 3) == 3L, "commit after pointer loss continues the chain")
    assert(Snapshots.currentVersion(spark, t).contains(3L))
  }

  test("expire keeps the newest keepLast, the pointer target, and fails expired reads loudly") {
    val t = tmpDir("snap")
    (1 to 4).foreach(commitN(t, _))
    val deleted = Snapshots.expire(spark, t, keepLast = 2)
    assert(deleted == Seq(1L, 2L))
    assert(Snapshots.history(spark, t).map(_._1) == Seq(3L, 4L))
    assert(Snapshots.read(spark, t).count() == 4)
    intercept[IllegalArgumentException](Snapshots.read(spark, t, Some(1L)))
  }

  test("reader holds an old version while newer commits land (and until expiry)") {
    val t = tmpDir("snapreader")
    commitN(t, 1)
    // reader pins v1 by RESOLVING it: the returned frame is bound to v1's
    // immutable directory, so concurrent commits can never change what it
    // reads — commits write NEW version dirs and only move the pointer
    val pinned = Snapshots.read(spark, t, Some(1L))
    commitN(t, 2)
    commitN(t, 3)
    // v1 still retained: the pinned frame re-executes identically even
    // though the table's current version moved to 3
    assert(pinned.count() == 1)
    assert(pinned.as[(Long, String)].head()._2 == "v1-row0")
    assert(Snapshots.read(spark, t).count() == 3) // new readers see v3
    // retention is the reader lease: once v1 is expired, the pinned frame's
    // files are gone — execution fails loudly rather than returning partial
    // or empty data (Spark surfaces the missing files), and new resolves of
    // v1 fail at require() (covered by the expire test)
    assert(Snapshots.expire(spark, t, keepLast = 2) == Seq(1L))
    val e = intercept[Exception] {
      // fresh plan over the same expired dir (the pinned frame may serve
      // cached file listings; a re-read hits the store)
      Snapshots.read(spark, t, Some(1L)).count()
    }
    assert(e.getMessage != null)
    // the survivors are intact and current
    assert(Snapshots.read(spark, t, Some(2L)).count() == 2)
    assert(Snapshots.read(spark, t).count() == 3)
  }

  test("diffFrames classifies I/U/D, emits null updates, skips unchanged") {
    val old = Seq(
      (1L, Option("keep"), 10.0),
      (2L, Option("update-me"), 20.0),
      (3L, Option("delete-me"), 30.0),
      (4L, Option("null-me"), 40.0)
    ).toDF("id", "tag", "x")
    val neu = Seq(
      (1L, Option("keep"), 10.0),   // unchanged -> absent
      (2L, Option("updated"), 21.0),
      (4L, Option.empty[String], 40.0), // value went NULL: still a U with null
      (5L, Option("inserted"), 50.0)
    ).toDF("id", "tag", "x")
    val got = Snapshots.diffFrames(old, neu, Seq("id"))
      .select("id", "op", "tag", "x")
      .as[(Long, String, Option[String], Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got == Map(
      2L -> (("U", Some("updated"), 21.0)),
      3L -> (("D", Some("delete-me"), 30.0)),
      4L -> (("U", None, 40.0)),
      5L -> (("I", Some("inserted"), 50.0))))
  }

  test("applying the diff to the old snapshot reproduces the new one") {
    val t = tmpDir("snap")
    val old = Seq((1L, "a", 1.0), (2L, "b", 2.0), (3L, "c", 3.0))
      .toDF("id", "tag", "x")
    val neu = Seq((1L, "a", 1.0), (2L, "B", 2.5), (4L, "d", 4.0))
      .toDF("id", "tag", "x")
    val v1 = Snapshots.commit(spark, t, old)
    val v2 = Snapshots.commit(spark, t, neu)
    val d = Snapshots.diff(spark, t, v1, v2, Seq("id"))
    val applied = Snapshots.read(spark, t, Some(v1))
      .join(d.select("id"), Seq("id"), "left_anti") // drop every touched key
      .unionByName(d.filter(col("op") =!= "D").drop("op")
        .select("id", "tag", "x"))
    val want = Snapshots.read(spark, t, Some(v2))
    assert(applied.exceptAll(want).isEmpty && want.exceptAll(applied).isEmpty)
  }

  test("partitioned snapshots read back whole") {
    val t = tmpDir("snap")
    val df = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "a", 30.0))
      .toDF("id", "part", "x")
    Snapshots.commit(spark, t, df, partitionCols = Seq("part"))
    val back = Snapshots.read(spark, t)
    assert(back.count() == 3)
    assert(back.select(sum("x")).as[Double].head() == 60.0)
  }
}
