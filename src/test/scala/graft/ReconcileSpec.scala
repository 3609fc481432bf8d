package graft

import org.apache.spark.sql.DataFrame
import graft.ops.Reconcile

/** Merkle-style reconciliation: bucket signatures must flag exactly the
  * buckets that drifted, and the pruned row-level diff must equal the
  * true diff of the two tables (no false-clean losses, no phantom ops).
  */
class ReconcileSpec extends SparkSpec {
  import spark.implicits._

  private def tbl(rows: Seq[(Long, String)]): DataFrame =
    rows.toDF("k", "payload")

  private val left = tbl((1L to 50L).map(k => k -> s"v$k"))

  private def diffSet(df: DataFrame): Set[(Long, String)] =
    df.as[(Long, String)].collect().toSet

  test("identical replicas: no dirty buckets, empty diff") {
    assert(Reconcile.dirtyBuckets(left, left, "k", "payload", 16)
      .count() == 0)
    assert(Reconcile.reconcile(left, left, "k", "payload", 16).count() == 0)
  }

  test("recovers the exact I/D/U diff") {
    // right: delete k=7, update k=12, insert k=99
    val right = tbl((1L to 50L).filter(_ != 7L)
      .map(k => k -> (if (k == 12L) "CHANGED" else s"v$k")) :+ (99L -> "new"))
    val got = diffSet(Reconcile.reconcile(left, right, "k", "payload", 16))
    assert(got == Set((7L, "D"), (12L, "U"), (99L, "I")))
  }

  test("dirty buckets are only the buckets containing drifted keys") {
    val right = tbl((1L to 50L).map(k =>
      k -> (if (k == 12L) "CHANGED" else s"v$k")))
    val dirty = Reconcile.dirtyBuckets(left, right, "k", "payload", 16)
      .as[Long].collect().toSeq
    assert(dirty.length == 1) // exactly the bucket key 12 hashes into
  }

  test("diff is invariant to bucket count") {
    val right = tbl((1L to 50L).filter(_ % 5 != 0).map(k => k -> s"v$k"))
    val expected = (1L to 50L).filter(_ % 5 == 0).map(k => (k, "D")).toSet
    for (b <- Seq(1, 4, 64))
      assert(diffSet(Reconcile.reconcile(left, right, "k", "payload", b))
        == expected, s"nBuckets=$b")
  }

  test("seeded-random drift: reconcile equals the brute-force diff") {
    val rnd = new scala.util.Random(0xC0FFEE)
    val leftRows = (1L to 500L).map(k => k -> s"v${rnd.nextInt(1000)}")
    val rightRows = leftRows.flatMap { case (k, v) =>
      rnd.nextInt(10) match {
        case 0 => None                        // delete
        case 1 => Some(k -> (v + "~"))        // update
        case _ => Some(k -> v)                // keep
      }
    } ++ (1L to 500L).filter(_ => rnd.nextInt(25) == 0)
      .map(i => (1000L + i) -> "ins")         // inserts
    val lm = leftRows.toMap
    val rm = rightRows.toMap
    val expected =
      lm.keySet.diff(rm.keySet).map(k => (k, "D")) ++
        rm.keySet.diff(lm.keySet).map(k => (k, "I")) ++
        lm.keySet.intersect(rm.keySet)
          .filter(k => lm(k) != rm(k)).map(k => (k, "U"))
    val got = diffSet(Reconcile.reconcile(
      tbl(leftRows), tbl(rightRows.toSeq), "k", "payload", 32))
    assert(got == expected)
  }

  test("null payloads: distinct from empty string, null-safe in the diff") {
    val l = Seq((1L, Some("a")), (2L, None: Option[String]),
      (3L, Some("")), (4L, None)).toDF("k", "payload")
    val r = Seq((1L, Some("a")), (2L, Some("x")),
      (3L, None: Option[String]), (4L, None)).toDF("k", "payload")
    // k=2: null -> "x" is a REAL update; k=3: "" -> null likewise (null
    // must not hash like ""); k=4: null == null is agreement
    val got = diffSet(Reconcile.reconcile(l, r, "k", "payload", 8))
    assert(got == Set((2L, "U"), (3L, "U")))
  }

  test("incrementally maintained signatures equal the recompute") {
    val inserts = tbl(Seq(201L -> "a", 202L -> "b"))
    val deletes = tbl(Seq(3L -> "v3", 17L -> "v17"))
    val updatedOld = tbl(Seq(25L -> "v25"))
    val updatedNew = tbl(Seq(25L -> "CHANGED"))
    val mutated = tbl(((1L to 50L).filter(k => k != 3L && k != 17L)
      .map(k => k -> (if (k == 25L) "CHANGED" else s"v$k"))
      :+ (201L -> "a")) :+ (202L -> "b"))
    val delta = Reconcile.signatureDelta(
      inserts.unionByName(updatedNew), deletes.unionByName(updatedOld),
      "k", "payload", 16)
    val maintained = Reconcile.applySignatureDelta(
      Reconcile.bucketSignatures(left, "k", "payload", 16), delta)
      .as[(Long, Long, Long)].collect().toSet
    val recomputed = Reconcile.bucketSignatures(mutated, "k", "payload", 16)
      .as[(Long, Long, Long)].collect().toSet
    assert(maintained == recomputed)
  }

  test("applySignatureDelta drops buckets the delta empties") {
    val one = tbl(Seq(5L -> "x"))
    val delta = Reconcile.signatureDelta(
      tbl(Nil), one, "k", "payload", 4) // delete the only row
    val maintained = Reconcile.applySignatureDelta(
      Reconcile.bucketSignatures(one, "k", "payload", 4), delta)
    assert(maintained.count() == 0) // identical to recomputing on empty
  }

  test("null key fails loudly instead of silently dropping from the diff") {
    // a null key would bucket to null: flagged dirty but never equi-joined
    // back, so the row would vanish from the diff with the bucket stuck
    // dirty forever — the contract is enforced at the first offending row
    val withNull = tbl((1L to 5L).map(k => k -> s"v$k"))
      .union(Seq((null.asInstanceOf[java.lang.Long], "orphan"))
        .toDF("k", "payload"))
    val e = intercept[Exception](
      Reconcile.bucketSignatures(withNull, "k", "payload", 16).collect())
    assert(e.getMessage.contains("null key") ||
      Option(e.getCause).exists(_.getMessage.contains("null key")))
  }

  test("signature table is O(buckets), not O(rows)") {
    val sigs = Reconcile.bucketSignatures(left, "k", "payload", 8)
    assert(sigs.count() <= 8)
    assert(sigs.agg(org.apache.spark.sql.functions.sum("n_rows"))
      .as[Long].head() == 50L)
  }
}
