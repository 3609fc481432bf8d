package graft

import org.apache.spark.sql.functions._
import graft.ops.Dedup

/** PassJoin edit-distance dedup: exact recall against the brute-force
  * all-pairs reference, threshold boundary behavior, and padding totality.
  */
class EditDistanceSpec extends SparkSpec {
  import spark.implicits._

  private val base = "the quick brown fox jumps over the lazy dog again".take(40)

  // doc 1/2 identical prefixes; 3 at distance 2; 4 at distance 4 (out);
  // 5 unrelated; 6 short (padding path)
  private def docs = Seq(
    (1L, base + " tail one"),
    (2L, base + " other tail"),
    (3L, "thX quick brown fox Jumps over the lazy dog"),
    (4L, "thXY quick brown fox JKmps over the lazy dog"),
    (5L, "completely different text with no overlap at all whatsoever"),
    (6L, "short doc")
  ).toDF("doc_id", "text")

  private def bruteForce(k: Int): Set[(Long, Long, Int)] = {
    val keys = docs.select(col("doc_id"),
      rpad(lower(substring(trim(col("text")), 1, 40)), 40, "#").as("key"))
    keys.as("a").crossJoin(keys.as("b"))
      .filter(col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id"), col("b.doc_id"),
        levenshtein(col("a.key"), col("b.key")).as("d"))
      .as[(Long, Long, Int)].collect().toSet
      .filter(_._3 <= k)
  }

  test("exact recall and precision vs brute force") {
    val got = Dedup.editDistancePairs(docs, k = 3)
      .as[(Long, Long, Int)].collect().toSet
    assert(got == bruteForce(3))
    // the fixture exercises both sides of the threshold
    assert(got.contains((1L, 2L, 0)))
    assert(got.exists { case (a, b, d) => Set(a, b) == Set(1L, 3L) && d > 0 })
    assert(!got.exists { case (a, b, _) => Set(a, b).contains(4L) &&
      Set(a, b).contains(5L) })
  }

  test("recall holds on the sf0.001 fixture corpus") {
    val corpus = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    val got = Dedup.editDistancePairs(corpus, k = 3)
      .as[(Long, Long, Int)].collect().toSet
    val keys = corpus.select(col("doc_id"),
      rpad(lower(substring(trim(col("text")), 1, 40)), 40, "#").as("key"))
    val brute = keys.as("a").crossJoin(keys.as("b"))
      .filter(col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id"), col("b.doc_id"),
        levenshtein(col("a.key"), col("b.key")).as("d"))
      .filter(col("d") <= 3)
      .as[(Long, Long, Int)].collect().toSet
    assert(got == brute)
  }

  test("short documents pad rather than crash, and pad chars match") {
    val shorts = Seq((1L, "abc"), (2L, "abd"), (3L, "xyz")).toDF("doc_id", "text")
    val got = Dedup.editDistancePairs(shorts, k = 3)
      .as[(Long, Long, Int)].collect().toSet
    // padded keys differ only in the real chars: d(abc,abd)=1
    assert(got.contains((1L, 2L, 1)))
    assert(got.contains((1L, 3L, 3))) // abc->xyz = 3 substitutions
  }
}
