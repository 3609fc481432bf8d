package graft

import org.apache.spark.sql.functions._
import graft.ops.{Dedup, Similarity, TextAnalysis}

/** Corpus-preparation operators added in round 4: benchmark
  * decontamination, concat-and-chunk sequence packing, PII redaction, and
  * scalar-quantized ANN. Semantics that the DuckDB oracles cannot pin
  * (synthetic PII, quantization error bounds, packing boundary behavior)
  * are pinned here.
  */
class CorpusPrepSpec extends SparkSpec {
  import spark.implicits._

  test("contamination flags only docs sharing enough distinct n-grams") {
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog tonight"),
      (2L, "completely different words appear in this one document here"),
      (3L, "the quick brown fox jumps over a sleeping cat instead")
    ).toDF("doc_id", "text")
    val benchmark = Seq(
      (100L, "the quick brown fox jumps over the lazy dog again")
    ).toDF("doc_id", "text")
    val flagged = Dedup.contamination(corpus, benchmark, n = 4, minShared = 2)
      .as[(Long, Long)].collect().toMap
    // doc 1 shares many 4-grams with the benchmark; doc 3 shares exactly
    // "the quick brown fox" + "quick brown fox jumps" + "brown fox jumps over";
    // doc 2 shares none
    assert(flagged.contains(1L) && flagged.contains(3L) && !flagged.contains(2L))
    assert(flagged(3L) == 3L)
  }

  test("contamination below minShared is not flagged") {
    val corpus = Seq((1L, "alpha beta gamma delta unrelated tail words here")).toDF("doc_id", "text")
    val benchmark = Seq((2L, "alpha beta gamma delta totally different continuation")).toDF("doc_id", "text")
    // exactly one shared 4-gram ("alpha beta gamma delta")
    assert(Dedup.contamination(corpus, benchmark, n = 4, minShared = 2).count() == 0)
    assert(Dedup.contamination(corpus, benchmark, n = 4, minShared = 1).count() == 1)
  }

  test("packSequences: chunk boundaries follow the cumulative token offset") {
    val docs = Seq(
      (1L, "en", "a b c d"),   // 4 tokens, cum_prev 0  -> seq 0
      (2L, "en", "e f g"),     // 3 tokens, cum_prev 4  -> seq 0
      (3L, "en", "h i j k l"), // 5 tokens, cum_prev 7  -> seq 0
      (4L, "en", "m n"),       // cum_prev 12 -> seq 1 (capacity 10)
      (5L, "fr", "un deux trois quatre cinq six sept huit neuf dix onze")
      // fr partition starts fresh: cum_prev 0 -> seq 0
    ).toDF("doc_id", "lang", "text")
    val packed = TextAnalysis.packSequences(docs, capacity = 10)
      .select("doc_id", "seq_id").as[(Long, Long)].collect().toMap
    assert(packed == Map(1L -> 0L, 2L -> 0L, 3L -> 0L, 4L -> 1L, 5L -> 0L))
  }

  test("packSequences is deterministic and order-stable across runs") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val a = TextAnalysis.packSequences(docs).collect().toSet
    val b = TextAnalysis.packSequences(docs.repartition(7)).collect().toSet
    assert(a == b, "packing must not depend on physical partitioning")
  }

  test("PII redaction replaces emails, IPs, and phone runs with typed tags") {
    val docs = Seq(
      (1L, "contact jane.doe+spam@example.co.uk or call +1 (555) 123-4567 now"),
      (2L, "server at 192.168.0.1 responded"),
      (3L, "no pii in this document at all")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.redactions(docs)
      .as[(Long, String, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out(1L)._1 == "contact <EMAIL> or call <PHONE> now")
    assert(out(1L)._2 == 2L)
    assert(out(2L)._1 == "server at <IP> responded")
    assert(out(2L)._2 == 1L)
    assert(out(3L)._1 == "no pii in this document at all")
    assert(out(3L)._2 == 0L)
  }

  test("sqQuantize: codes are in range and reconstruction error is bounded") {
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val q = Similarity.sqQuantize(emb)
    val codes = q.select(explode(col("qvec")).as("c"))
      .agg(min("c"), max("c")).as[(Int, Int)].head()
    assert(codes._1 >= 0 && codes._2 <= 255)
    // reconstruction error per component <= span/(2*255) (half a level)
    val err = q
      .join(Similarity.withNorm(emb).select(col("vec_id"), col("vec")), "vec_id")
      .select(explode(arrays_zip(col("vec"), col("qvec"), col("mns"), col("spans"))).as("z"))
      .select(
        abs(col("z.vec") - (col("z.mns") + col("z.qvec") * col("z.spans") / 255))
          .as("e"),
        (col("z.spans") / 510 + lit(1e-12)).as("bound"))
      .filter(col("e") > col("bound"))
    assert(err.count() == 0, "every component must reconstruct within half a level")
  }

  test("sq top-k ranking stays close to the exact ranking (recall@5 >= 0.8)") {
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val exact = Similarity.bruteForceTopK(emb, k = 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val sq = Similarity.sqTopK(emb, k = 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (exact intersect sq).size.toDouble / exact.size
    assert(recall >= 0.8, s"sq recall vs exact = $recall")
  }

  test("readability: hand counts drive the exact Flesch/FK values; " +
    "punctuation-free text floors sentences at 1") {
    val docs = Seq(
      (1L, "The cat sat. It ran!"),
      (2L, "no terminal punctuation here")
    ).toDF("doc_id", "text")
    val got = TextAnalysis.readability(docs).orderBy("doc_id")
      .as[(Long, Long, Long, Long, Double, Double)].collect().toSeq
    // doc 1: w=5, s=2, vowel groups e,a,a,i,a -> sy=5
    // flesch = 206.835 - 1.015*2.5 - 84.6*1 = 119.6975; fk = -2.815
    assert(got.head == ((1L, 5L, 2L, 5L, 119.6975, -2.815)))
    // doc 2: s floored at 1; w=4; sy: o,e,i,a,u,u,a,io,e,e -> count
    val d2 = got(1)
    assert(d2._3 == 1L && d2._2 == 4L)
    assert(d2._5 < 119.6975) // denser syllables read harder
  }

  test("decontaminatedSplits: held-out docs sharing 4-grams with train " +
    "are quarantined; train never is") {
    def bucket(id: Long): Long = {
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      java.lang.Long.parseLong(h.substring(0, 4), 16) % 100
    }
    val ids = (1L to 500L)
    val trainId = ids.find(bucket(_) < 90).get
    val testIds = ids.filter(bucket(_) >= 95).take(2)
    val docs = Seq(
      (trainId, "en", "p q r s t"),        // train source text
      (testIds(0), "en", "p q r s t"),     // shares 2 distinct 4-grams
      (testIds(1), "en", "u v w x y")      // clean
    ).toDF("doc_id", "lang", "text")
    val got = graft.ops.TextAnalysis.decontaminatedSplits(docs)
      .as[(String, Long, Long, Double)].collect().toSeq
    assert(got == Seq(("test", 2L, 1L, 0.5), ("train", 1L, 0L, 1.0)))
  }

  test("ngramNovelty: first occurrence credits the earliest doc, repeats " +
    "in the same doc collapse") {
    val docs = Seq(
      (1L, "en", "a b c d e"),       // grams: abcd, bcde - both novel
      (2L, "en", "a b c d x"),       // abcd seen, bcdx novel -> 1/2
      (3L, "en", "a b c d e")        // both grams seen -> 0
    ).toDF("doc_id", "lang", "text")
    val got = graft.ops.TextAnalysis.ngramNovelty(docs)
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(got == Seq((1L, 2L, 2L, 1.0), (2L, 2L, 1L, 0.5),
      (3L, 2L, 0L, 0.0)))
  }

  test("oovRate: held-out tokens unseen in train are OOV occurrences") {
    def bucket(id: Long): Long = {
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      java.lang.Long.parseLong(h.substring(0, 4), 16) % 100
    }
    val ids = (1L to 500L)
    val trainId = ids.find(bucket(_) < 90).get
    val testId = ids.find(bucket(_) >= 95).get
    val docs = Seq(
      (trainId, "en", "p q r"),
      (testId, "en", "p q z z")   // z twice: 2 OOV occurrences of 4
    ).toDF("doc_id", "lang", "text")
    val got = graft.ops.TextAnalysis.oovRate(docs)
      .as[(String, Long, Long, Double)].collect().toSeq
    assert(got == Seq(("test", 4L, 2L, 0.5)))
  }
}
