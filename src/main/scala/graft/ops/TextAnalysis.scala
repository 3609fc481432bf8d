package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for a training-data pipeline (beyond-reference
  * surface mandated by BASELINE.json): token counting, quality scoring,
  * n-gram language ID, document fingerprinting.
  *
  * Every operator here is a NARROW transformation — pure per-row column
  * expressions, no shuffle, no UDF: at 100 TB these run at scan speed inside
  * whole-stage codegen, and all of them are DuckDB-expressible so the
  * correctness gate covers them exactly.
  */
object TextAnalysis {

  /** Whitespace tokenizer (documents.text is whitespace-separated). */
  def tokens(text: Column): Column = split(trim(text), "\\s+")

  /** BPE-ish subword count estimate: each word contributes ceil(len/4)
    * pieces — the standard chars/4 heuristic applied per token.
    */
  def bpeTokenEstimate(toks: Column): Column =
    aggregate(toks, lit(0L), (acc, t) => acc + ceil(length(t) / 4.0).cast("long"))

  val EnStop: Seq[String] = Seq("the", "a", "and", "of", "to", "in", "is", "that")
  val FrStop: Seq[String] = Seq("le", "la", "et", "les", "des", "un", "une", "du")
  val DeStop: Seq[String] = Seq("der", "die", "und", "das", "ein", "mit", "von", "zu")
  val EsStop: Seq[String] = Seq("el", "los", "y", "que", "una", "por", "como", "para")

  /** Count of tokens contained in `stop` (duplicates count, like a real
    * stopword-hit scorer).
    */
  def stopHits(toks: Column, stop: Seq[String]): Column =
    size(filter(toks, t => array_contains(array(stop.map(lit): _*), t)))

  /** Quality score in [0,1]: length saturation + stopword ratio + lexical
    * diversity, fixed weights. All-double arithmetic, rounded to 6.
    */
  def qualityScore(toks: Column): Column = {
    val n = size(toks)
    val stopRatio = stopHits(toks, EnStop) / n.cast("double")
    val distinctRatio = size(array_distinct(toks)) / n.cast("double")
    round(
      least(lit(1.0), n / 50.0) * 0.4 + stopRatio * 0.3 + distinctRatio * 0.3, 6)
  }

  /** N-gram-heuristic language ID: stopword hits per candidate language,
    * argmax with deterministic preference order en > fr > de > es; no hits
    * at all -> "und" (unknown).
    */
  def langId(toks: Column): Column = {
    val en = stopHits(toks, EnStop)
    val fr = stopHits(toks, FrStop)
    val de = stopHits(toks, DeStop)
    val es = stopHits(toks, EsStop)
    when(en + fr + de + es === 0, "und")
      .when(en >= fr && en >= de && en >= es, "en")
      .when(fr >= de && fr >= es, "fr")
      .when(de >= es, "de")
      .otherwise("es")
  }

  /** Document fingerprint: md5 of the whitespace-normalized lowercased text.
    * Identical content (modulo spacing/case) -> identical fingerprint; the
    * exact-dedup key. md5 is bit-identical across engines, so this is fully
    * oracle-checkable (unlike a seeded rolling hash).
    */
  def fingerprint(text: Column): Column =
    md5(regexp_replace(lower(trim(text)), "\\s+", " "))

  // ---- query-shaped entry points (SparkEntry wiring) ----------------------

  def tokenCounts(docs: DataFrame): DataFrame = {
    val t = tokens(col("text"))
    docs.select(
      col("doc_id"),
      size(t).as("n_tokens"),
      bpeTokenEstimate(t).as("bpe_tokens"))
  }

  def quality(docs: DataFrame): DataFrame = {
    val t = tokens(col("text"))
    docs.select(
      col("doc_id"),
      size(t).as("n_tokens"),
      round(stopHits(t, EnStop) / size(t).cast("double"), 6).as("stop_ratio"),
      round(size(array_distinct(t)) / size(t).cast("double"), 6).as("distinct_ratio"),
      qualityScore(t).as("quality"))
  }

  def languages(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), langId(tokens(col("text"))).as("lang_pred"))

  def fingerprints(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), fingerprint(col("text")).as("fp"))
}
