package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.ExactRatio.exactRatio

/** Retrieval-layer operators above the scoring primitives: list fusion,
  * vocabulary policy, and similarity range queries — the pieces that turn
  * individual scorers ([[TextAnalysis.bm25]], [[Similarity]]'s ANN
  * family) into a usable corpus-mining surface.
  */
object Retrieval {

  /** Reciprocal-rank fusion of two retrieval lists — the standard
    * score-free way to combine heterogeneous signals (here: BM25 lexical
    * relevance and the corpus quality prior; the same shape fuses any
    * k lists). Each list contributes 1/(kRrf + rank) for its members;
    * docs appearing in only one list keep that single term (full outer
    * join, the other side contributes 0).
    *
    * Scale: both candidate pools are top-`poolK` TakeOrdered exits, so
    * the fusion join touches O(poolK) rows however large the corpus —
    * rank windows run on the pools, never the data. Deterministic:
    * every ordering carries the doc_id tiebreak.
    */
  def rankFusion(
      docs: DataFrame, queryTerms: Seq[String],
      kRrf: Int = 60, poolK: Int = 50, topK: Int = 20): DataFrame = {
    val lexPool = TextAnalysis.bm25(docs, queryTerms, topK = poolK)
    val wLex = Window.orderBy(col("bm25").desc, col("doc_id").asc)
    val lex = lexPool.select(col("doc_id"),
      row_number().over(wLex).as("r_lex"))
    val qualPool = docs
      .select(col("doc_id"),
        TextAnalysis.qualityScore(TextAnalysis.tokens(col("text"))).as("q"))
      .orderBy(col("q").desc, col("doc_id").asc).limit(poolK)
    val wQual = Window.orderBy(col("q").desc, col("doc_id").asc)
    val qual = qualPool.select(col("doc_id"),
      row_number().over(wQual).as("r_qual"))
    // RRF score as an exact rational: 1/(k+rl) + 1/(k+rq) =
    // (a+b)/(a·b) with a = k+rl, b = k+rq (single term when one rank is
    // absent). round(double, 6) is engine-dependent at exact 6-dp ties —
    // reachable here, e.g. a lone rank 68 gives 1/128 = 0.0078125.
    val a = lit(kRrf) + col("r_lex")
    val b = lit(kRrf) + col("r_qual")
    val num = when(a.isNull || b.isNull, lit(1)).otherwise(a + b)
    val den = when(a.isNull, b).when(b.isNull, a).otherwise(a * b)
    lex.join(qual, Seq("doc_id"), "full_outer")
      .select(col("doc_id"), col("r_lex"), col("r_qual"),
        exactRatio(num, den, 6).as("rrf"))
      .orderBy(col("rrf").desc, col("doc_id").asc)
      .limit(topK)
  }

  /** Corpus-driven stopword induction: tokens whose document frequency
    * ratio is ≥ `dfRatio` — the data-dependent twin of a fixed stopword
    * list (built once per corpus, then fed to BM25/TF-IDF/dedup prefix
    * filters as the exclusion set). One distinct-ified (doc, token)
    * exchange + an O(vocab) aggregate; the corpus size attaches as a
    * 1-row broadcast.
    */
  def stopwordInduction(docs: DataFrame, dfRatio: Double = 0.4): DataFrame = {
    val terms = docs
      .select(col("doc_id"), explode(TextAnalysis.tokens(col("text"))).as("token"))
      .distinct()
    val df = terms.groupBy("token").agg(count(lit(1)).as("df"))
    val n = broadcast(docs.agg(count(lit(1)).as("n_docs")))
    df.crossJoin(n)
      .filter(col("df") / col("n_docs") >= dfRatio)
      .select(col("token"), col("df"),
        exactRatio(col("df"), col("n_docs"), 6).as("df_ratio"))
  }

  /** Inverted-index build: token → (df, total_tf, sorted posting list,
    * aligned per-posting tf) — the materialized retrieval structure BM25
    * and decontamination query against, built as a table so it can be
    * snapshotted/partitioned like any other.
    *
    * The scale hazard of posting lists is the head of the Zipf curve: the
    * posting list for "the" is corpus-sized. Defense: document frequency
    * is computed FIRST (partial-aggregable counts, never a list), and only
    * tokens with df ≤ `maxDf` reach the collect — stopword-scale lists are
    * never materialized (they carry no retrieval signal; BM25's idf ≈ 0
    * there). Three exchanges, all keyed on token, only the last carries
    * lists and only for capped tokens.
    *
    * Output contract: `postings`/`tfs` are comma-joined STRINGS, not
    * arrays — the index is a table, and flat column types keep it
    * readable by any consumer (and canonicalizable by row-hash tooling)
    * without nested-type support.
    */
  def invertedIndex(docs: DataFrame, maxDf: Int = 500): DataFrame = {
    val tf = docs
      .select(col("doc_id"), explode(TextAnalysis.tokens(col("text"))).as("token"))
      .groupBy("token", "doc_id").agg(count(lit(1)).as("tf"))
    val kept = tf.groupBy("token")
      .agg(count(lit(1)).as("df"), sum("tf").as("total_tf"))
      .filter(col("df") <= maxDf)
    tf.join(kept, Seq("token"))
      .groupBy("token", "df", "total_tf")
      .agg(sort_array(collect_list(struct(col("doc_id").as("d"), col("tf").as("t"))))
        .as("ps"))
      .select(col("token"), col("df"), col("total_tf"),
        array_join(transform(col("ps"), p => p.getField("d").cast("string")), ",")
          .as("postings"),
        array_join(transform(col("ps"), p => p.getField("t").cast("string")), ",")
          .as("tfs"))
  }

  /** Cosine range search: ALL neighbors with similarity ≥ `minCos` for
    * each query vector — the radius-query sibling of the top-k family
    * (dedup wants "everything closer than t", not "the 5 closest").
    * IVF-blocked like [[Similarity.ivfTopK]]: each query scans only its
    * own cell, 1/C of the corpus; no window, no limit — output size is
    * the true result size.
    */
  def rangeSearch(
      embeddings: DataFrame, minCos: Double = 0.3,
      queryMod: Int = 50, nCentroids: Int = 16): DataFrame = {
    val cells = Similarity.ivfAssign(embeddings, nCentroids)
    val q = cells.filter(col("vec_id") % queryMod === 0)
      .select(col("vec_id").as("query_id"), col("vec").as("qvec"),
        col("norm").as("qnorm"), col("cell"))
    cells.join(q, "cell")
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        Similarity.cosine(col("qvec"), col("vec"), col("qnorm"), col("norm"))
          .as("cos_sim"))
      .filter(col("cos_sim") >= minCos)
  }
}
