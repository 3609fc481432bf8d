package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.ExactRatio.exactRatio

/** Probabilistic record linkage (Fellegi–Sunter style): blocked candidate
  * generation, per-field agreement scoring with additive log-odds-style
  * integer weights, threshold classification, and evaluation against
  * ground truth.
  *
  * Beyond-reference surface: the reference ingests one curated feed and
  * never reconciles entities across sources
  * (`/root/reference/azfunctions/processor.py` reads a single blob
  * container); a training-data pipeline at 100 TB constantly links noisy
  * entity tables — the same document or author arriving via two crawls
  * with perturbed metadata — and all-pairs comparison is quadratic death.
  * The scale discipline here is the dedup family's
  * ([[Dedup]]): candidates exist ONLY inside a block (equi-join on
  * blocking keys), weights are literals folded into the projection, and
  * the evaluation is a single aggregate. The linkage never shuffles
  * anything larger than the blocked pair set.
  *
  * Weights are INTEGER by design, not convenience: Fellegi–Sunter weights
  * are log(m/u) reals, but cross-engine certification (and reproducible
  * pipelines) want bit-stable scores, so the operator takes pre-scaled
  * integer weights — the standard practice of fixing a scored rulebook at
  * deploy time — and every derived ratio goes through [[exactRatio]].
  */
object Linkage {

  /** Two deterministic "noisy registry" views of the customer table — the
    * linkage fixture. A is the reference registry; B simulates a second
    * import of the same entities with field noise, every perturbation a
    * pure function of the key so an independent engine reproduces it:
    *  - name: B drops the 'Customer#' prefix and, for key % 11 == 0,
    *    swaps the last two digits (a transposition typo);
    *  - balance: B rounds to whole units (import lost the cents);
    *  - segment: B nulls it for key % 5 == 0 (field missing on import).
    * Nation survives intact on both sides (the block key must).
    */
  def noisyViews(customer: DataFrame): (DataFrame, DataFrame) = {
    val a = customer.select(
      col("c_custkey").as("a_id"),
      substring(col("c_name"), 10, 9).as("a_name"),
      col("c_nationkey").as("a_nation"),
      col("c_acctbal").as("a_bal"),
      col("c_mktsegment").as("a_seg"))
    val digits = substring(col("c_name"), 10, 9)
    val swapped = concat(
      substring(digits, 1, 7), substring(digits, 9, 1), substring(digits, 8, 1))
    val b = customer.select(
      col("c_custkey").as("b_id"),
      when(col("c_custkey") % 11 === 0, swapped).otherwise(digits)
        .as("b_name"),
      col("c_nationkey").as("b_nation"),
      // floor(x + 0.5) in exact cent space: acctbal is 2-dp decimal-exact,
      // so work on cents as BIGINT (the repo's rounding-tie discipline)
      (floor((col("c_acctbal") * 100 + 50) / lit(100)).cast("long"))
        .as("b_bal"),
      when(col("c_custkey") % 5 === 0, lit(null).cast("string"))
        .otherwise(col("c_mktsegment")).as("b_seg"))
    (a, b)
  }

  /** Blocking key: (nation, balance century). The perturbed balance can
    * cross a century boundary, so B also blocks on the NEIGHBOR bucket
    * when its balance sits within `slack` of the edge — the standard
    * multi-pass blocking trick that recovers boundary pairs for the cost
    * of ≤2 block rows per record instead of a quadratic windowed join.
    */
  def withBlocks(
      df: DataFrame, bal: String, slack: Int = 1): DataFrame = {
    val bucket = floor(col(bal) / 100).cast("long")
    val low = floor((col(bal) - slack) / 100).cast("long")
    df.withColumn("__block", explode(array_distinct(array(bucket, low))))
  }

  /** Blocked candidate pairs with the per-field agreement vector. The join
    * is a pure equi-join on (nation, block) — the only pair generator in
    * the family; no similarity all-pairs anywhere.
    */
  def candidates(a: DataFrame, b: DataFrame): DataFrame = {
    val ab = withBlocks(a.withColumn("__bal_l",
        floor(col("a_bal") * 100 + lit(0.5)).cast("long")), "a_bal")
    val bb = withBlocks(b, "b_bal")
    ab.join(bb,
        ab("a_nation") === bb("b_nation") && ab("__block") === bb("__block"))
      .select(
        col("a_id"), col("b_id"),
        (col("a_name") === col("b_name")).cast("int").as("agr_name"),
        // balance agreement: |cents(a) - 100*b_bal| <= 50, i.e. b's
        // whole-unit value is a's correctly-rounded balance
        (abs(col("__bal_l") - col("b_bal") * 100) <= 50).cast("int")
          .as("agr_bal"),
        coalesce((col("a_seg") === col("b_seg")).cast("int"), lit(0))
          .as("agr_seg"),
        col("b_seg").isNull.cast("int").as("seg_missing"))
      .distinct() // neighbor blocks can produce the same pair twice
  }

  /** Additive integer weights per field outcome (agree / disagree /
    * missing). Defaults are a plausible log-odds-scaled rulebook; they are
    * configuration, not learned here.
    */
  case class Weights(
      nameAgree: Int = 24, nameDisagree: Int = -8,
      balAgree: Int = 10, balDisagree: Int = -6,
      segAgree: Int = 6, segDisagree: Int = -4, segMissing: Int = 0)

  /** Scores candidates and classifies: score ≥ `matchAt` → 'match',
    * ≥ `possibleAt` → 'possible', else dropped (non-matches are the
    * overwhelming mass at scale and are never materialized).
    */
  def score(
      cand: DataFrame, w: Weights = Weights(),
      matchAt: Int = 30, possibleAt: Int = 5): DataFrame = {
    val s =
      when(col("agr_name") === 1, w.nameAgree).otherwise(w.nameDisagree) +
      when(col("agr_bal") === 1, w.balAgree).otherwise(w.balDisagree) +
      when(col("seg_missing") === 1, w.segMissing)
        .otherwise(when(col("agr_seg") === 1, w.segAgree)
          .otherwise(w.segDisagree))
    cand.withColumn("score", s.cast("int"))
      .filter(col("score") >= possibleAt)
      .withColumn("decision",
        when(col("score") >= matchAt, lit("match")).otherwise(lit("possible")))
      .select("a_id", "b_id", "score", "decision")
  }

  /** Linkage quality vs the ground truth (a_id == b_id by construction):
    * precision/recall/F1 of the 'match' class, plus the possible-class
    * review load — one aggregate row, exact e4 ratios. `truth` is a 1-row
    * `(n_truth)` aggregate (the reference registry's entity count),
    * attached by broadcast like every other 1-row denominator in the
    * suite.
    */
  def evaluate(scored: DataFrame, truth: DataFrame): DataFrame = {
    val agg = scored.agg(
      sum(when(col("decision") === "match", 1).otherwise(0)).as("n_match"),
      sum(when(col("decision") === "match" && col("a_id") === col("b_id"), 1)
        .otherwise(0)).as("n_match_true"),
      sum(when(col("decision") === "possible", 1).otherwise(0))
        .as("n_possible"))
    agg.crossJoin(broadcast(truth)).select(
      col("n_match"), col("n_match_true"), col("n_possible"),
      exactRatio(col("n_match_true"), col("n_match"), 4).as("prec"),
      exactRatio(col("n_match_true"), col("n_truth"), 4).as("recall"),
      // F1 = 2tp / (n_match + truth): exact in one integer ratio
      exactRatio(col("n_match_true") * 2, col("n_match") + col("n_truth"), 4)
        .as("f1"))
  }

  // ---- fuzzy NAME linkage (true Damerau–Levenshtein, distinct-name level)

  /** Distinct-name vocabulary with per-name entity counts and the blocking
    * key (first name token + brand). The fuzzy-name stages all derive from
    * this one aggregate: real corpora repeat name strings heavily (here a
    * bounded color×noun vocabulary), so scoring at the distinct-name level
    * makes the candidate-pair count O(vocab²/blocks) — INDEPENDENT of row
    * count — while entity multiplicity re-enters only as per-name counts
    * multiplied at the end. The entity-level self-join the naive design
    * would run is quadratic in corpus size; this is not.
    */
  private[graft] def nameVocab(part: DataFrame): DataFrame =
    part.groupBy(col("p_brand"), col("p_name"))
      .agg(count(lit(1)).as("n_entities"))
      .withColumn("tok", split_part(col("p_name"), lit(" "), lit(1)))

  /** Per-block candidate-space census: distinct-name block sizes and the
    * pair counts the scorer will face — blocking-quality profiling BEFORE
    * paying for scoring (an over-full block here is the signal to refine
    * the key, the linkage analog of `skew_hot_keys`).
    */
  def nameBlockingStats(part: DataFrame): DataFrame =
    nameVocab(part)
      .groupBy(col("tok"), col("p_brand"))
      .agg(
        count(lit(1)).as("n_names"),
        sum(col("n_entities")).as("n_entities"))
      .withColumn("n_pairs", expr("n_names * (n_names - 1) div 2"))

  /** Blocked fuzzy-name matches: distinct-name pairs within a block at
    * TRUE Damerau–Levenshtein distance ∈ [1, maxDist]
    * ([[graft.functions.DamerauLevenshtein]] — codegen'd, integer-exact,
    * transposition-aware: the typo class `link_matches`' exact-equality
    * agreement bit cannot see). Identical names are the exact-dup class,
    * excluded by the `<` self-join guard; entity multiplicity rides as
    * n_a·n_b instead of materialized pairs.
    */
  def dlNameMatches(part: DataFrame, maxDist: Int = 3): DataFrame = {
    val v = nameVocab(part)
    val a = v.select(col("tok"), col("p_brand"), col("p_name").as("name_a"),
      col("n_entities").as("n_a"))
    val b = v.select(col("tok"), col("p_brand"), col("p_name").as("name_b"),
      col("n_entities").as("n_b"))
    a.join(b, Seq("tok", "p_brand"))
      .filter(col("name_a") < col("name_b"))
      .withColumn("dist",
        graft.functions.DamerauLevenshtein
          .damerauLevenshtein(col("name_a"), col("name_b")).cast("bigint"))
      .filter(col("dist") <= maxDist)
      .select(col("p_brand"), col("name_a"), col("name_b"), col("dist"),
        (col("n_a") * col("n_b")).as("entity_pairs"))
  }

  /** Blocked Jaro–Winkler matches at the distinct-name level: the
    * similarity-side complement of [[dlNameMatches]] (edit distance is
    * length-sensitive; JW is prefix-weighted and length-normalized — the
    * two scorers disagree exactly on short-vs-long name noise, which is
    * why production linkage runs both). Scores come from
    * [[graft.functions.JaroWinkler]] as exact half-up e6 BIGINTs —
    * threshold semantics are bit-stable cross-engine, never a double
    * comparison.
    */
  def jwNameMatches(part: DataFrame, minJwE6: Long = 700000L): DataFrame = {
    val v = nameVocab(part)
    val a = v.select(col("tok"), col("p_brand"), col("p_name").as("name_a"),
      col("n_entities").as("n_a"))
    val b = v.select(col("tok"), col("p_brand"), col("p_name").as("name_b"),
      col("n_entities").as("n_b"))
    a.join(b, Seq("tok", "p_brand"))
      .filter(col("name_a") < col("name_b"))
      .withColumn("jw_e6",
        graft.functions.JaroWinkler
          .jaroWinklerE6(col("name_a"), col("name_b")))
      .filter(col("jw_e6") >= minJwE6)
      .select(col("p_brand"), col("name_a"), col("name_b"), col("jw_e6"),
        (col("n_a") * col("n_b")).as("entity_pairs"))
  }

  /** Entity clusters: connected components over the matched name graph
    * (node = brand-qualified name, so blocks never bridge), then the
    * per-cluster entity census joined back from the vocabulary. Singleton
    * names stay their own cluster — a linkage output that silently drops
    * unmatched entities understates the corpus.
    */
  def nameClusters(part: DataFrame, maxDist: Int = 3): DataFrame = {
    val v = nameVocab(part)
      .withColumn("node", concat_ws("|", col("p_brand"), col("p_name")))
    val edges = dlNameMatches(part, maxDist)
      .select(
        concat_ws("|", col("p_brand"), col("name_a")).as("doc_a"),
        concat_ws("|", col("p_brand"), col("name_b")).as("doc_b"))
    val labels = Dedup.connectedComponents(edges)
      .select(col("doc_id").as("node"), col("comp"))
    v.join(labels, Seq("node"), "left")
      .select(col("p_brand"), col("p_name"), col("n_entities"),
        coalesce(col("comp"), col("node")).as("comp"))
      .groupBy(col("comp"))
      .agg(
        min(col("p_name")).as("canonical_name"),
        count(lit(1)).as("n_names"),
        sum(col("n_entities")).as("n_entities"))
  }
}
