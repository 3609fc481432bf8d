package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.ExactRatio.exactRatio

/** Market-basket co-occurrence mining over a (basket, item) relation.
  *
  * The reference has no association surface (its single pipeline is
  * forecast ingest, `azfunctions/InputBlobTrigger/processor.py:20-451`);
  * this is part of the beyond-reference training-data analytics the
  * project mandates — co-occurrence statistics drive negative sampling
  * and curriculum mixing for recommendation-style corpora.
  */
object Association {

  /** Top-`topK` co-occurring item pairs by support, with lift.
    *
    * support(pair) = #baskets containing both items; lift =
    * P(a,b) / (P(a)·P(b)) — >1 means the pair co-occurs more than
    * independence predicts.
    *
    * Scale: the self-join key is the BASKET id, so pair fan-out per
    * basket is C(basket size, 2) — bounded by the max basket size (7
    * lines in TPC-H-shaped data), never by the corpus. Both join sides
    * are the same deduplicated relation with a merge hint, so
    * ReuseExchange computes the basket exchange once (the idiom
    * [[Dedup.prefixFilterPairs]] uses). The per-item support join keys on
    * item — catalog-sized, so AQE broadcasts it when small and shuffles
    * otherwise. The final top-k is a `TakeOrdered` (bounded heap per
    * partition + bounded merge), not a global sort. A pathological
    * mega-basket (one basket holding a large slice of the catalog) would
    * make the fan-out quadratic; production guard is a basket-size cap,
    * which [[basketPairs]] exposes as `maxBasketSize`.
    */
  def basketPairs(
      lineitem: DataFrame, topK: Int = 20,
      maxBasketSize: Int = 1000): DataFrame = {
    val items = lineitem
      .select(col("l_orderkey").as("basket"), col("l_partkey").as("item"))
      .distinct()
    // quadratic-blowup guard: drop baskets above the cap BEFORE the
    // self-join (one count window riding the basket exchange). The
    // fixture never trips it; at scale it converts a mega-basket from a
    // task OOM into an explicit, documented exclusion.
    val sized = items
      .withColumn("bsz",
        count(lit(1)).over(
          org.apache.spark.sql.expressions.Window.partitionBy("basket")))
      .filter(col("bsz") <= maxBasketSize)
      .drop("bsz")
    val pairs = sized.hint("merge").as("a")
      .join(sized.hint("merge").as("b"),
        col("a.basket") === col("b.basket") && col("a.item") < col("b.item"))
      .groupBy(col("a.item").as("part_a"), col("b.item").as("part_b"))
      .agg(count(lit(1)).as("pair_cnt"))
    val supp = sized.groupBy(col("item")).agg(count(lit(1)).as("cnt"))
    val nBaskets = sized.select(col("basket")).distinct()
      .agg(count(lit(1)).as("n_baskets"))
    pairs
      .join(supp.select(col("item").as("part_a"), col("cnt").as("cnt_a")),
        "part_a")
      .join(supp.select(col("item").as("part_b"), col("cnt").as("cnt_b")),
        "part_b")
      .crossJoin(broadcast(nBaskets))
      .select(col("part_a"), col("part_b"), col("pair_cnt"),
        // lift = cnt·N/(ca·cb) is an int/int rational — exact fixed
        // point (round(double, 6) is engine-dependent at exact ties)
        exactRatio(col("pair_cnt") * col("n_baskets"),
          col("cnt_a") * col("cnt_b"), 6).as("lift"))
      .orderBy(col("pair_cnt").desc, col("part_a").asc, col("part_b").asc)
      .limit(topK)
  }

  /** Frequent token triples over the document corpus, A-priori style
    * (Agrawal & Srikant): `(tok_a, tok_b, tok_c, support)` for every
    * triple co-occurring in at least `minSupportPct` of documents, top
    * `topK` by support.
    *
    * The threshold is a FRACTION of the corpus, not an absolute count —
    * absolute thresholds go vacuous or explosive as the corpus scales
    * (the q11 lesson). It reaches the plan as a 1-row broadcast, never a
    * driver-side collect.
    *
    * A-priori monotonicity does the pruning, at BOTH levels, with the
    * paper's actual execution structure: LEVEL-WISE PASSES whose level
    * sets are materialized artifacts, not subtrees of one plan. L1
    * (frequent tokens) and L2 (frequent pairs) are each computed by
    * their own bounded job and LOCALIZED to broadcast LocalRelations —
    * the [[Similarity]] kmeans-centroid discipline. Localization is
    * load-bearing twice over:
    *
    *  - PLAN HEALTH: expressing the level censuses as lazy subtrees of
    *    the final query duplicates the (scan → explode → L1-filter →
    *    pair-join) chain under every consumer — measured 3–4× the
    *    two-job formulation at 10× scale even with AQE stage reuse,
    *    because each broadcast build and each probe re-executes its own
    *    copy of the census lineage.
    *  - SCALE SAFETY: the level sets are support-bounded, never
    *    corpus-bounded — Σ_tokens df(tok) = Σ_docs k_doc, so |L1| ≤
    *    avg(k)/pct, and Σ_pairs df(pair) = Σ_docs C(k_doc, 2), so |L2| ≤
    *    avg C(k, 2)/pct (k = distinct frequent tokens per doc). At 25%
    *    support these are catalog-scale sets; [[MaxLocalizedLevelSet]]
    *    enforces the bound LOUDLY (the [[graft.operators.Broadcasting]]
    *    fail-fast contract) instead of letting an adversarial corpus OOM
    *    the driver.
    *
    * The final counting pass generates candidates per doc — the (a,b)
    * stream is semi-joined against local L2 BEFORE the c-extension, so
    * the c-join fan-out is |L2-surviving pairs/doc| × k. Without the L2
    * step the c-extension multiplies an already-quadratic pair stream —
    * cubic in per-doc frequent-token density, the classic A-priori
    * failure mode (and this suite's #1 cost center until round 9). Both
    * prunes only DROP triples the final support filter would reject
    * anyway (support(a,b,c) ≤ support(a,b)), so the DuckDB oracle needs
    * no L2 clause: both engines count the identical surviving set. All
    * per-doc joins key on doc_id (co-located, ReuseExchange'd — the
    * [[basketPairs]] idiom); counting is one groupBy with the support
    * filter applied before the top-k heap (TakeOrdered, never a global
    * sort).
    */
  def frequentTriples(
      docs: DataFrame, minSupportPct: Double = 0.25,
      topK: Int = 20): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val items = docs.select(col("doc_id"),
      explode(array_distinct(split(trim(col("text")), "\\s+"))).as("token"))
    // pass 0: the support threshold. A FRACTION of the corpus, not an
    // absolute count (absolute thresholds go vacuous or explosive as the
    // corpus scales — the q11 lesson); one count(*) action, exact
    // integer ceil on both engines.
    val minSup = {
      val n = docs.count()
      (n * minSupportPct).ceil.toLong
    }
    // pass 1: L1 census -> localized frequent-token set
    val l1 = broadcast(localizedLevel(
      items.groupBy("token").agg(count(lit(1)).as("cnt"))
        .filter(col("cnt") >= minSup)
        .select("token"), "L1 frequent-token"))
    // pinned exchange (Spread, r14): the C(k,2)-per-doc pair generation in
    // the L2 census and the counting pass is the suite's single heaviest
    // CPU stage, and its (doc_id, token) shuffle is bytes-small — AQE
    // coalesced the merge-join legs to 2 tasks carrying ~4.8 s CPU at
    // sf0.1 (StageProf, r13). One numbered doc_id repartition here feeds
    // every leg (both L2 census sides, both counting-pass sides) through
    // ReuseExchange at full width.
    val freq = Spread.byKey(
      items.join(l1, Seq("token"), "left_semi"), col("doc_id"))
    def pairStream: DataFrame = freq.hint("merge").as("a")
      .join(freq.hint("merge").as("b"),
        col("a.doc_id") === col("b.doc_id") && col("a.token") < col("b.token"))
      .select(col("a.doc_id").as("doc_id"), col("a.token").as("tok_a"),
        col("b.token").as("tok_b"))
    // pass 2: L2 census -> localized frequent-pair set (its own job; the
    // per-doc pair stream is generated, partially aggregated map-side to
    // the distinct surviving pairs, and discarded — never materialized)
    val l2 = broadcast(localizedLevel(
      pairStream.groupBy("tok_a", "tok_b")
        .agg(count(lit(1)).as("pcnt"))
        .filter(col("pcnt") >= minSup)
        .select("tok_a", "tok_b"), "L2 frequent-pair"))
    // pass 3: candidate generation + count. ONLY the (a,b) face is
    // semi-joined against L2 — that is the prune that caps the
    // c-extension fan-out. A (b,c)-face check here would be
    // mathematically redundant (support(a,b,c) ≤ support(b,c), so the
    // final support filter already rejects every triple it would drop)
    // and measurably harmful: probing it against the GENERATED triple
    // stream costs a per-row hash probe on the operator's biggest
    // intermediate (3× wall at 10× scale), to shrink a partial-agg hash
    // table that the (a,b) prune and the support filter already bound.
    pairStream.join(l2, Seq("tok_a", "tok_b"), "left_semi").as("p")
      .join(freq.hint("merge").as("c"),
        col("p.doc_id") === col("c.doc_id") && col("p.tok_b") < col("c.token"))
      .groupBy(col("p.tok_a").as("tok_a"), col("p.tok_b").as("tok_b"),
        col("c.token").as("tok_c"))
      .agg(count(lit(1)).as("support"))
      .filter(col("support") >= minSup)
      .select("tok_a", "tok_b", "tok_c", "support")
      .orderBy(col("support").desc, col("tok_a").asc, col("tok_b").asc,
        col("tok_c").asc)
      .limit(topK)
  }

  /** Hard bound on a localized A-priori level set, derived from a byte
    * budget: a broadcast hashed relation costs ~100 B/row for two short
    * string tokens (key array + row bytes + hash-map overhead), so 1M
    * rows ≈ ~100 MB — the upper edge of what a broadcast should ever be,
    * and far inside any realistic driver/executor heap. The support
    * argument (scaladoc above) makes real level sets catalog-scale; a
    * corpus that blows past this is telling you the support threshold is
    * wrong for it, and the loud failure names the knob. (r9 ceiling was
    * 4M, and the guard fired only AFTER a driver-side take() had already
    * materialized the oversized set — [[localizedLevel]] now sizes the
    * set executor-side, so the require fires before a single level-set
    * row reaches the driver.)
    */
  val MaxLocalizedLevelSet: Int = 1000000

  /** Localize an A-priori level set for broadcast WITHOUT driver-side
    * collection: materialize it executor-side (localCheckpoint — this is
    * also the lineage cut that stops broadcast consumers from re-running
    * the census subtree, see the subtree-duplication note above), size it
    * with a distributed count, and fail loudly BEFORE any driver
    * materialization if it exceeds [[MaxLocalizedLevelSet]]. The
    * broadcast build then reads the checkpointed bytes directly — one
    * driver copy (the hashed relation) instead of the r9 shape's
    * take()-array PLUS LocalRelation copy.
    */
  private[graft] def localizedLevel(
      level: org.apache.spark.sql.DataFrame, what: String,
      bound: Int = MaxLocalizedLevelSet): org.apache.spark.sql.DataFrame = {
    val ck = level.localCheckpoint()
    val n = ck.count()
    if (n > bound) {
      // loud-failure hygiene (r10 ADVICE): release the oversized blocks we
      // just materialized BEFORE throwing — the failed path must not pin
      // executor storage until context shutdown
      Memo.unpersistCheckpoint(ck)
      throw new IllegalArgumentException(
        s"requirement failed: $what set exceeds the localization bound ($n > $bound " +
          "rows); refusing to broadcast a level set that grows with the corpus — " +
          "raise minSupportPct (the set is 1/pct-bounded) or restructure")
    }
    ck
  }

  /** Association rules from the pair census: for each frequent pair,
    * both directed rules a→b and b→a with exact confidence
    * (pair/count(antecedent)) alongside the symmetric lift — the
    * actionable form of [[basketPairs]] (lift says the pair is real;
    * confidence says which direction to recommend from). Top `topK` by
    * confidence, deterministic tie chain.
    *
    * Same bounded pair generation and single support join as
    * [[basketPairs]]; the direction unpivot doubles O(pairs) rows, never
    * the data.
    */
  def rules(
      lineitem: DataFrame, minSupport: Long = 2, topK: Int = 20,
      maxBasketSize: Int = 1000): DataFrame = {
    val items = lineitem
      .select(col("l_orderkey").as("basket"), col("l_partkey").as("item"))
      .distinct()
    val sized = items
      .withColumn("bsz", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy("basket")))
      .filter(col("bsz") <= maxBasketSize)
      .drop("bsz")
    val pairs = sized.hint("merge").as("a")
      .join(sized.hint("merge").as("b"),
        col("a.basket") === col("b.basket") && col("a.item") < col("b.item"))
      .groupBy(col("a.item").as("part_a"), col("b.item").as("part_b"))
      .agg(count(lit(1)).as("pair_cnt"))
      .filter(col("pair_cnt") >= minSupport)
    val supp = sized.groupBy(col("item")).agg(count(lit(1)).as("cnt"))
    val directed = pairs
      .select(col("part_a").as("antecedent"), col("part_b").as("consequent"),
        col("pair_cnt"))
      .unionByName(pairs.select(col("part_b").as("antecedent"),
        col("part_a").as("consequent"), col("pair_cnt")))
    directed
      .join(supp.select(col("item").as("antecedent"), col("cnt").as("cnt_a")),
        "antecedent")
      .select(col("antecedent"), col("consequent"), col("pair_cnt"),
        col("cnt_a"),
        exactRatio(col("pair_cnt"), col("cnt_a"), 6).as("confidence"))
      .orderBy(col("confidence").desc, col("antecedent").asc,
        col("consequent").asc)
      .limit(topK)
  }
}
