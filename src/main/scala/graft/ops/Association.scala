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
    * A-priori monotonicity does the pruning: a triple can only be
    * frequent if every item in it is (L1) — so the item relation is
    * semi-joined down to frequent tokens BEFORE any pair fan-out. The
    * candidate space then shrinks from C(vocab, 3) per doc to
    * C(frequent-in-doc, 3), and the per-doc fan-out joins key on doc_id
    * (co-located, ReuseExchange'd — the [[basketPairs]] idiom). Counting
    * is one groupBy over the generated triples with the support filter
    * applied before the top-k heap (TakeOrdered, not a global sort).
    * The oracle applies the same (provably answer-preserving) L1
    * restriction, so both engines count the identical candidate set.
    */
  def frequentTriples(
      docs: DataFrame, minSupportPct: Double = 0.25,
      topK: Int = 20): DataFrame = {
    val items = docs.select(col("doc_id"),
      explode(array_distinct(split(trim(col("text")), "\\s+"))).as("token"))
    val threshold = docs.agg(
      ceil(count(lit(1)) * minSupportPct).as("min_sup"))
    val l1 = items.groupBy("token").agg(count(lit(1)).as("cnt"))
      .crossJoin(broadcast(threshold))
      .filter(col("cnt") >= col("min_sup"))
      .select("token")
    val freq = items.join(l1, Seq("token"), "left_semi")
    val triples = freq.hint("merge").as("a")
      .join(freq.hint("merge").as("b"),
        col("a.doc_id") === col("b.doc_id") && col("a.token") < col("b.token"))
      .join(freq.hint("merge").as("c"),
        col("a.doc_id") === col("c.doc_id") && col("b.token") < col("c.token"))
      .groupBy(col("a.token").as("tok_a"), col("b.token").as("tok_b"),
        col("c.token").as("tok_c"))
      .agg(count(lit(1)).as("support"))
    triples.crossJoin(broadcast(threshold))
      .filter(col("support") >= col("min_sup"))
      .select("tok_a", "tok_b", "tok_c", "support")
      .orderBy(col("support").desc, col("tok_a").asc, col("tok_b").asc,
        col("tok_c").asc)
      .limit(topK)
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
