package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

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
        round(col("pair_cnt").cast("double") * col("n_baskets") /
          (col("cnt_a") * col("cnt_b")), 6).as("lift"))
      .orderBy(col("pair_cnt").desc, col("part_a").asc, col("part_b").asc)
      .limit(topK)
  }
}
