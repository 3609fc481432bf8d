package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TopKAggregate
import graft.functions.ExactRatio.exactRatio

/** Join-key skew diagnostics — the measurement that decides whether a key
  * needs [[SkewJoin]] salting (or AQE's skew split) BEFORE a 100 TB shuffle
  * discovers it the hard way.
  *
  * Both operators start from the same per-key count aggregate, which
  * shuffles on exactly the key under diagnosis — i.e. the profile costs one
  * pass of the same exchange the production join would perform, with
  * map-side combine reducing each task's slice to its distinct keys first.
  * Everything after that first aggregate is O(#keys), not O(#rows).
  */
object SkewProfile {

  /** Per-key row counts: one hash aggregate, one shuffle on `key`. */
  private def keyCounts(df: DataFrame, key: String): DataFrame =
    df.groupBy(key).agg(count(lit(1)).as("cnt"))

  /** Exact hottest-k keys with rank and corpus share. Ranking uses the
    * bounded-heap [[TopKAggregate]], not sort + limit: each map task
    * reduces its key slice to <= k pairs before the single-group exchange,
    * so the global step moves O(tasks x k) rows however many keys exist.
    * Requires an integral key (cast to long for the heap's id slot) —
    * profile a string key via a hash/dictionary projection first.
    *
    * NULL keys are excluded up front (and from the `share` denominator):
    * the heap's id slot has no NULL representation, and a NULL join key
    * never participates in an equi-join shuffle anyway, so it is not a
    * salting candidate. Profile NULL volume with [[histogram]] or a
    * [[graft.ops.Expectations.NotNull]] rule instead.
    *
    * Counts survive the double round-trip exactly below 2^53 rows per key.
    */
  def hotKeys(df: DataFrame, key: String, k: Int = 20): DataFrame = {
    val nonNull = df.filter(col(key).isNotNull)
    val total = nonNull.agg(count(lit(1)).as("total"))
    keyCounts(nonNull, key)
      .agg(TopKAggregate.topk(col("cnt").cast("double"), col(key).cast("long"), k)
        .as("top"))
      .join(broadcast(total)) // 1-row total: share denominator, no 2nd scan of counts
      .select(posexplode(col("top")).as(Seq("pos", "pair")), col("total"))
      .select(
        col("pair.id").as(key),
        col("pair.score").cast("long").as("cnt"),
        (col("pos") + 1).cast("long").as("rnk"),
        // exact fixed point (cnt and total are integers): round(double, 6)
        // diverges across engines when cnt/total is a true 6-dp tie
        exactRatio(col("pair.score"), col("total"), 6).as("share"))
  }

  /** Exact COUNT(DISTINCT value) per key by VALUE-DOMAIN salting — the
    * two-phase rendering that survives few-groups/heavy-state skew. Plain
    * map-side combine collapses a hot key's COUNT/SUM stream, but a
    * DISTINCT aggregate's partial state is a SET: with few groups, every
    * map task carries the hot group's whole id set and the merge
    * serializes on one reducer. Salting the VALUE (`value mod salts`)
    * makes per-(key, salt) distinct counts ADD exactly — the salt
    * partitions the id domain, so no id is counted twice — turning phase
    * one into `salts`-way parallel bounded-state aggregates and phase two
    * into an O(keys × salts) integer sum.
    *
    * Requires an integral, non-negative value column (ids); NULL values
    * are excluded (count_distinct semantics) up front.
    */
  def saltedDistinct(
      df: DataFrame, key: String, value: String, salts: Int = 32): DataFrame = {
    require(salts >= 2 && salts <= 4096,
      s"saltedDistinct: salts=$salts outside 2..4096")
    df.filter(col(value).isNotNull)
      .groupBy(col(key),
        pmod(col(value).cast("long"), lit(salts.toLong)).as("__vsalt"))
      .agg(count(lit(1)).as("__n"), count_distinct(col(value)).as("__d"))
      .groupBy(key)
      .agg(sum("__n").as("n_rows"), sum("__d").as("n_distinct"))
  }

  /** Key-frequency histogram in exact power-of-two buckets: for each
    * `bucket_lo = 2^floor(log2(cnt))`, how many distinct keys land there
    * and how many ROWS they carry. A healthy uniform key puts all keys in
    * 1-2 adjacent buckets; a skewed one shows a long tail plus a few keys
    * holding a large `rows` share — those are the salting candidates.
    * Second aggregate is over #keys rows, map-side combined.
    */
  def histogram(df: DataFrame, key: String): DataFrame = {
    val bits = length(conv(col("cnt").cast("string"), 10, 2))
    keyCounts(df, key)
      .select(pow(lit(2.0), (bits - 1).cast("double")).cast("long").as("bucket_lo"),
        col("cnt"))
      .groupBy("bucket_lo")
      .agg(
        count(lit(1)).as("n_keys"),
        sum(col("cnt")).as("n_rows"),
        max(col("cnt")).as("max_cnt"))
  }
}
