package graft.ops

import org.apache.spark.sql.{Column, DataFrame}

/** Numbered hash repartition for CPU-heavy fan-out stages.
  *
  * The repo's "spread the per-row work" sites used `repartition(col(k))`,
  * which plans as a REPARTITION_BY_COL exchange — an origin AQE is free to
  * coalesce. Under `spark.sql.adaptive.coalescePartitions.parallelismFirst`
  * (default true) the coalesce floor is `minPartitionSize` (1 MB), so a
  * bytes-small shuffle whose reduce side carries per-row CPU fan-out
  * (tokenize + md5 over a compressed corpus, per-doc quality scoring,
  * per-edge graph iteration input) collapses back to a handful of tasks —
  * exactly the under-parallelism class the eval_chrf sf10 rung caught
  * (commit 804943d), just hidden behind a keyed repartition instead of a
  * missing one. Verified at sf0.1: `AQEShuffleRead coalesced` sat on top of
  * every such exchange, serializing the expensive stage.
  *
  * `repartition(n, col(k))` plans as REPARTITION_BY_NUM, which AQE never
  * rewrites, and `n = spark.sql.shuffle.partitions` is the scale-adaptive
  * width: the bench session pins it to the harness core count, a cluster
  * submit sets it to the cluster's reduce width — no constant tuned for
  * either. Hash clustering on the key is preserved, so every downstream
  * per-key window/aggregate still reuses the exchange.
  */
object Spread {
  /** NOTE (r13 ADVICE): the width is read from the session conf AT PLAN
    * CONSTRUCTION time and frozen into the plan. A caller that builds the
    * DataFrame under one `spark.sql.shuffle.partitions` and executes it
    * after changing the conf gets the build-time width; every repo call
    * site builds and executes in the same session configuration, and a
    * cluster submit sets its reduce width before any plan is built.
    */
  def byKey(df: DataFrame, keys: Column*): DataFrame =
    df.repartition(
      df.sparkSession.sessionState.conf.numShufflePartitions, keys: _*)
}
