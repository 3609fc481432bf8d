package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.ExactRatio.exactRatio

import graft.functions.KmvAggregate

/** Mergeable sketch surface: bounded-state summaries whose rollups
  * re-aggregate from persisted per-partition state instead of re-reading
  * the raw data — the operational primitive behind "distinct users per
  * day, week, month, and all-time" over a corpus too large to re-scan per
  * rollup.
  *
  * Beyond-reference surface (the reference has no approximate operators;
  * its SQL surface is exact aggregation only,
  * `azfunctions/InputBlobTrigger/processor.py:385-394`). The sketch here
  * is KMV ([[graft.functions.KmvAggregate]]) rather than HLL because its
  * state is exact hash values: DuckDB reproduces the identical sketch and
  * estimate, so the oracle certifies the whole path — including the
  * merge — not just "some estimate came out".
  */
object Sketches {

  /** Hash space size: hashes are the first 15 hex chars of md5 = 60 bits. */
  val HashSpace: Double = 1152921504606846976.0 // 2^60, exact as a double

  /** Deterministic 60-bit hash of any value's canonical string form.
    * 15 hex chars keep the value strictly inside BIGINT range on both
    * engines (DuckDB twin: `CAST('0x'||substr(md5(v),1,15) AS BIGINT)`).
    */
  def hash60(c: Column): Column =
    conv(substring(md5(c.cast("string")), 1, 15), 16, 10).cast("long")

  /** KMV estimate from a sorted sketch array: with fewer than k distinct
    * hashes the sketch is the complete distinct set (exact count);
    * otherwise (k-1)/U_k with U_k = k-th smallest hash / 2^60. The
    * arithmetic — one exact double product, one division, one floor — is
    * bit-identical on both engines (IEEE 754, same operation order).
    */
  def kmvEstimate(sketch: Column, k: Int): Column =
    when(size(sketch) < k, size(sketch).cast("long"))
      .otherwise(floor(lit((k - 1).toDouble * HashSpace) /
        element_at(sketch, k)).cast("long"))

  /** Per-group distinct estimates plus the merged all-groups estimate,
    * with exact distinct counts alongside (the oracle certifies both; the
    * spec certifies the estimate's error bound).
    *
    * Output: `(grp, est_distinct, exact_distinct)` — one row per group
    * and one `'ALL'` row whose sketch is built by MERGING the per-group
    * sketches (explode + re-aggregate), never by re-reading the input:
    * the rollup path a persisted sketch table uses at 100 TB. Correct by
    * the KMV merge property (k-smallest-of-union == k-smallest of
    * concatenated per-part k-smallest), which SketchesSpec pins against
    * the direct global sketch.
    *
    * Scale: partial aggregation caps every map task's state at k longs
    * per group, so the exchange carries O(groups × k); the merge pass is
    * O(groups × k) rows total. The exact counts ride the same per-group
    * exchange; the one cross join is 1-row × 1-row (PlanSweep-reviewed).
    */
  def kmvDistinctRollup(
      df: DataFrame, grp: Column, value: Column, k: Int = 64): DataFrame = {
    // pinned group exchange BEFORE the hash/sketch projection (Spread):
    // the per-row md5 + sketch insert otherwise ran inside the
    // single-split scan task, and the merge rode a 4-task AQE-coalesced
    // exchange (r13, StageProf); with the clustering established first,
    // build and merge fuse into one full-width stage
    val base = Spread.byKey(df.select(grp.as("grp"), value.as("v")),
        col("grp"))
      .withColumn("hv", hash60(col("v")))
    val per = base.groupBy("grp").agg(
      KmvAggregate.kmv(col("hv"), k).as("sketch"),
      count_distinct(col("v")).as("exact_distinct"))
    val merged = per
      .agg(KmvAggregate.kmvMerge(col("sketch"), k).as("sketch"))
    val globalExact = base.agg(count_distinct(col("v")).as("exact_distinct"))
    per.select(col("grp"), kmvEstimate(col("sketch"), k).as("est_distinct"),
        col("exact_distinct"))
      .unionByName(merged.crossJoin(broadcast(globalExact))
        .select(lit("ALL").as("grp"),
          kmvEstimate(col("sketch"), k).as("est_distinct"),
          col("exact_distinct")))
      .orderBy("grp")
  }

  /** HLL per-group distinct estimates plus the merged all-groups estimate —
    * the CONSTANT-state (2 KiB/group) twin of [[kmvDistinctRollup]]: same
    * output shape, same first-principles-certified merge path (`'ALL'`
    * row from register-max over the per-group sketches, never a re-read),
    * with `zero_regs` exposing the estimator regime (the raw estimate is
    * accurate past ~2.5·m ≈ 5 k distinct; below that KMV is exact anyway).
    * Exact counts ride alongside as the oracle's certificate.
    *
    * Scale: partial aggregation caps every map task at 2 KiB per group —
    * unlike KMV's TreeSet this never grows with k, so a billion-distinct
    * group costs what a thousand-distinct group costs; the exchange
    * carries O(groups × 2 KiB). See [[graft.functions.Hll]] for the
    * engine-reproducible register arithmetic.
    */
  def hllDistinctRollup(df: DataFrame, grp: Column, value: Column): DataFrame = {
    import graft.functions.Hll
    // pinned group exchange before the hash/register projection — same
    // serial-build + coalesced-merge fix as [[kmvDistinctRollup]]
    val base = Spread.byKey(df.filter(value.isNotNull)
        .select(grp.as("grp"), value.as("v")), col("grp"))
      .withColumn("hv", hash60(col("v")))
    val per = base.groupBy("grp").agg(
      Hll.hll(col("hv")).as("regs"),
      count_distinct(col("v")).as("exact_distinct"))
    val merged = per.agg(Hll.hllMerge(col("regs")).as("regs"))
    val globalExact = base.agg(count_distinct(col("v")).as("exact_distinct"))
    per.select(col("grp"),
        Hll.hllEstimate(col("regs")).as("est_distinct"),
        Hll.hllZeroRegs(col("regs")).as("zero_regs"),
        col("exact_distinct"))
      .unionByName(merged.crossJoin(broadcast(globalExact))
        .select(lit("ALL").as("grp"),
          Hll.hllEstimate(col("regs")).as("est_distinct"),
          Hll.hllZeroRegs(col("regs")).as("zero_regs"),
          col("exact_distinct")))
      .orderBy("grp")
  }

  /** Set-overlap estimation between two slices from KMV sketches alone —
    * the theta-sketch-style estimator: with `U` the k-smallest hashes of
    * A∪B (merged from the two slice sketches, never from the raw data),
    * the members of `U` present in BOTH slice sketches are a uniform
    * sample of the intersection below the union's threshold, so
    * `|A∩B| ≈ |U∩A∩B| / |U| · est(A∪B)` — exact whenever the union
    * carries fewer than k distinct values (the sketches are then the
    * complete sets), since the ratio collapses to the true count.
    *
    * Output (one row): per-slice and union estimates, the intersection
    * estimate, Jaccard, plus the exact intersection — the oracle's
    * certificate, recomputed by DuckDB from the identical md5-derived
    * hashes, so estimate AND merge AND estimator arithmetic are certified
    * bit-for-bit (same reasoning as [[kmvDistinctRollup]]).
    *
    * Why it matters at 100 TB: "how much does this month's user base
    * overlap with last month's" over persisted O(k) sketch state — no
    * re-scan of either slice, no data-sized distinct join. The whole
    * answer path after the two sketch aggregates is O(k) arrays on the
    * driver-side plan (1-row frames).
    *
    * Scale: one pass over the input builds both slice sketches (partial
    * aggregation caps map state at 2k longs); the union merge is a k-array
    * explode; the exact certificate rides one distinct-by-value aggregate
    * that the oracle needs anyway.
    */
  def kmvOverlap(
      df: DataFrame, value: Column, inA: Column, inB: Column,
      k: Int = 64): DataFrame = {
    val base = df.select(value.as("v"), inA.as("ina"), inB.as("inb"))
      .filter(col("v").isNotNull && (col("ina") || col("inb")))
      .withColumn("hv", hash60(col("v")))
    val sketches = base.agg(
      KmvAggregate.kmv(when(col("ina"), col("hv")), k).as("ska"),
      KmvAggregate.kmv(when(col("inb"), col("hv")), k).as("skb"))
    val merged = sketches.select(
      col("ska"), col("skb"),
      array_sort(array_distinct(concat(col("ska"), col("skb")))).as("cat"))
      .select(col("ska"), col("skb"),
        slice(col("cat"), 1, k).as("sku")) // k smallest of the union
    val exact = base.groupBy("v")
      .agg(max("ina").as("a"), max("inb").as("b"))
      .agg(sum(when(col("a") && col("b"), 1L).otherwise(0L))
        .as("exact_intersection"))
    merged.crossJoin(broadcast(exact)).select(
      kmvEstimate(col("ska"), k).as("est_a"),
      kmvEstimate(col("skb"), k).as("est_b"),
      kmvEstimate(col("sku"), k).as("est_union"),
      floor(
        size(array_intersect(array_intersect(col("sku"), col("ska")), col("skb")))
          .cast("double")
          * kmvEstimate(col("sku"), k) / size(col("sku")))
        .cast("long").as("est_intersection"),
      // est_int / est_union collapses to the sample ratio |U∩A∩B| / |U| —
      // an int/int rational, presented in exact fixed point (round(double)
      // is engine-dependent at exact 6-dp ties)
      exactRatio(
        size(array_intersect(array_intersect(col("sku"), col("ska")), col("skb"))),
        size(col("sku")), 6).as("jaccard"),
      col("exact_intersection"))
  }

  /** Count-min-sketch frequency estimation, certified against exact
    * counts: build a d×w CMS over `keyCol` (bucket hashes are md5-derived
    * and engine-reproducible, like every hash here), then answer the top
    * `topK` hottest keys from the SKETCH — est = min over the d rows of
    * that key's bucket count. Output per probe key:
    * `(key, exact_cnt, est_cnt)` with the one-sided guarantee
    * est ≥ exact, which the oracle certifies end-to-end because both
    * engines build the identical sketch.
    *
    * Why it matters at 100 TB: the sketch is O(d·w) state regardless of
    * key cardinality, additive across partitions (one partial-aggregable
    * groupBy), and answers ANY key's frequency after one pass — the
    * always-on frequency monitor where an exact per-key count table is
    * itself data-sized. The exact side here exists only as the oracle's
    * certificate.
    *
    * Plan: the bucket stream is a narrow d-way explode; the sketch
    * aggregate carries O(d·w) rows; probes (top-k exact keys) join the
    * broadcast sketch. Nothing after the two aggregates scales with the
    * data.
    */
  def cmsHeavyHitters(
      df: DataFrame, keyCol: String,
      d: Int = 4, w: Int = 256, topK: Int = 20): DataFrame = {
    def bucket(j: Column, key: Column): Column =
      conv(substring(md5(concat(j.cast("string"), lit(":"),
        key.cast("string"))), 1, 8), 16, 10).cast("long") % w
    // pinned key exchange before the d-way md5 fan-out (Spread): the
    // bucket hashing otherwise ran inside the single-split scan task; the
    // probes' exact-count groupBy rides the same exchange
    val keys = Spread.byKey(
      df.filter(col(keyCol).isNotNull).select(col(keyCol).as("key")),
      col("key"))
    val rows = keys.select(col("key"),
      explode(sequence(lit(0), lit(d - 1))).as("j"))
      .select(col("j"), bucket(col("j"), col("key")).as("bucket"))
    val sketch = rows.groupBy("j", "bucket").agg(count(lit(1)).as("cnt"))
    val probes = keys.groupBy("key").agg(count(lit(1)).as("exact_cnt"))
      .orderBy(col("exact_cnt").desc, col("key").asc)
      .limit(topK)
    probes
      .select(col("key"), col("exact_cnt"),
        explode(sequence(lit(0), lit(d - 1))).as("j"))
      .withColumn("bucket", bucket(col("j"), col("key")))
      .join(broadcast(sketch), Seq("j", "bucket"))
      .groupBy("key", "exact_cnt")
      .agg(min(col("cnt")).as("est_cnt"))
  }

  /** Equi-join SIZE estimation from two CMS sketches — the classic
    * sketch-based cardinality estimate a cost-based planner wants before
    * committing to a join strategy: |A ⋈ B| = Σ_key fA(key)·fB(key), the
    * inner product of the two frequency vectors, estimated per CMS row j
    * as Σ_bucket cntA(j,b)·cntB(j,b) and answered as the min over the d
    * rows. Hash collisions only ADD spurious products, so the estimate
    * is ONE-SIDED (est ≥ exact) — certified end-to-end by the oracle,
    * which rebuilds the identical sketches (same md5-derived buckets as
    * every hash here) and the exact join count.
    *
    * Why it matters at 100 TB: the exact answer IS the join; the
    * estimate needs one O(d·w) sketch per side — maintainable
    * incrementally (cell counts are additive), so "how big would this
    * join be" is answerable from standing state before any shuffle is
    * provisioned (skew detection, broadcast-vs-shuffle choice, quota
    * checks).
    *
    * Plan: two narrow d-way explodes + two O(d·w) aggregates; the
    * product join is (d·w)×(d·w) on (j, bucket) — bounded state, nothing
    * after the scans scales with data. Output one row:
    * `(est_join_size, exact_join_size)`.
    */
  def cmsJoinSize(
      dfA: DataFrame, keyA: Column, dfB: DataFrame, keyB: Column,
      d: Int = 4, w: Int = 256): DataFrame = {
    def bucket(j: Column, key: Column): Column =
      conv(substring(md5(concat(j.cast("string"), lit(":"),
        key.cast("string"))), 1, 8), 16, 10).cast("long") % w
    // pinned key exchange before the d-way md5 fan-out per side — the
    // [[cmsHeavyHitters]] serial-scan-stage fix (r13, StageProf: the
    // lineitem-side build was 0.94 s of single-task CPU)
    def sketch(df: DataFrame, key: Column, cntName: String) =
      Spread.byKey(
          df.filter(key.isNotNull).select(key.cast("string").as("key")),
          col("key"))
        .select(col("key"), explode(sequence(lit(0), lit(d - 1))).as("j"))
        .select(col("j"), bucket(col("j"), col("key")).as("bucket"))
        .groupBy("j", "bucket").agg(count(lit(1)).as(cntName))
    // numeric budget (r12 fixed-point sweep): ca·cb ≤ nA·nB overflows
    // BIGINT past ~3e9 rows a side, so the inner-product accumulates in
    // DECIMAL(38,0) — the oracle's HUGEINT sum was already wide. Only
    // the final scalar casts back to the BIGINT output contract (ANSI
    // fails loudly if the ESTIMATE itself tops 9.2e18 — a join that
    // size is not a row count any engine returns).
    val estimates = sketch(dfA, keyA, "ca")
      .join(sketch(dfB, keyB, "cb"), Seq("j", "bucket"))
      .groupBy("j")
      .agg(sum(col("ca").cast("decimal(19,0)") * col("cb")).as("row_est"))
      .agg(min("row_est").cast("long").as("est_join_size"))
    val exact = dfA.select(keyA.cast("string").as("key"))
      .join(dfB.select(keyB.cast("string").as("key")), "key")
      .agg(count(lit(1)).as("exact_join_size"))
    estimates.crossJoin(broadcast(exact))
  }

  /** Quantile sketch from a mergeable bottom-k-by-hash uniform sample
    * ([[graft.functions.SampleKAggregate]]) — the third leg of the sketch
    * triad (distinct = KMV, frequency = CMS, quantiles = this): per-group
    * median/p90 estimates from O(k) state, plus a merged `'ALL'` row whose
    * sample is re-aggregated FROM the per-group samples (explode +
    * sample_k), never from the raw data — valid because the groups
    * partition the rows, so bottom-k of the concatenated per-group
    * bottom-k IS the global bottom-k.
    *
    * The estimate is rank selection on the sample: value at rank
    * ceil(q·m) with the m sampled values sorted ascending — no
    * interpolation, so the estimate is a DATA value and the whole path
    * (hash, sample membership, selection) is engine-exact; the DuckDB
    * oracle reproduces sample and estimate bit-for-bit. With n ≤ k the
    * sample is the whole group and the estimate is exact. Exact
    * percentiles ride alongside as the certification columns (per-group
    * via a grouped window; global via the [[graft.operators
    * .GlobalRowNumber]] range exchange, not a one-partition window).
    *
    * Why it matters at 100 TB: percentiles need rank information that
    * plain aggregation can't carry; the exact path is a full sort. The
    * sample keeps O(k) state per group through partial aggregation (the
    * shuffle carries O(groups × k)), re-merges across any rollup level,
    * and its rank error is O(n/√k) w.h.p. — the standard
    * uniform-sample quantile bound.
    */
  def quantileSketch(
      df: DataFrame, grp: Column, id: Column, value: Column,
      k: Int = 64): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import graft.functions.SampleKAggregate
    // null value/id rows are excluded up front (mirrored in the oracle):
    // Spark windows sort nulls first, DuckDB last, so a null row would
    // silently shift every rank on one engine only
    val base = df.filter(value.isNotNull && id.isNotNull)
      .select(grp.as("grp"), value.cast("double").as("v"),
        hash60(id).as("hv"))
    val per = base.groupBy("grp").agg(
      SampleKAggregate.sampleK(col("hv"), col("v"), k).as("sample"),
      count(lit(1)).as("n_rows"))
    val mergedSample = per.select(explode(col("sample")).as("p"))
      .agg(SampleKAggregate.sampleK(col("p.hv"), col("p.v"), k).as("sample"))
    val globalN = base.agg(count(lit(1)).as("n_rows"))
    val withSample = per.select(col("grp"), col("sample"), col("n_rows"))
      .unionByName(mergedSample.crossJoin(broadcast(globalN))
        .select(lit("ALL").as("grp"), col("sample"), col("n_rows")))
    def est(q: Double): Column = {
      val vs = array_sort(expr("transform(sample, x -> x.v)"))
      round(element_at(vs, ceil(lit(q) * size(vs)).cast("int")), 2)
    }
    val estDf = withSample.select(col("grp"), col("n_rows"),
      size(col("sample")).cast("long").as("m"),
      est(0.5).as("est_p50"), est(0.9).as("est_p90"))
    // certification columns: exact rank-selected percentiles
    def pick(q: Double, rn: Column, n: Column): Column =
      round(min(when(rn === ceil(n * q), col("v"))), 2)
    val rankedPer = base
      .withColumn("rn",
        row_number().over(Window.partitionBy("grp").orderBy("v")))
      .withColumn("n", count(lit(1)).over(Window.partitionBy("grp")))
    val exactPer = rankedPer.groupBy("grp").agg(
      pick(0.5, col("rn"), col("n")).as("exact_p50"),
      pick(0.9, col("rn"), col("n")).as("exact_p90"))
    val rankedAll = graft.operators.GlobalRowNumber
      .withGlobalRowNumber(base.select(col("v")), "rn", Seq(col("v")))
      .crossJoin(broadcast(globalN))
    val exactAll = rankedAll.agg(
      pick(0.5, col("rn"), col("n_rows")).as("exact_p50"),
      pick(0.9, col("rn"), col("n_rows")).as("exact_p90"))
      .select(lit("ALL").as("grp"), col("exact_p50"), col("exact_p90"))
    estDf.join(exactPer.unionByName(exactAll), Seq("grp"))
      .orderBy("grp")
  }

  /** Misra–Gries heavy hitters with exact verification — the
    * deterministic read-out of a merge-order-DEPENDENT sketch (the open
    * design question that kept MG out of earlier rounds; CMS covered the
    * use case meanwhile). The trick is to lean only on the part of MG
    * that is merge-order INVARIANT: every key with true count strictly
    * above N/(k+1) is guaranteed present in the summary (its estimate
    * under-shoots by at most N/(k+1), hence stays positive), no matter
    * how Spark's partial aggregates tree-merged. So the summary is used
    * as a CANDIDATE set only; a second, candidate-filtered pass computes
    * exact counts and applies the `cnt·(k+1) > N` cutoff — integer
    * arithmetic, no division. Output = exactly the true heavy hitters:
    * deterministic, oracle = plain GROUP BY … HAVING.
    *
    * Why bother with the sketch if a GROUP BY gives the same answer? At
    * 100 TB the full GROUP BY shuffles every distinct key (billions);
    * this plan's first pass shuffles ≤ k·partitions summary entries
    * (the [[graft.functions.MisraGriesAggregate]] buffer is O(k) per
    * task), and the second pass aggregates ONLY rows matching ≤ k
    * broadcast candidate keys — map-side combine over ≤ k groups, an
    * O(k) exchange. Two scans, bounded shuffles; the estimates
    * themselves are spec-checked against the deficit bound but kept out
    * of the certified columns by design.
    */
  /** Incrementally-maintained quantile sketch — the [[quantileSketch]]
    * monoid exercised as maintenance: the standing corpus's bottom-k-by-
    * hash sample and a delta batch's sample merge by union-then-truncate,
    * and because membership is hash-deterministic the merged sample is
    * BIT-IDENTICAL to re-sketching base ∪ delta from scratch (not just
    * statistically equivalent — the property that lets a standing sample
    * absorb ingest batches forever without drift). Read-out: merged-
    * sample p50/p90 estimates plus the exact rank-selected certificate
    * over the union; oracle = the full recompute.
    *
    * Plan: two O(k)-state sample aggregates (each a partial-agg pass over
    * its side) + an O(k) merge; the exact certificate is the only
    * size-of-data tail and exists for certification, not production.
    */
  def quantileMaintain(
      df: DataFrame, id: Column, value: Column, isDelta: Column,
      k: Int = 64): DataFrame = {
    import graft.functions.SampleKAggregate
    val base = df.filter(value.isNotNull && id.isNotNull)
      .select(value.cast("double").as("v"), hash60(id).as("hv"),
        isDelta.as("is_delta"))
    def samp(side: DataFrame) = side
      .agg(SampleKAggregate.sampleK(col("hv"), col("v"), k).as("sample"))
      .select(explode(col("sample")).as("p"))
    val merged = samp(base.filter(!col("is_delta")))
      .unionByName(samp(base.filter(col("is_delta"))))
      .agg(SampleKAggregate.sampleK(col("p.hv"), col("p.v"), k).as("sample"))
    def est(q: Double): Column = {
      val vs = array_sort(expr("transform(sample, x -> x.v)"))
      round(element_at(vs, ceil(lit(q) * size(vs)).cast("int")), 2)
    }
    val estDf = merged.select(size(col("sample")).cast("long").as("m"),
      est(0.5).as("est_p50"), est(0.9).as("est_p90"))
    val globalN = broadcast(base.agg(count(lit(1)).as("n_rows")))
    def pick(q: Double, rn: Column, n: Column): Column =
      round(min(when(rn === ceil(n * q), col("v"))), 2)
    val ranked = graft.operators.GlobalRowNumber
      .withGlobalRowNumber(base.select(col("v")), "rn", Seq(col("v")))
      .crossJoin(globalN)
    val exact = ranked.agg(
      pick(0.5, col("rn"), col("n_rows")).as("exact_p50"),
      pick(0.9, col("rn"), col("n_rows")).as("exact_p90"))
    estDf.crossJoin(globalN).crossJoin(broadcast(exact))
      .select(col("n_rows"), col("m"), col("est_p50"), col("est_p90"),
        col("exact_p50"), col("exact_p90"))
  }

  /** Misra–Gries summary merge at the DATAFRAME level — the maintenance
    * face of [[mgHeavyHitters]]: two independently-built (key, est)
    * summaries combine by keywise sum, then prune back to ≤ k entries by
    * subtracting the (k+1)-th largest combined counter (ties at the
    * threshold drop to zero). Same algebra as
    * [[graft.functions.MisraGriesAggregate.merge]], operating on eval'd
    * read-outs: deficit_a ≤ N_a/(k+1) and deficit_b ≤ N_b/(k+1) sum to
    * ≤ N/(k+1), so the merged summary keeps the no-false-negative
    * guarantee over the union — a standing summary absorbs a delta
    * batch without re-scanning the base.
    *
    * Both inputs are ≤ k rows, so the window/1-row-broadcast here run on
    * O(k) state, never data.
    */
  def mgMergeSummaries(a: DataFrame, b: DataFrame, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val u = a.unionByName(b).groupBy("key").agg(sum(col("est")).as("est"))
    val ranked = u.withColumn("rn", row_number().over(
      Window.orderBy(col("est").desc, col("key").asc)))
    val cut = broadcast(ranked.agg(
      coalesce(max(when(col("rn") === k + 1, col("est"))), lit(0L))
        .as("cut")))
    ranked.crossJoin(cut)
      .filter(col("est") - col("cut") > 0L)
      .select(col("key"), (col("est") - col("cut")).as("est"))
  }

  /** Incrementally-maintained heavy hitters: the standing corpus's MG
    * summary (built once, O(k) state) merges with a delta batch's summary
    * via [[mgMergeSummaries]], and the merged candidate set feeds the
    * same exact verification pass as [[mgHeavyHitters]] — over base ∪
    * delta, WITHOUT ever re-sketching the base. Oracle = the full
    * recompute (the incr_agg_merge discipline): the published rows are
    * the exact heavy hitters of the union, deterministic because the
    * merged guarantee still bounds every deficit by N_total/(k+1).
    *
    * This is the operational shape at 100 TB: the base summary is
    * standing state (mergeable, additive), each ingest batch contributes
    * an O(k) summary, and only the ≤ k candidates' exact counts are ever
    * recomputed — the second pass groups on a broadcast-filtered key set.
    */
  def mgHeavyHittersIncremental(
      df: DataFrame, keyCol: Column, isDelta: Column, k: Int = 64): DataFrame = {
    val data = df.select(keyCol.as("key"), isDelta.as("is_delta"))
      .filter(col("key").isNotNull)
    def summarize(side: DataFrame): DataFrame = side
      .agg(graft.functions.MisraGriesAggregate.misraGries(col("key"), k).as("mg"))
      .select(explode(col("mg")).as("e"))
      .select(col("e.key").as("key"), col("e.est").as("est"))
    val cands = mgMergeSummaries(
      summarize(data.filter(!col("is_delta"))),
      summarize(data.filter(col("is_delta"))), k).select("key")
    val total = broadcast(data.agg(count(lit(1)).as("n_total")))
    data.join(broadcast(cands), Seq("key"), "left_semi")
      .groupBy("key").agg(count(lit(1)).as("exact_cnt"))
      .crossJoin(total)
      .filter(col("exact_cnt") * lit(k + 1L) > col("n_total"))
      .select(col("key"), col("exact_cnt"), col("n_total"))
  }

  /** Per-GROUP Misra–Gries heavy hitters — the shape that actually needs
    * the sketch at 100 TB: "the heavy keys inside EVERY segment" over
    * billions of segments, where the exact GROUP BY (segment, key) would
    * shuffle every distinct pair. Here the sketch aggregate runs under
    * groupBy(grp) — O(k) buffer per group, exchange carries groups·k
    * summary entries — and the per-group candidate sets semi-join back
    * (a plain (grp, key) equi-join: at billions of groups the candidate
    * table is itself large, so no broadcast is forced) for the exact,
    * deterministic read-out; the group-total join is O(groups). Same
    * guarantee as [[mgHeavyHitters]], applied per group.
    */
  def mgHeavyHittersGrouped(
      df: DataFrame, grpCol: Column, keyCol: Column, k: Int = 64): DataFrame = {
    val data = df.select(grpCol.as("grp"), keyCol.as("key"))
      .filter(col("key").isNotNull && col("grp").isNotNull)
    val cands = data.groupBy("grp")
      .agg(graft.functions.MisraGriesAggregate.misraGries(col("key"), k).as("mg"))
      .select(col("grp"), explode(col("mg")).as("e"))
      .select(col("grp"), col("e.key").as("key"))
    val totals = data.groupBy("grp").agg(count(lit(1)).as("n_total"))
    data.join(cands, Seq("grp", "key"), "left_semi")
      .groupBy("grp", "key").agg(count(lit(1)).as("exact_cnt"))
      .join(totals, Seq("grp"))
      .filter(col("exact_cnt") * lit(k + 1L) > col("n_total"))
      .select(col("grp"), col("key"), col("exact_cnt"), col("n_total"))
  }

  def mgHeavyHitters(df: DataFrame, keyCol: Column, k: Int = 64): DataFrame = {
    val data = df.select(keyCol.as("key")).filter(col("key").isNotNull)
    val summary = data.agg(
      graft.functions.MisraGriesAggregate.misraGries(col("key"), k).as("mg"))
    val cands = summary.select(explode(col("mg")).as("e"))
      .select(col("e.key").as("key"))
    val total = broadcast(data.agg(count(lit(1)).as("n_total")))
    data.join(broadcast(cands), Seq("key"), "left_semi")
      .groupBy("key").agg(count(lit(1)).as("exact_cnt"))
      .crossJoin(total)
      .filter(col("exact_cnt") * lit(k + 1L) > col("n_total"))
      .select(col("key"), col("exact_cnt"), col("n_total"))
  }
}
