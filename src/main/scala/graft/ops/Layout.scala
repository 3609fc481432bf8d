package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.ExactRatio.exactRatio

/** Data-layout effectiveness study: zone-map (block min/max) pruning under
  * Z-order vs linear (row-major) clustering — the quantified version of the
  * claim in [[graft.functions.ZOrderKey]]'s doc that Morton layout prunes
  * 2-D range predicates where a composite sort prunes only its leading
  * column.
  *
  * Why it matters at 100 TB: parquet scan cost is dominated by which FILES
  * a predicate can skip via their min/max statistics (zone maps). Layout
  * decides that: the same rows in the same number of blocks answer the
  * same box probe reading 4 % or 40 % of the data depending on the
  * clustering key. This operator measures exactly that — per (scheme ×
  * probe): blocks whose min/max envelope intersects the box, rows those
  * blocks contain (what a scan would READ), and rows actually matching
  * (what it NEEDS) — before anyone rewrites petabytes with
  * `TableOps.compact`.
  *
  * Everything is exact integer arithmetic: values bucket to an 8-bit grid
  * by pure integer scaling `(v · 256) div (max + 1)`, blocks are the top
  * bits of the clustering key (64 cells/block in both schemes), probes are
  * literal boxes in bucket space, and fractions present via [[exactRatio]]
  * — so the DuckDB oracle reproduces every number bit-for-bit (the Morton
  * key's SQL twin is the closed form Σᵢ 4ⁱ·(xbitᵢ + 2·ybitᵢ)).
  *
  * Plan shape: one pass buckets the data (1-row bounds broadcast), one
  * grouped aggregate per scheme builds the O(blocks) zone-map table, and
  * every probe evaluation joins PROBES × STATS — bounded × O(blocks),
  * never the data. The data-sized side is touched exactly twice (bucket
  * pass, matched-rows count).
  */
object Layout {

  private val Probes: Seq[(String, Int, Int, Int, Int)] = Seq(
    // (name, xlo, xhi, ylo, yhi) in 8-bit bucket space — a compact square
    // (Z-order's win), a full-width y-band, and a full-height x-band (the
    // x-major layout's home game): the honest three-way comparison
    ("square_32", 96, 127, 96, 127),
    ("band_y16", 0, 255, 120, 135),
    ("band_x16", 120, 135, 0, 255))

  /** Per (scheme × probe) zone-map pruning outcome over an 8-bit bucket
    * grid; schemes: `zorder` (Morton key) and `linear` (x-major composite).
    * Output: scheme, probe, blocks_total, blocks_read, rows_read,
    * rows_matched, rows_total, read_frac (rows_read/rows_total at 6 dp).
    */
  def zonemapPruneStudy(df: DataFrame, x: Column, y: Column): DataFrame = {
    val spark = df.sparkSession
    val base = df.filter(x.isNotNull && y.isNotNull)
      .select(x.cast("long").as("xv"), y.cast("long").as("yv"))
    val bounds = base.agg(max(col("xv")).as("xmax"), max(col("yv")).as("ymax"))
    def bucket(v: Column, vmax: Column): Column =
      exactDiv(v * lit(256L), vmax + lit(1L))
    val b = base.crossJoin(broadcast(bounds))
      .select(bucket(col("xv"), col("xmax")).as("xb"),
        bucket(col("yv"), col("ymax")).as("yb"))
      .select(col("xb"), col("yb"),
        shiftright(graft.functions.ZOrderKey.key(
          col("xb").cast("long"), col("yb").cast("long")), 6).as("zorder"),
        shiftright(col("xb") * lit(256L) + col("yb"), 6).as("linear"))
    val probes = spark.createDataFrame(
      spark.sparkContext.parallelize(Probes.map {
        case (n, xlo, xhi, ylo, yhi) =>
          Row(n, xlo.toLong, xhi.toLong, ylo.toLong, yhi.toLong)
      }, 1),
      StructType(Seq(StructField("probe", StringType, nullable = false),
        StructField("xlo", LongType, nullable = false),
        StructField("xhi", LongType, nullable = false),
        StructField("ylo", LongType, nullable = false),
        StructField("yhi", LongType, nullable = false))))
    val rowsTotal = b.agg(count(lit(1)).as("rows_total"))
    val matched = b.crossJoin(broadcast(probes))
      .filter(col("xb").between(col("xlo"), col("xhi")) &&
        col("yb").between(col("ylo"), col("yhi")))
      .groupBy("probe").agg(count(lit(1)).as("rows_matched"))
    def scheme(name: String): DataFrame = {
      val stats = b.groupBy(col(name).as("block"))
        .agg(min("xb").as("bxlo"), max("xb").as("bxhi"),
          min("yb").as("bylo"), max("yb").as("byhi"),
          count(lit(1)).as("n_rows"))
      val totals = stats.agg(count(lit(1)).as("blocks_total"))
      stats.crossJoin(broadcast(probes))
        .groupBy("probe")
        .agg(
          sum(when(col("bxhi") >= col("xlo") && col("bxlo") <= col("xhi") &&
            col("byhi") >= col("ylo") && col("bylo") <= col("yhi"), 1L)
            .otherwise(0L)).as("blocks_read"),
          sum(when(col("bxhi") >= col("xlo") && col("bxlo") <= col("xhi") &&
            col("byhi") >= col("ylo") && col("bylo") <= col("yhi"),
            col("n_rows")).otherwise(0L)).as("rows_read"))
        .crossJoin(broadcast(totals))
        .select(lit(name).as("scheme"), col("probe"), col("blocks_total"),
          col("blocks_read"), col("rows_read"))
    }
    scheme("zorder").unionByName(scheme("linear"))
      // left join: a probe matching ZERO rows must still report (its
      // blocks_read may be nonzero — a zone map can't prove emptiness)
      .join(matched, Seq("probe"), "left")
      .withColumn("rows_matched", coalesce(col("rows_matched"), lit(0L)))
      .crossJoin(broadcast(rowsTotal))
      .select(col("scheme"), col("probe"), col("blocks_total"),
        col("blocks_read"), col("rows_read"), col("rows_matched"),
        col("rows_total"),
        exactRatio(col("rows_read"), col("rows_total"), 6).as("read_frac"))
      .orderBy("scheme", "probe")
  }

  /** Integer floor division on non-negative longs (Catalyst IntegralDivide
    * — `div` in Spark SQL, `//` in DuckDB).
    */
  private def exactDiv(num: Column, den: Column): Column =
    org.apache.spark.sql.graftbridge.ColumnBridge.column(
      org.apache.spark.sql.catalyst.expressions.IntegralDivide(
        org.apache.spark.sql.graftbridge.ColumnBridge.expression(num.cast("long")),
        org.apache.spark.sql.graftbridge.ColumnBridge.expression(den.cast("long"))))

  /** Small-files compaction PLAN: given one input file per `dateCol` day
    * (the post-ingest swamp a daily writer leaves behind — size modeled
    * exactly as `n_rows·rowBytes + headerBytes`), assign each day-file to
    * an output bin by cutting the date-ordered byte stream at
    * `targetBytes` boundaries: bin = floor(bytes-before / target). The
    * streaming-concat formulation (inputs may split/merge freely — a
    * parquet rewrite can) keeps the plan a pure prefix sum: deterministic,
    * integer-exact, and date-clustering-preserving, where true next-fit /
    * first-fit-decreasing is inherently sequential state. One row per
    * output bin: file count, rows, bytes, and the date range it covers —
    * what [[graft.icenet.TableOps.compact]] would execute.
    *
    * Plan shape: one data-sized grouped aggregate collapses to O(days);
    * the cumulative window runs on that bounded day table (single
    * partition by design — the win is that planning runs on the day
    * domain, never on rows), then an O(bins) rollup. At 100 TB the input
    * would be the file manifest itself — already O(files) — and the only
    * data-sized stage disappears entirely.
    */
  def compactionPlan(
      df: DataFrame, dateCol: String, rowBytes: Long = 64L,
      headerBytes: Long = 1024L, targetBytes: Long = 262144L): DataFrame = {
    require(rowBytes > 0 && headerBytes >= 0 && targetBytes > 0,
      s"compactionPlan: bad size model ($rowBytes, $headerBytes, $targetBytes)")
    val files = df
      .groupBy(to_date(col(dateCol)).as("d"))
      .agg(count(lit(1)).as("n_rows"))
      .withColumn("bytes", col("n_rows") * rowBytes + headerBytes)
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("d"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    files
      .withColumn("cum_before", coalesce(sum(col("bytes")).over(w), lit(0L)))
      .withColumn("bin", exactDiv(col("cum_before"), lit(targetBytes)))
      .groupBy("bin")
      .agg(count(lit(1)).as("n_files"), sum("n_rows").as("n_rows"),
        sum("bytes").as("bin_bytes"),
        min("d").as("d_min"), max("d").as("d_max"))
      .orderBy("bin")
  }

  /** Clustering depth of a file layout over its sort column — the metric
    * a table-maintenance advisor computes BEFORE deciding to rewrite:
    * per layout, how many files' [lo, hi] key envelopes overlap each
    * point of the key span. Depth 1 everywhere = perfectly clustered
    * (zone maps prune to one file per point lookup); depth ≈ n_files =
    * time-partitioned-by-arrival (every file spans the whole key range
    * and nothing prunes). Reports max depth, the span-weighted average
    * depth (exact rational over integer segment lengths), and the exact
    * count of overlapping file PAIRS.
    *
    * Sweep-line, not pairwise: O(files) +1/−1 events, one window cumsum
    * per layout — never the O(files²) interval self-join. Closes sort
    * before opens at the same position (hi+1 half-open), so touching-but-
    * disjoint envelopes count zero overlap. Input contract: one row per
    * file with integral `lo` ≤ `hi`; `avg_depth`'s exact 6-dp form needs
    * Σ depth·len ≤ ~4.6e12 (ExactRatio's bound) — at wider key spans
    * present at coarser precision.
    */
  def clusteringDepth(files: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ev = files.select(col("layout"), col("fid"),
      col("lo").cast("long").as("pos"), lit(1L).as("delta"),
      lit(1L).as("typ"))
      .unionByName(files.select(col("layout"), col("fid"),
        (col("hi").cast("long") + lit(1L)).as("pos"), lit(-1L).as("delta"),
        lit(0L).as("typ")))
    val wRow = Window.partitionBy("layout")
      .orderBy(col("pos"), col("typ"), col("fid"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val runs = ev.withColumn("run", sum("delta").over(wRow))
    val pairs = runs.filter(col("typ") === 1L)
      .groupBy("layout")
      .agg(sum(col("run") - lit(1L)).as("overlap_pairs"))
    val wPos = Window.partitionBy("layout").orderBy("pos")
    val segs = ev.groupBy("layout", "pos").agg(sum("delta").as("net"))
      .withColumn("depth", sum("net").over(wPos))
      .withColumn("len", lead("pos", 1).over(wPos) - col("pos"))
    val agg = segs.groupBy("layout").agg(
      max("depth").as("max_depth"),
      sum(when(col("len").isNotNull, col("depth") * col("len")))
        .as("wsum"),
      min("pos").as("minp"), max("pos").as("maxp"))
    files.groupBy("layout").agg(count(lit(1)).as("n_files"))
      .join(agg, "layout").join(pairs, "layout")
      .select(col("layout"), col("n_files"),
        (col("maxp") - col("minp")).as("span"),
        col("max_depth"),
        exactRatio(col("wsum"),
          greatest(col("maxp") - col("minp"), lit(1L)), 6).as("avg_depth"),
        col("overlap_pairs"))
      .orderBy("layout")
  }

  /** Join-key skew audit — the pre-flight a planner (or an engineer) runs
    * before shuffling a 100 TB fact on a key: row/key counts, the hottest
    * key (deterministically the smallest key among the maximum-count
    * ones), its share of all rows, the skew factor max·keys/rows (1.0 =
    * perfectly uniform), and the salt fan-out that would flatten the hot
    * partition back to the average (⌈max·keys/rows⌉ — the `j12_salted_join`
    * prescription, computed instead of guessed).
    *
    * All exact integer arithmetic / fixed-point ratios. Plan: ONE
    * partial-aggregated groupBy on the key, then O(keys) 1-row rollups;
    * the hot-key argmin rides a broadcast of the 1-row max. Nothing here
    * scales with rows beyond the first exchange.
    */
  def joinKeySkew(fact: DataFrame, key: Column): DataFrame = {
    val counts = fact.select(key.cast("long").as("k"))
      .groupBy("k").agg(count(lit(1)).as("cnt"))
    val tot = counts.agg(
      sum(col("cnt")).as("n_rows"), count(lit(1)).as("n_keys"),
      max(col("cnt")).as("max_cnt"))
    val hot = counts
      .join(broadcast(tot.select(col("max_cnt").as("mx"))),
        col("cnt") === col("mx"))
      .agg(min(col("k")).as("hot_key"))
    tot.crossJoin(broadcast(hot))
      .select(col("n_rows"), col("n_keys"), col("hot_key"), col("max_cnt"),
        exactRatio(col("max_cnt"), col("n_rows"), 6).as("hot_share"),
        exactRatio(col("max_cnt") * col("n_keys"), col("n_rows"), 6)
          .as("skew_factor"),
        // ceil-div as floor of one double division of exact BIGINTs —
        // identical doubles floor identically on both engines (the oracle
        // mirrors this construction, never `//`, so no div-convention gap)
        floor((col("max_cnt") * col("n_keys") + col("n_rows") - 1)
          .cast("double") / col("n_rows").cast("double"))
          .cast("long").as("salt_factor"))
  }
}
