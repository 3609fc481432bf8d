package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** 2-D skyline (Pareto frontier): rows not dominated on (minimize x,
  * maximize y). `b` dominates `a` iff `b.x <= a.x && b.y >= a.y` with at
  * least one strict — the standard definition, mirrored exactly by the
  * oracle's NOT EXISTS form.
  *
  * Plan shape — never the O(n²) dominance anti-join:
  *  1. `groupBy(x).max(y)` — map-side combine collapses the corpus to one
  *     row per distinct x before anything global happens.
  *  2. Bucketize x into ≤ `buckets` equi-width cells (bounds from a 1-row
  *     broadcast); per-bucket max is a `buckets`-row aggregate, whose
  *     exclusive prefix max over bucket order is a window over a
  *     CONSTANT-bounded input, broadcast back as the bucket's carry-in.
  *  3. The within-bucket exclusive running max is a window PARTITIONED BY
  *     bucket — parallel, never the single-partition global window a
  *     naive `ORDER BY x` running max plans (WindowExec's cluster-killer
  *     warning; same motivation as [[GlobalRowNumber]]).
  *  4. A row survives iff its y is the max at its x AND strictly exceeds
  *     max(carry-in, within-bucket running max) — i.e. the max y over all
  *     strictly-smaller x.
  *  5. Surviving (x, ymax) pairs join back to the input to recover full
  *     rows (all duplicates of a frontier point survive: neither
  *     dominates the other).
  *
  * Step 1's reduction means steps 2-4 touch one row per distinct x; the
  * frontier join-back in step 5 keys on x, so AQE broadcasts the (small)
  * frontier. Bucketing only shapes the PLAN — the output is bucket-count
  * invariant, which SkylineSpec pins against the naive dominance join.
  */
object Skyline {

  def skyline2D(
      df: DataFrame, xCol: String, yCol: String,
      buckets: Int = 256): DataFrame = {
    val x = col(xCol).cast("double")
    val g = df.groupBy(x.as("x")).agg(max(col(yCol)).as("ymax"))
    val bounds = g.agg(min("x").as("xmin"), max("x").as("xmax"))
    // equi-width bucket id in [0, buckets); degenerate range (xmin==xmax)
    // maps everything to bucket 0 via the +1e-9 width floor
    val span = greatest(col("xmax") - col("xmin"), lit(1e-9))
    val b = g.crossJoin(broadcast(bounds))
      .withColumn("bkt",
        least(floor((col("x") - col("xmin")) / span * buckets),
          lit(buckets - 1)).cast("int"))
      .select("x", "ymax", "bkt")
    val bmax = b.groupBy("bkt").agg(max("ymax").as("bymax"))
    val carry = bmax
      .withColumn("carry", max("bymax").over(
        Window.orderBy("bkt").rowsBetween(Window.unboundedPreceding, -1)))
      .select("bkt", "carry")
    // one distinct-x row per window row => ROWS frame == RANGE frame, so
    // "1 preceding" is exactly "all strictly smaller x in this bucket"
    val wb = Window.partitionBy("bkt").orderBy(col("x").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val frontier = b
      .join(broadcast(carry), Seq("bkt"), "left")
      .withColumn("runmax", max("ymax").over(wb))
      .filter(col("ymax") >
        coalesce(greatest(col("runmax"), col("carry")),
          lit(Long.MinValue)))
      .select(col("x").as("__sk_x"), col("ymax").as("__sk_ymax"))
    // reserved aliases: the input may itself have columns named x/ymax
    df.join(frontier,
      x === col("__sk_x") && col(yCol) === col("__sk_ymax"))
      .drop("__sk_x", "__sk_ymax")
  }
}
