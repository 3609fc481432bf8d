package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** As-of (point-in-time) left join: for each left row, attach the payload of
  * the LATEST right row with `right.timeCol <= left.timeCol` for the same
  * key — the temporal-join primitive Spark lacks natively.
  *
  * Implemented by composition (preference (a) of the custom-operator ladder):
  * tag and union both sides, then one window pass per key ordered by
  * (time, side) taking the last non-null right-payload STRUCT. Right rows
  * sort before left rows at equal timestamps, so the match is inclusive.
  *
  * The payload travels as ONE struct column, filled with ONE
  * last(ignoreNulls=true): the matched right row stays atomic. Filling each
  * payload column independently (the r1 formulation) would let a right row
  * whose payload value is genuinely NULL be skipped in favor of a stale
  * value from an older right row — and let different payload columns come
  * from DIFFERENT right rows. With the struct, a matched right row's NULL
  * payload field stays NULL, matching true as-of semantics (and DuckDB's
  * ASOF JOIN oracle) even on null-bearing payloads.
  *
  * Scale: ONE shuffle (hash partition by key) + ONE sort per partition —
  * same cost as a sort-merge join, with no range-explosion risk; skewed keys
  * are handled by AQE like any other exchange. This beats the
  * join-then-filter-then-argmax formulation, which shuffles the full
  * left x right-per-key product.
  */
object AsOfJoin {

  /** @param rightPayload right columns to carry (must not collide with left
    *                     column names — rename on the right side first)
    */
  def leftAsOf(
      left: DataFrame, right: DataFrame, key: String,
      leftTime: String, rightTime: String,
      rightPayload: Seq[String]): DataFrame = {
    require(rightPayload.forall(!left.columns.contains(_)),
      "rightPayload columns must not collide with left columns")
    val payloadType = StructType(rightPayload.map(p => right.schema(p).copy(name = p)))

    // left rows carry a NULL struct (skipped by last(ignoreNulls)); right
    // rows carry the whole payload as one non-null struct, so the window
    // fill picks entire right rows, never a column-wise mix.
    val lAug = left
      .withColumn("__t", col(leftTime))
      .withColumn("__side", lit(1))
      .withColumn("__p", lit(null).cast(payloadType))
      .select((left.columns.map(col).toIndexedSeq :+ col("__p") :+ col("__t") :+ col("__side")): _*)
    val rAug = {
      val base = right.select(
        col(rightTime).as("__t"), lit(0).as("__side"), col(key).as(key),
        struct(rightPayload.map(col): _*).as("__p"))
      left.columns.filter(_ != key).foldLeft(base) { (df, c) =>
        df.withColumn(c, lit(null).cast(left.schema(c).dataType))
      }.select((left.columns.map(col).toIndexedSeq :+ col("__p") :+ col("__t") :+ col("__side")): _*)
    }
    // Right-side ties: two right rows sharing (key, time) would make the
    // window fill pick whichever happens to sort last — partition-order
    // nondeterminism an engine must never exhibit (caught at sf1, where
    // the scaled fixture carries exact duplicate purchase timestamps).
    // Pinned semantic: the LARGEST payload tuple (struct comparison =
    // field-lexicographic, so a leading unique id makes it total) wins.
    // Oracles mirror it with a row_number-DESC dedup of the right CTE.
    val rAugD = rAug
      .withColumn("__rn", row_number().over(
        Window.partitionBy(col(key), col("__t")).orderBy(col("__p").desc)))
      .filter(col("__rn") === 1).drop("__rn")
    val unioned = lAug.unionByName(rAugD)

    val w = Window.partitionBy(key).orderBy(col("__t").asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    unioned
      .withColumn("__p", last(col("__p"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(left.columns.map(col).toIndexedSeq ++
        rightPayload.map(p => col(s"__p.$p").as(p)): _*)
  }

  /** Forward as-of join: for each left row, the EARLIEST right row with
    * `right.timeCol >= left.timeCol` per key (pandas
    * `merge_asof(direction='forward')` — "the next reading after this
    * event"). Implemented by time negation over [[leftAsOf]]: the
    * earliest-at-or-after match under t is exactly the
    * latest-at-or-before match under −t (exact integer microsecond
    * negation, so the reduction is lossless), which also hands the
    * DuckDB oracle a spelling — ASOF JOIN only looks backward, but
    * backward over negated epochs IS forward. Tie semantics inherit
    * [[leftAsOf]]'s pinned rule (right rows sharing (key, time): largest
    * payload tuple wins).
    */
  def leftAsOfForward(
      left: DataFrame, right: DataFrame, key: String,
      leftTime: String, rightTime: String,
      rightPayload: Seq[String]): DataFrame = {
    val lt = "__asof_neg_l"
    val rt = "__asof_neg_r"
    leftAsOf(
      left.withColumn(lt, -unix_micros(col(leftTime).cast("timestamp"))),
      right.withColumn(rt, -unix_micros(col(rightTime).cast("timestamp"))),
      key, lt, rt, rightPayload)
      .drop(lt)
  }

  /** Nearest as-of join — pandas `merge_asof(direction='nearest')`: for
    * each left row, whichever of the latest-at-or-before and
    * earliest-at-or-after right rows sits closer in time (exact integer
    * microsecond distances). PINNED tie rule: equidistant candidates go
    * BACKWARD (pandas' `bdiff <= fdiff` comparison); right rows sharing
    * (key, time) inherit [[leftAsOf]]'s largest-payload rule. A one-sided
    * miss (nothing before / nothing after) falls back to the other side;
    * no right row at all leaves the payload null.
    *
    * Composed from the two directional passes (each the one-shuffle
    * window plan), with the matched right TIME riding each payload struct
    * so the pick is a per-row integer comparison; both candidate rows
    * stay ATOMIC — the winner's payload is taken whole, never a
    * column-wise mix of the two sides.
    */
  def leftAsOfNearest(
      left: DataFrame, right: DataFrame, key: String,
      leftTime: String, rightTime: String,
      rightPayload: Seq[String]): DataFrame = {
    val bSuf = "__near_b"
    val fSuf = "__near_f"
    val bt = "__near_bt"
    val ft = "__near_ft"
    def renamed(suffix: String): DataFrame =
      rightPayload.foldLeft(right)((df, p) => df.withColumnRenamed(p, p + suffix))
    val bwd = leftAsOf(left, renamed(bSuf).withColumn(bt, col(rightTime)),
      key, leftTime, rightTime, rightPayload.map(_ + bSuf) :+ bt)
    val both = leftAsOfForward(bwd, renamed(fSuf).withColumn(ft, col(rightTime)),
      key, leftTime, rightTime, rightPayload.map(_ + fSuf) :+ ft)
    val lt = unix_micros(col(leftTime).cast("timestamp"))
    val dBack = lt - unix_micros(col(bt).cast("timestamp"))
    val dFwd = unix_micros(col(ft).cast("timestamp")) - lt
    val useBack = col(bt).isNotNull && (col(ft).isNull || dBack <= dFwd)
    val filled = rightPayload.foldLeft(both) { (d, p) =>
      d.withColumn(p, when(useBack, col(p + bSuf)).otherwise(col(p + fSuf)))
    }
    filled.select(left.columns.map(col).toIndexedSeq ++
      rightPayload.map(col): _*)
  }

  /** [[leftAsOf]] with a staleness bound — pandas `merge_asof(...,
    * tolerance=...)`: a match older than `toleranceMicros` is discarded
    * (whole payload nulled AT ONCE, preserving the row-atomicity
    * guarantee). The matched right TIME rides the payload struct
    * internally, and the bound compares exact integer MICROSECONDS on
    * both engines (`unix_micros` / DuckDB `epoch_us`) — a seconds-
    * truncated comparison would disagree with an exact-interval engine
    * on fractional-second timestamps. Same one-shuffle plan as
    * [[leftAsOf]].
    */
  def leftAsOfTolerance(
      left: DataFrame, right: DataFrame, key: String,
      leftTime: String, rightTime: String,
      rightPayload: Seq[String], toleranceMicros: Long): DataFrame = {
    require(toleranceMicros >= 0, "toleranceMicros must be non-negative")
    val rt = "__asof_rt"
    val joined = leftAsOf(
      left, right.withColumn(rt, col(rightTime)),
      key, leftTime, rightTime, rightPayload :+ rt)
    val within = col(rt).isNotNull &&
      (unix_micros(col(leftTime).cast("timestamp")) -
        unix_micros(col(rt).cast("timestamp"))) <= toleranceMicros
    rightPayload.foldLeft(joined) { (df, p) =>
      df.withColumn(p, when(within, col(p)))
    }.drop(rt)
  }
}
