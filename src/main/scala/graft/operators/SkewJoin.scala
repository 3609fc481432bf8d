package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys — the manual escape hatch when AQE's
  * skew-join splitting isn't available (e.g. a non-shuffle-join forced
  * elsewhere) or a single hot key dwarfs even split partitions.
  *
  * Mechanics: the large (skewed) side gets a deterministic salt in
  * [0, nSalts) derived from hashing its non-key columns; the small side is
  * exploded nSalts times, once per salt value. The join key becomes
  * (key, salt), spreading each hot key over nSalts reducers. Cost: small
  * side inflates by nSalts — pick nSalts ~ (hot-key rows / normal-partition
  * rows), not "as big as possible".
  *
  * The salt hashes a ROW-LOCAL component (partition id + per-row counter)
  * rather than the payload columns or rand(): payload-derived salts
  * collapse to a single reducer whenever a hot key's rows carry identical
  * payloads (exact duplicates, or a key-only table) — zero spreading while
  * still inflating the small side nSalts times — and rand() breaks
  * replayability. The row-counter salt spreads unconditionally; join
  * CORRECTNESS never depends on which salt a row gets.
  */
object SkewJoin {

  def saltedInnerJoin(
      large: DataFrame, small: DataFrame, keys: Seq[String],
      nSalts: Int = 8): DataFrame = {
    require(nSalts > 0, "nSalts must be positive")
    val saltedLarge = large.withColumn(
      "__salt",
      pmod(xxhash64(spark_partition_id(), monotonically_increasing_id()),
        lit(nSalts)).cast("int"))
    val saltedSmall = small.withColumn(
      "__salt", explode(sequence(lit(0), lit(nSalts - 1))))
    saltedLarge.join(saltedSmall, keys :+ "__salt")
      .drop("__salt")
  }
}
