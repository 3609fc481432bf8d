package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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
  * The salt uses xxhash64 over the large side's columns rather than rand():
  * deterministic output (replayable, testable) with the same spreading
  * effect, since payload columns vary within a hot key.
  */
object SkewJoin {

  def saltedInnerJoin(
      large: DataFrame, small: DataFrame, keys: Seq[String],
      nSalts: Int = 8): DataFrame = {
    require(nSalts > 0, "nSalts must be positive")
    val payload = large.columns.filterNot(keys.contains)
    val saltSrc: Seq[Column] =
      if (payload.nonEmpty) payload.toSeq.map(col) else keys.map(col)
    val saltedLarge = large.withColumn(
      "__salt", pmod(xxhash64(saltSrc: _*), lit(nSalts)).cast("int"))
    val saltedSmall = small.withColumn(
      "__salt", explode(sequence(lit(0), lit(nSalts - 1))))
    saltedLarge.join(saltedSmall, keys :+ "__salt")
      .drop("__salt")
  }
}
