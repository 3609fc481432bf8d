package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Streaming deduplication for an event/document stream — the online
  * counterpart of the batch `ops.Dedup` family. A training-data ingest at
  * scale sees the same record delivered more than once (at-least-once
  * buses, retried uploads); these operators drop the repeats inside the
  * stream, before anything lands in the warehouse.
  *
  * Scale design: both variants keep state in the streaming state store,
  * sharded by the dedup key's hash — no global structure, no driver state.
  * The watermark bounds state size: a key older than the delay is evicted,
  * so memory is O(keys per watermark window), not O(stream history). That
  * eviction is also the semantic contract — duplicates separated by more
  * than the delay are NOT suppressed (they cannot be, with bounded state at
  * unbounded streams; route them to the batch exact-dedup which sees the
  * whole corpus).
  */
object StreamDedup {

  /** Exactly-once-per-id within the watermark: drops any row whose
    * `idCols` were already seen no longer than `delay` ago
    * (`dropDuplicatesWithinWatermark`, so state for an id is freed once
    * the watermark passes it — unlike plain `dropDuplicates`, whose state
    * grows forever on an unbounded stream).
    */
  def exactOnceWithin(
      stream: DataFrame, timeCol: String, delay: String,
      idCols: Seq[String]): DataFrame =
    stream
      .withWatermark(timeCol, delay)
      .dropDuplicatesWithinWatermark(idCols.head, idCols.tail: _*)

  /** Content-based streaming dedup: same mechanics, but the key is the
    * md5 fingerprint of the whitespace-normalized text (the batch
    * `TextAnalysis.fingerprint` semantics), so re-uploads with different
    * ids but identical content are dropped too.
    */
  def contentOnceWithin(
      stream: DataFrame, timeCol: String, delay: String,
      textCol: Column): DataFrame =
    stream
      .withColumn("__fp", graft.ops.TextAnalysis.fingerprint(textCol))
      .withWatermark(timeCol, delay)
      .dropDuplicatesWithinWatermark("__fp")
      .drop("__fp")
}
