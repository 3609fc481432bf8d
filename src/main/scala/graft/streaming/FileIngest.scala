package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.icenet.{Hemisphere, Pipeline}

/** Structured-Streaming re-expression of the reference's blob trigger (S1):
  * one pipeline run per file landing in a watched directory
  * (reference: function.json:4-10 binding + host.json:4-8 serial dequeue).
  *
  * Mapping of the reference's delivery semantics:
  *  - blob PUT -> file appears in `inputDir` (parquet, already long-form;
  *    NetCDF decode is the deferred S2 source);
  *  - `batchSize: 1` serial processing -> `maxFilesPerTrigger = 1` and a
  *    single query with `foreachBatch` (micro-batches are strictly ordered);
  *  - at-most-once dequeue + manual replay -> checkpointed exactly-once file
  *    tracking (strictly stronger: replay = remove checkpoint entry);
  *  - idempotent re-processing -> Pipeline.ingest converges (first-write-wins
  *    facts, last-write-wins meta, full-refresh view), so even a replayed
  *    batch cannot corrupt state.
  */
object FileIngest {

  /** Start the per-file ingest stream. `schema` must match the long-form raw
    * frame (FIXTURES.md §B.1). Caller stops the query or uses
    * `processAllAvailable()` in tests / AvailableNow in batch-catchup runs.
    */
  def start(
      spark: SparkSession, inputDir: String, warehouse: String,
      hemi: Hemisphere, checkpoint: String,
      availableNow: Boolean = false): StreamingQuery = {
    val raw = spark.readStream
      .schema(rawSchema)
      .option("maxFilesPerTrigger", 1)
      .parquet(inputDir)
    val pipeline = new Pipeline(spark, warehouse, hemi)
    val writer = raw.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) pipeline.ingest(batch)
      }
    (if (availableNow) writer.trigger(Trigger.AvailableNow()) else writer)
      .start()
  }

  import org.apache.spark.sql.types._
  val rawSchema: StructType = StructType(Seq(
    StructField("time", TimestampType),
    StructField("leadtime", IntegerType),
    StructField("xc", DoubleType),
    StructField("yc", DoubleType),
    StructField("lat", DoubleType),
    StructField("lon", DoubleType),
    StructField("sic_mean", DoubleType),
    StructField("sic_stddev", DoubleType)))
}
