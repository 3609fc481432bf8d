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

  /** S1∘S2 composition — the reference's ACTUAL trigger input: raw NetCDF
    * blobs (`function.json:4-10` binds the trigger to `.nc` blob PUTs;
    * `processor.py:121` decodes each with xarray). Structured Streaming
    * watches the directory for `.nc` files (checkpointed;
    * `maxFilesPerTrigger = 1` = host.json's batchSize-1 serial dequeue)
    * and each micro-batch decodes THROUGH THE ENGINE'S OWN BYTE DECODERS
    * — the DSv2 `gridded` source (CDF-1/2 via
    * [[graft.sources.NetcdfClassic]], NetCDF-4/HDF5 via
    * [[graft.sources.Hdf5Netcdf]]) — then runs the full pipeline.
    *
    * The stream carries only file PATHS (binaryFile's `content` column
    * is pruned away): the decode happens executor-side in the DSv2 scan
    * with per-slice partitions and column pruning, never in a
    * driver-held byte blob — at scale the stream is a file-arrival
    * ledger, not a data channel. The one driver-side action per batch is
    * the O(maxFilesPerTrigger) path collect — the same bounded class as
    * [[graft.icenet.TableOps]]' partition-prune collect. Replay/crash
    * semantics are [[start]]'s: checkpointed exactly-once file tracking
    * over an idempotent pipeline (StreamingSpec asserts post-stream
    * state == the batch path's, and replay convergence).
    */
  def startNc(
      spark: SparkSession, inputDir: String, warehouse: String,
      hemi: Hemisphere, checkpoint: String,
      availableNow: Boolean = false): StreamingQuery = {
    val arrivals = spark.readStream
      .format("binaryFile")
      .schema(binaryFileSchema) // streaming sources require it explicitly
      .option("pathGlobFilter", "*.nc")
      .option("maxFilesPerTrigger", 1)
      .load(inputDir)
      .select("path")
    val pipeline = new Pipeline(spark, warehouse, hemi)
    val writer = arrivals.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        // one ingest per file, name-ordered: the reference processes one
        // blob per invocation, and first-write-wins facts make the order
        // observable — a multi-file batch (catch-up runs) must not
        // interleave two drops in one ingest
        batch.select("path").collect().map(_.getString(0)).sorted.foreach {
          p => pipeline.ingest(spark.read.format("gridded").load(p))
        }
      }
    (if (availableNow) writer.trigger(Trigger.AvailableNow()) else writer)
      .start()
  }

  import org.apache.spark.sql.types._

  /** binaryFile's fixed schema, stated explicitly because streaming
    * sources refuse to infer (batch `spark.read.format("binaryFile")`
    * carries the same four fields).
    */
  val binaryFileSchema: StructType = StructType(Seq(
    StructField("path", StringType),
    StructField("modificationTime", TimestampType),
    StructField("length", LongType),
    StructField("content", BinaryType)))

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
