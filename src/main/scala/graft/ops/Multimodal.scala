package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) column plumbing: media travel as opaque
  * `binary` payloads next to typed metadata, and per-batch decode /
  * feature-extraction runs as partition-local iterator transforms.
  *
  * The Spark-side contract is real and tested — schema, batching shape,
  * partition sizing, output schema — while the codec itself is a STUB
  * (`FakeCodec`): this container has no image/audio libraries, so decode is
  * a deterministic fake over the payload bytes. Swapping in a real codec
  * (javacv, a JNI decoder, an ONNX runtime) changes ONLY the function body
  * passed to [[decodeBatches]]; every plan around it is unchanged.
  *
  * Scale notes: payloads stay columnar parquet `binary`; decode is
  * mapPartitions (one codec init per partition, not per row — the same
  * reason PySpark uses mapInPandas batches); metadata predicates (kind,
  * width, duration) push down to the scan so a "decode only the JPEGs over
  * 512px" job never reads the other payload bytes.
  */
object Multimodal {

  /** One media row: opaque payload + typed metadata. */
  case class MediaRow(
      media_id: Long, kind: String, payload: Array[Byte],
      width: Int, height: Int, sample_rate: Int, n_frames: Int)

  /** Decoded feature row produced by the (stubbed) codec. */
  case class MediaFeatures(
      media_id: Long, kind: String, n_bytes: Int,
      checksum: Long, features: Array[Float])

  /** STUB codec — deterministic stand-in for image/audio decode.
    * Real implementation would decode `payload` with a native library;
    * the fake derives a checksum + fixed-width feature vector from the
    * bytes so tests can assert exact plumbing behavior.
    */
  object FakeCodec {
    val FeatureDim = 8
    /** Position-weighted byte sum (wrap-free, so the DuckDB oracle can
      * reproduce it exactly) + a feature vector derived from it.
      */
    def decode(row: MediaRow): MediaFeatures = {
      var sum = 0L
      var i = 0
      while (i < row.payload.length) {
        sum += (row.payload(i) & 0xff).toLong * ((i % 7) + 1)
        i += 1
      }
      val feats = Array.tabulate(FeatureDim)(j =>
        ((sum * (j + 1)) % 256).toFloat / 255f)
      MediaFeatures(row.media_id, row.kind, row.payload.length, sum, feats)
    }
  }

  /** Partition-local batched decode: one codec context per partition,
    * rows streamed through it lazily (never materializes a partition).
    */
  def decodeBatches(
      media: Dataset[MediaRow],
      codec: MediaRow => MediaFeatures = FakeCodec.decode): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // real codec: init native context here, close on iterator end
      rows.map(codec)
    }
  }

  /** One embedded media row: the model output plus the row's position in
    * its inference batch (spec-checked geometry; excluded from oracles
    * because it depends on physical partitioning).
    */
  case class MediaEmbedding(media_id: Long, batch_pos: Int, embedding: Array[Double])

  /** STUB model — deterministic stand-in for batched GPU inference. The
    * embedding is a pure function of the row's checksum, so results are
    * independent of batch composition (what a real stateless model also
    * guarantees) and the DuckDB oracle can replay them.
    */
  object FakeModel {
    val Dim = 4
    def embed(batch: Seq[MediaRow]): Seq[Array[Double]] =
      batch.map { r =>
        val sum = FakeCodec.decode(r).checksum
        Array.tabulate(Dim)(j => ((sum + j) % 97).toDouble / 97.0)
      }
  }

  /** Batched model inference — the mapInPandas batch shape in Scala: rows
    * are grouped into `batchSize` slices per partition (one model call per
    * slice, the geometry a GPU server amortizes its kernel launches over),
    * outputs re-flattened in order with their batch position. The grouped
    * iterator never materializes a partition; a real deployment replaces
    * `model` with an ONNX/Triton client initialized once per partition.
    */
  def embedBatches(
      media: Dataset[MediaRow], batchSize: Int = 32,
      model: Seq[MediaRow] => Seq[Array[Double]] = FakeModel.embed): Dataset[MediaEmbedding] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        val embs = model(batch)
        require(embs.length == batch.length,
          s"model returned ${embs.length} embeddings for ${batch.length} rows")
        batch.iterator.zip(embs.iterator).zipWithIndex.map {
          case ((r, e), i) => MediaEmbedding(r.media_id, i, e)
        }
      }
    }
  }

  /** Metadata-pruned selection: predicates on kind/dimensions push down to
    * parquet so undecodable/oversized payloads are never read.
    */
  def selectDecodable(
      media: DataFrame, kinds: Seq[String], maxBytes: Int): DataFrame =
    media.filter(col("kind").isin(kinds: _*) && length(col("payload")) <= maxBytes)

  /** Frame sampling plan for video-kind rows: every `stride`-th frame index,
    * as (media_id, frame_idx) work units — the fan-out that feeds a frame
    * decoder. Pure narrow expression.
    */
  def sampleFrames(media: DataFrame, stride: Int): DataFrame =
    media.filter(col("kind") === "video" && col("n_frames") > 0)
      .select(col("media_id"),
        explode(sequence(lit(0), col("n_frames") - 1, lit(stride))).as("frame_idx"))

  /** Build a media table from the documents fixture (text bytes as payload)
    * — the shape used by tests and demos; a real deployment reads
    * `binaryFile` sources or parquet with binary columns directly.
    */
  def mediaFromDocuments(docs: DataFrame): Dataset[MediaRow] = {
    import docs.sparkSession.implicits._
    docs.select(
        col("doc_id").as("media_id"),
        // deterministic kind assignment: cycle image/audio/video
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("kind"),
        encode(col("text"), "UTF-8").as("payload"),
        (pmod(col("doc_id"), lit(64)) + 1).cast("int").as("width"),
        (pmod(col("doc_id"), lit(48)) + 1).cast("int").as("height"),
        lit(16000).as("sample_rate"),
        (pmod(col("doc_id"), lit(100)) + 1).cast("int").as("n_frames"))
      .as[MediaRow]
  }
}
