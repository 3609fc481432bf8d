package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) column plumbing: media travel as opaque
  * `binary` payloads next to typed metadata, and per-batch decode /
  * feature-extraction runs as partition-local iterator transforms.
  *
  * IMAGE decode is REAL: [[ImageCodec]] decodes PNG/JPEG/BMP/GIF payloads
  * with JDK `javax.imageio.ImageIO` (ships in the JDK — no external
  * dependency) and extracts exact dimensions + per-channel pixel sums.
  * AUDIO decode is REAL too: [[AudioCodec]] decodes WAV/PCM (signed
  * 16-bit, mono/stereo) with JDK `javax.sound.sampled` and extracts
  * exact per-payload amplitude/energy sums. Only VIDEO decode remains a
  * STUB (`FakeCodec`): the JDK genuinely ships no video codec. Swapping
  * in a real one (javacv, a JNI decoder, an ONNX runtime) changes ONLY
  * the function body passed to [[decodeBatches]]; every plan around it
  * is unchanged.
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

  /** Exact per-channel pixel statistics of one decoded image. All-integer
    * output (sums, not means) so the DuckDB oracle can reproduce the
    * values bit-for-bit with pure arithmetic — no float rounding to
    * disagree over.
    */
  case class ImageStats(
      media_id: Long, width: Int, height: Int, n_pixels: Long,
      sum_r: Long, sum_g: Long, sum_b: Long)

  /** REAL image codec on JDK `javax.imageio.ImageIO` — PNG, JPEG, BMP,
    * GIF, with zero external dependencies. Undecodable payloads fail
    * LOUDLY naming the row (an unreadable image in a curation pipeline is
    * a data defect to surface, not a row to silently drop — callers that
    * want drop semantics filter with [[selectDecodable]] first).
    */
  object ImageCodec {

    /** Decode one payload and reduce it to exact channel sums. */
    def decode(row: MediaRow): ImageStats = {
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(row.payload))
      require(img != null,
        s"media_id=${row.media_id}: payload (${row.payload.length} bytes) " +
          "is not a decodable image (PNG/JPEG/BMP/GIF)")
      val (w, h) = (img.getWidth, img.getHeight)
      var (sr, sg, sb) = (0L, 0L, 0L)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val rgb = img.getRGB(x, y)
          sr += (rgb >> 16) & 0xff
          sg += (rgb >> 8) & 0xff
          sb += rgb & 0xff
          x += 1
        }
        y += 1
      }
      ImageStats(row.media_id, w, h, w.toLong * h, sr, sg, sb)
    }

    /** Partition-local batched image decode. `ImageIO.setUseCache(false)`
      * once per partition: the default disk-backed stream cache would add
      * a temp-file round trip per image — pure-memory decode is the right
      * shape for a 100 TB scan where payloads already sit in the task's
      * columnar batch.
      */
    def decodeImages(media: Dataset[MediaRow]): Dataset[ImageStats] = {
      import media.sparkSession.implicits._
      media.mapPartitions { rows =>
        javax.imageio.ImageIO.setUseCache(false)
        rows.map(decode)
      }
    }
  }

  /** Exact per-channel sample statistics of one decoded audio payload.
    * Integer sums (amplitude and energy), not float means, so the DuckDB
    * oracle reproduces them bit-for-bit from the waveform's closed form.
    */
  case class AudioStats(
      media_id: Long, sample_rate: Int, channels: Int, n_samples: Long,
      sum_amp: Long, sum_sq: Long)

  /** REAL audio codec on JDK `javax.sound.sampled` — WAV/PCM (signed
    * 16-bit, mono or stereo), zero external dependencies: the same
    * offline-constraint demolition as ImageIO for images and the pure-JVM
    * HDF5 decoder. Undecodable payloads fail LOUDLY naming the row.
    * Video remains the one stubbed kind ([[FakeCodec]]) — the JDK truly
    * ships no video codec.
    */
  object AudioCodec {

    /** Decode one payload and reduce it to exact amplitude/energy sums
      * (summed across channels; `n_samples` is per channel).
      */
    def decode(row: MediaRow): AudioStats = {
      val in =
        try javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(row.payload))
        catch {
          case e: javax.sound.sampled.UnsupportedAudioFileException =>
            throw new IllegalArgumentException(
              s"media_id=${row.media_id}: payload (${row.payload.length} " +
                s"bytes) is not decodable audio (WAV/PCM): ${e.getMessage}")
        }
      try {
        val f = in.getFormat
        require(f.getEncoding ==
          javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED &&
          f.getSampleSizeInBits == 16,
          s"media_id=${row.media_id}: ${f.getEncoding}/" +
            s"${f.getSampleSizeInBits}-bit unsupported (PCM signed 16-bit " +
            "only)")
        val ch = f.getChannels
        val bytes = in.readAllBytes()
        val frames = bytes.length / (2 * ch)
        var (sum, sumSq) = (0L, 0L)
        var i = 0
        val bb = java.nio.ByteBuffer.wrap(bytes).order(
          if (f.isBigEndian) java.nio.ByteOrder.BIG_ENDIAN
          else java.nio.ByteOrder.LITTLE_ENDIAN)
        while (i < frames * ch) {
          val v = bb.getShort(i * 2).toLong
          sum += v
          sumSq += v * v
          i += 1
        }
        AudioStats(row.media_id, f.getSampleRate.toInt, ch, frames, sum, sumSq)
      } finally in.close()
    }

    /** Partition-local batched audio decode — same shape as
      * [[ImageCodec.decodeImages]].
      */
    def decodeAudio(media: Dataset[MediaRow]): Dataset[AudioStats] = {
      import media.sparkSession.implicits._
      media.mapPartitions(rows => rows.map(decode))
    }
  }

  /** STUB codec — deterministic stand-in for VIDEO decode only (images
    * decode for real via [[ImageCodec]]/ImageIO, audio via
    * [[AudioCodec]]/javax.sound; the JDK ships no video codec).
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

  /** Build a REAL-PNG media table from the documents fixture: each doc_id
    * becomes a two-tone PNG whose dimensions and pixel colors are pure
    * arithmetic in doc_id —
    *   w = id%64 + 1, h = id%48 + 1,
    *   left  columns x < w div 2: (id%256, 7id%256, 13id%256)
    *   right columns            : (3id%256, 5id%256, 11id%256)
    * — so a DuckDB oracle can predict the decoder's exact output
    * (dims + channel sums) WITHOUT being able to decode PNG itself. That
    * makes the round trip a decode certification: only a codec that
    * really parses the PNG (zlib inflate, filter reversal, per-pixel
    * reads) reproduces the arithmetic. Encoding is partition-local
    * ImageIO, one in-memory buffer per row.
    */
  def pngFromDocuments(docs: DataFrame): Dataset[MediaRow] = {
    import docs.sparkSession.implicits._
    docs.select(col("doc_id")).as[Long].mapPartitions { ids =>
      javax.imageio.ImageIO.setUseCache(false)
      ids.map { id =>
        val w = (id % 64).toInt + 1
        val h = (id % 48).toInt + 1
        val left = ((id % 256).toInt << 16) |
          (((id * 7) % 256).toInt << 8) | ((id * 13) % 256).toInt
        val right = (((id * 3) % 256).toInt << 16) |
          (((id * 5) % 256).toInt << 8) | ((id * 11) % 256).toInt
        val img = new java.awt.image.BufferedImage(
          w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            img.setRGB(x, y, if (x < w / 2) left else right)
            x += 1
          }
          y += 1
        }
        val out = new java.io.ByteArrayOutputStream()
        require(javax.imageio.ImageIO.write(img, "png", out),
          s"no PNG writer available for doc_id=$id")
        MediaRow(id, "image", out.toByteArray, w, h, 0, 0)
      }
    }
  }

  /** Canonical-PCM WAV bytes for a 16-bit LE mono waveform — the fixture
    * serializer for [[AudioCodec]] certification (byte-authored like the
    * CDF-1/HDF5/PNG fixtures, decoded back by the JDK's own parser).
    */
  def wavBytes(samples: Array[Short], rate: Int, channels: Int = 1): Array[Byte] = {
    val dataLen = samples.length * 2
    val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes).putInt(36 + dataLen).put("WAVE".getBytes)
    bb.put("fmt ".getBytes).putInt(16)
      .putShort(1) // PCM
      .putShort(channels.toShort)
      .putInt(rate)
      .putInt(rate * 2 * channels) // byte rate
      .putShort((2 * channels).toShort) // block align
      .putShort(16) // bits per sample
    bb.put("data".getBytes).putInt(dataLen)
    samples.foreach(bb.putShort)
    bb.array()
  }

  /** Build a REAL-WAV media table from the documents fixture: each doc_id
    * becomes a mono 16-bit PCM WAV whose waveform is pure integer
    * arithmetic in (doc_id, sample index) —
    *   n = id%200 + 40, rate = 8000 + (id%4)·4000,
    *   sample(i) = (id·31 + i·7919) % 2001 − 1000
    * — so the DuckDB oracle predicts the decoder's exact amplitude and
    * energy sums from `generate_series` WITHOUT parsing WAV. Only a codec
    * that really walks the RIFF chunks and PCM frames reproduces them.
    */
  def wavFromDocuments(docs: DataFrame): Dataset[MediaRow] = {
    import docs.sparkSession.implicits._
    docs.select(col("doc_id")).as[Long].mapPartitions { ids =>
      ids.map { id =>
        val n = (id % 200).toInt + 40
        val rate = 8000 + (id % 4).toInt * 4000
        val samples = Array.tabulate(n)(i =>
          ((id * 31 + i.toLong * 7919) % 2001 - 1000).toShort)
        MediaRow(id, "audio", wavBytes(samples, rate), 0, 0, rate, n)
      }
    }
  }

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
