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
  * exact per-payload amplitude/energy sums. VIDEO decode is REAL for
  * MJPEG-in-AVI ([[VideoCodec]]): the container is a pure-JVM RIFF walk
  * and the frames are JPEGs, which ImageIO decodes — the one mainstream
  * video form fully decodable inside the JDK. Codecs the JDK truly
  * cannot touch (H.264/VP9/AV1) stay behind the [[FakeCodec]] stub;
  * swapping in a native one (javacv, a JNI decoder, an ONNX runtime)
  * changes ONLY the function body passed to [[decodeBatches]] — every
  * plan around it is unchanged.
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

    /** Per-partition pinned reader cache: `ImageIO.read` rescans the SPI
      * registry and allocates a fresh reader PER CALL — one registry scan
      * per image, contended across the 32 local tasks (the overhead class
      * the video path eliminated with its pinned JPEG reader in r12).
      * The container is sniffed from magic bytes and ONE reader per
      * format is pinned for the partition's lifetime; unknown magics fall
      * back to plain `ImageIO.read`, so accepted inputs are unchanged.
      * Readers are disposed on task completion (not iterator exhaustion),
      * so limit/take and task failure cannot leak them.
      */
    private[ops] final class PinnedReaders {
      private val readers =
        scala.collection.mutable.Map.empty[String, javax.imageio.ImageReader]
      disposeOnTaskEnd(readers.valuesIterator.foreach(_.dispose()))
      private def fmt(b: Array[Byte]): String =
        if (b.length >= 4 && (b(0) & 0xff) == 0x89 &&
            b(1) == 'P' && b(2) == 'N' && b(3) == 'G') "png"
        else if (b.length >= 2 && (b(0) & 0xff) == 0xff &&
            (b(1) & 0xff) == 0xd8) "jpeg"
        else if (b.length >= 2 && b(0) == 'B' && b(1) == 'M') "bmp"
        else if (b.length >= 4 && b(0) == 'G' && b(1) == 'I' &&
            b(2) == 'F' && b(3) == '8') "gif"
        else null
      def read(payload: Array[Byte]): java.awt.image.BufferedImage = {
        val f = fmt(payload)
        if (f == null) // unknown container: same path as before pinning
          javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
        else {
          val r = readers.getOrElseUpdate(f, javax.imageio.ImageIO
            .getImageReadersByFormatName(f).next())
          val in = new javax.imageio.stream.MemoryCacheImageInputStream(
            new java.io.ByteArrayInputStream(payload))
          try { r.setInput(in); r.read(0) }
          catch { case _: Exception => null }
          finally { r.setInput(null); in.close() }
        }
      }
    }

    /** Decode one payload and reduce it to exact channel sums. */
    def decode(row: MediaRow): ImageStats =
      decode(row, new PinnedReaders)

    private[ops] def decode(row: MediaRow, readers: PinnedReaders): ImageStats = {
      val img = readers.read(row.payload)
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
        val readers = new PinnedReaders
        rows.map(decode(_, readers))
      }
    }

    /** REAL 2× area-average resize (the training-pipeline resize op):
      * decode, then every output pixel is the truncating integer mean of
      * its 2×2 source block per channel. Floor semantics crop an odd
      * trailing row/column (out = in div 2) so every output pixel is a
      * FULL-block average — no fractional edge weights for two engines
      * to round differently. Reduced to exact channel sums: the oracle
      * predicts them from the fixture's closed form without being able
      * to decode PNG, so matching sums certify a genuine decode +
      * resample, not a checksum replay.
      */
    def resizeHalf(row: MediaRow): ResizeStats =
      resizeHalf(row, new PinnedReaders)

    private[ops] def resizeHalf(
        row: MediaRow, readers: PinnedReaders): ResizeStats = {
      val img = readers.read(row.payload)
      require(img != null,
        s"media_id=${row.media_id}: payload (${row.payload.length} bytes) " +
          "is not a decodable image (PNG/JPEG/BMP/GIF)")
      val (w, h) = (img.getWidth, img.getHeight)
      val (ow, oh) = (w / 2, h / 2)
      var (sr, sg, sb) = (0L, 0L, 0L)
      var yy = 0
      while (yy < oh) {
        var xx = 0
        while (xx < ow) {
          var (br, bg, bv) = (0, 0, 0)
          var dy = 0
          while (dy < 2) {
            var dx = 0
            while (dx < 2) {
              val rgb = img.getRGB(2 * xx + dx, 2 * yy + dy)
              br += (rgb >> 16) & 0xff
              bg += (rgb >> 8) & 0xff
              bv += rgb & 0xff
              dx += 1
            }
            dy += 1
          }
          sr += br / 4; sg += bg / 4; sb += bv / 4
          xx += 1
        }
        yy += 1
      }
      ResizeStats(row.media_id, w, h, ow, oh, ow.toLong * oh, sr, sg, sb)
    }

    /** Partition-local batched resize — the [[decodeImages]] shape. */
    def resizeImages(media: Dataset[MediaRow]): Dataset[ResizeStats] = {
      import media.sparkSession.implicits._
      media.mapPartitions { rows =>
        javax.imageio.ImageIO.setUseCache(false)
        val readers = new PinnedReaders
        rows.map(resizeHalf(_, readers))
      }
    }
  }

  /** Exact per-channel statistics of a 2×-downsampled image (see
    * [[ImageCodec.resizeHalf]]): output dims are floor-halved, sums are
    * over the resized pixels — all-integer so the oracle reproduces them
    * bit-for-bit.
    */
  case class ResizeStats(
      media_id: Long, in_w: Int, in_h: Int, out_w: Int, out_h: Int,
      n_pixels: Long, sum_r: Long, sum_g: Long, sum_b: Long)

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

    /** Windowed audio energy — the VAD/segmentation primitive: decode
      * PCM and emit exact per-window integer sums (amplitude, energy,
      * frame count) over fixed `window`-frame blocks. Mono-only (the
      * per-window channel interleave has no single canonical reduction;
      * the fixture and the oracle's closed form are mono). Like
      * [[decode]], all-integer so the oracle predicts every cell from
      * the waveform's arithmetic without parsing RIFF.
      */
    def decodeAudioWindows(
        media: Dataset[MediaRow], window: Int = 64): Dataset[AudioWindow] = {
      import media.sparkSession.implicits._
      media.mapPartitions(rows => rows.flatMap { row =>
        val in =
          try javax.sound.sampled.AudioSystem.getAudioInputStream(
            new java.io.ByteArrayInputStream(row.payload))
          catch {
            case e: javax.sound.sampled.UnsupportedAudioFileException =>
              throw new IllegalArgumentException(
                s"media_id=${row.media_id}: payload " +
                  s"(${row.payload.length} bytes) is not decodable audio " +
                  s"(WAV/PCM): ${e.getMessage}")
          }
        try {
          val f = in.getFormat
          require(f.getEncoding ==
            javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED &&
            f.getSampleSizeInBits == 16 && f.getChannels == 1,
            s"media_id=${row.media_id}: windowed energy needs mono " +
              s"PCM signed 16-bit, got ${f.getChannels}ch ${f.getEncoding}")
          val bytes = in.readAllBytes()
          val bb = java.nio.ByteBuffer.wrap(bytes).order(
            if (f.isBigEndian) java.nio.ByteOrder.BIG_ENDIAN
            else java.nio.ByteOrder.LITTLE_ENDIAN)
          val frames = bytes.length / 2
          (0 until (frames + window - 1) / window).map { w =>
            var (sum, sumSq) = (0L, 0L)
            var i = w * window
            val end = math.min((w + 1) * window, frames)
            while (i < end) {
              val v = bb.getShort(i * 2).toLong
              sum += v; sumSq += v * v
              i += 1
            }
            AudioWindow(row.media_id, w.toLong,
              (end - w * window).toLong, sum, sumSq)
          }
        } finally in.close()
      })
    }
  }

  /** One fixed-size window's exact integer statistics from
    * [[AudioCodec.decodeAudioWindows]].
    */
  case class AudioWindow(
      media_id: Long, window_id: Long, n_frames: Long,
      sum_amp: Long, sum_sq: Long)

  /** Exact per-payload statistics of one decoded MJPEG video: frame
    * count from the container walk plus per-frame decoded dimensions
    * summed. JPEG pixel DATA is lossy, but its dimensions come
    * header-exact from the SOF segment — so unlike the PNG oracle the
    * certification rides on counts and dimensions, never pixel sums.
    */
  case class VideoStats(
      media_id: Long, n_frames: Long, sum_w: Long, sum_h: Long)

  /** REAL video codec for MJPEG-in-AVI, pure JVM: the container is a
    * RIFF chunk walk (this file) and the frames are JPEGs (ImageIO
    * decodes them) — the one mainstream video form the JDK can fully
    * decode with zero external dependencies. Anything else (H.264, VP9,
    * AV1) genuinely needs a native codec and stays behind [[FakeCodec]].
    * Beyond-reference surface: the reference ingests no video at all;
    * frame-level dedup/sampling in a multimodal training pipeline needs
    * exactly this container-walk + per-frame-decode shape.
    */
  object VideoCodec {

    /** Extract the MJPEG frame payloads (`##dc`/`##db` chunks inside the
      * `movi` LIST) from an AVI container. RIFF rules honored: chunk data
      * is WORD-aligned (odd sizes carry a pad byte that is NOT part of
      * the payload), unknown chunks are skipped by size, nested grouping
      * LISTs (`rec `) recurse. Fails loudly naming the row on any
      * structural violation — a truncated container in a curation
      * pipeline is a data defect to surface, not to silently zero.
      */
    def frames(payload: Array[Byte], mediaId: Long): Vector[Array[Byte]] = {
      val bb = java.nio.ByteBuffer.wrap(payload)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      def fourcc(off: Long): String = new String(
        payload, off.toInt, 4, java.nio.charset.StandardCharsets.US_ASCII)
      require(payload.length >= 12 && fourcc(0) == "RIFF" &&
        fourcc(8) == "AVI ",
        s"media_id=$mediaId: payload (${payload.length} bytes) is not a " +
          "RIFF/AVI container")
      val riffEnd = 8L + (bb.getInt(4).toLong & 0xFFFFFFFFL)
      require(riffEnd <= payload.length,
        s"media_id=$mediaId: RIFF size $riffEnd overruns the payload")
      val out = Vector.newBuilder[Array[Byte]]
      def walk(from: Long, to: Long, inMovi: Boolean): Unit = {
        var p = from
        while (p < to) {
          require(p + 8 <= to,
            s"media_id=$mediaId: truncated chunk header at $p")
          val id = fourcc(p)
          val sz = bb.getInt(p.toInt + 4).toLong & 0xFFFFFFFFL
          require(p + 8 + sz <= to,
            s"media_id=$mediaId: chunk '$id' at $p overruns its parent")
          if (id == "LIST")
            walk(p + 12, p + 8 + sz, inMovi || fourcc(p + 8) == "movi")
          else if (inMovi && id(0).isDigit && id(1).isDigit &&
            (id.endsWith("dc") || id.endsWith("db")))
            out += java.util.Arrays.copyOfRange(
              payload, p.toInt + 8, (p + 8 + sz).toInt)
          // else: header/index/junk chunk — skipped by size
          p += 8 + sz + (sz & 1L) // odd chunk sizes carry a pad byte
        }
      }
      walk(12L, riffEnd, inMovi = false)
      out.result()
    }

    /** Decode one AVI payload: container walk + ImageIO decode of every
      * frame. A mis-sliced frame fails the JPEG decode loudly, so the
      * dimension sums double as a frame-boundary certification.
      */
    def decode(row: MediaRow): VideoStats = {
      val reader = javax.imageio.ImageIO
        .getImageReadersByFormatName("jpeg").next()
      try decodeWith(reader, row) finally reader.dispose()
    }

    /** [[decode]] against a caller-pinned JPEG reader: `ImageIO.read`
      * rescans the SPI registry and allocates a fresh reader PER CALL —
      * at MJPEG frame rates that overhead dominates the (tiny-frame)
      * pixel work, and the registry scan contends across the 32
      * local tasks (the r11 bench-outlier adjudication). The full
      * `read(0)` pixel decode is retained — header-only dims would
      * weaken the frame-boundary certification to the SOF marker.
      */
    private def decodeWith(
        reader: javax.imageio.ImageReader, row: MediaRow): VideoStats = {
      val fs = frames(row.payload, row.media_id)
      var (sw, sh) = (0L, 0L)
      fs.foreach { f =>
        val in = new javax.imageio.stream.MemoryCacheImageInputStream(
          new java.io.ByteArrayInputStream(f))
        val img =
          try { reader.setInput(in); reader.read(0) }
          catch { case _: Exception => null }
          finally { reader.setInput(null); in.close() }
        require(img != null,
          s"media_id=${row.media_id}: frame (${f.length} bytes) is not a " +
            "decodable JPEG")
        sw += img.getWidth; sh += img.getHeight
      }
      VideoStats(row.media_id, fs.size.toLong, sw, sh)
    }

    /** Partition-local batched video decode — same shape as
      * [[ImageCodec.decodeImages]], plus ONE pinned JPEG reader per
      * partition (tasks are single-threaded, so reuse is safe). Disposal
      * rides the task-completion listener, not iterator exhaustion, so
      * partial consumption (limit/take) and task failure cannot leak the
      * reader's native resources (r13 ADVICE).
      */
    def decodeVideo(media: Dataset[MediaRow]): Dataset[VideoStats] = {
      import media.sparkSession.implicits._
      media.mapPartitions { rows =>
        javax.imageio.ImageIO.setUseCache(false)
        val reader = javax.imageio.ImageIO
          .getImageReadersByFormatName("jpeg").next()
        Multimodal.disposeOnTaskEnd(reader.dispose())
        rows.map(decodeWith(reader, _))
      }
    }
  }

  /** Run `dispose` when the current task completes (success, failure, or
    * early termination alike). Pinned ImageIO readers/writers hold native
    * resources; tying their lifetime to iterator exhaustion leaks them
    * under limit/take or mid-partition failure.
    */
  private[ops] def disposeOnTaskEnd(dispose: => Unit): Unit =
    Option(org.apache.spark.TaskContext.get()).foreach {
      _.addTaskCompletionListener[Unit](_ => dispose)
    }

  /** STUB codec — deterministic stand-in for codecs the JDK cannot touch
    * (H.264/VP9/AV1 video; images decode for real via
    * [[ImageCodec]]/ImageIO, audio via [[AudioCodec]]/javax.sound, MJPEG
    * video via [[VideoCodec]]). Real implementation would decode
    * `payload` with a native library; the fake derives a checksum +
    * fixed-width feature vector from the bytes so tests can assert exact
    * plumbing behavior.
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

  /** Minimal MJPEG AVI container around already-encoded JPEG `frames` of
    * one nominal size: RIFF('AVI ' LIST('hdrl' avih LIST('strl' strh
    * strf)) LIST('movi' '00dc'…) 'idx1'). Authored against the public
    * RIFF/AVI layout — the same byte-authoring discipline as [[wavBytes]]
    * and the CDF/HDF5 fixtures (and, like them, decoded back by a parser
    * that never sees this writer).
    */
  def aviBytes(frames: Seq[Array[Byte]], width: Int, height: Int,
      fps: Int = 10): Array[Byte] = {
    def chunk(id: String, body: Array[Byte]): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(8 + body.length + (body.length & 1))
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put(id.getBytes("US-ASCII")).putInt(body.length).put(body)
      bb.array() // odd payloads get the RIFF pad byte via the allocation
    }
    def list(kind: String, body: Array[Byte]): Array[Byte] =
      chunk("LIST", kind.getBytes("US-ASCII") ++ body)
    val maxBytes = if (frames.isEmpty) 0 else frames.map(_.length).max
    val avih = java.nio.ByteBuffer.allocate(56)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putInt(1000000 / fps) // microseconds per frame
      .putInt(maxBytes * fps) // max bytes per second
      .putInt(0).putInt(0x10) // padding granularity; flags: AVIF_HASINDEX
      .putInt(frames.size).putInt(0).putInt(1).putInt(maxBytes)
      .putInt(width).putInt(height)
      .putInt(0).putInt(0).putInt(0).putInt(0) // reserved
      .array()
    val strh = java.nio.ByteBuffer.allocate(56)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .put("vids".getBytes("US-ASCII")).put("MJPG".getBytes("US-ASCII"))
      .putInt(0).putShort(0).putShort(0).putInt(0) // flags, prio, lang, init
      .putInt(1).putInt(fps) // scale/rate = fps frames per second
      .putInt(0).putInt(frames.size).putInt(maxBytes)
      .putInt(-1).putInt(0) // quality, sample size
      .putShort(0).putShort(0) // frame rect
      .putShort(width.toShort).putShort(height.toShort)
      .array()
    val strf = java.nio.ByteBuffer.allocate(40) // BITMAPINFOHEADER
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putInt(40).putInt(width).putInt(height)
      .putShort(1).putShort(24) // planes, bpp
      .put("MJPG".getBytes("US-ASCII"))
      .putInt(width * height * 3).putInt(0).putInt(0).putInt(0).putInt(0)
      .array()
    val hdrl = list("hdrl", chunk("avih", avih) ++
      list("strl", chunk("strh", strh) ++ chunk("strf", strf)))
    val movi = list("movi", frames.toArray.flatMap(f => chunk("00dc", f)))
    val idxBody = {
      val bb = java.nio.ByteBuffer.allocate(16 * frames.size)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      var off = 4 // offsets count from the 'movi' list type fourcc
      frames.foreach { f =>
        bb.put("00dc".getBytes("US-ASCII")).putInt(0x10) // AVIIF_KEYFRAME
          .putInt(off).putInt(f.length)
        off += 8 + f.length + (f.length & 1)
      }
      bb.array()
    }
    val body = "AVI ".getBytes("US-ASCII") ++ hdrl ++ movi ++
      chunk("idx1", idxBody)
    val bb = java.nio.ByteBuffer.allocate(8 + body.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(body.length).put(body)
    bb.array()
  }

  /** Build a REAL-MJPEG-AVI media table from the documents fixture: each
    * doc_id becomes an AVI of nf = id%5 + 2 solid-gray JPEG frames sized
    *   w = id%32 + 16, h = id%24 + 12
    * — so the DuckDB oracle predicts the decoder's exact frame count and
    * summed dimensions (nf, nf·w, nf·h) from arithmetic WITHOUT parsing
    * AVI or JPEG. Only a codec that really walks the RIFF chunk tree to
    * exact frame boundaries and reads each JPEG's SOF header reproduces
    * them — a mis-sliced frame does not decode at all.
    */
  def aviFromDocuments(docs: DataFrame): Dataset[MediaRow] = {
    import docs.sparkSession.implicits._
    docs.select(col("doc_id")).as[Long].mapPartitions { ids =>
      javax.imageio.ImageIO.setUseCache(false)
      // ONE pinned JPEG writer per partition: ImageIO.write rescans the
      // SPI registry and allocates a writer PER FRAME — at 2-6 tiny
      // frames per row that overhead dominates the encode (the same
      // adjudication as VideoCodec.decodeVideo's pinned reader)
      val writer = javax.imageio.ImageIO
        .getImageWritersByFormatName("jpeg").next()
      disposeOnTaskEnd(writer.dispose())
      ids.map { id =>
        val w = (id % 32).toInt + 16
        val h = (id % 24).toInt + 12
        val nf = (id % 5).toInt + 2
        val frames = (0 until nf).map { f =>
          val img = new java.awt.image.BufferedImage(
            w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
          val gray = ((id * 7 + f * 31) % 256).toInt
          val rgb = (gray << 16) | (gray << 8) | gray
          // constant-gray frame: bulk-fill the INT_RGB backing array
          // (bit-identical to the per-pixel setRGB loop, w*h fewer calls)
          java.util.Arrays.fill(img.getRaster.getDataBuffer
            .asInstanceOf[java.awt.image.DataBufferInt].getData, rgb)
          val out = new java.io.ByteArrayOutputStream()
          val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(out)
          try {
            writer.setOutput(ios)
            writer.write(img)
          } finally { writer.setOutput(null); ios.close() }
          out.toByteArray
        }
        MediaRow(id, "video", aviBytes(frames, w, h), w, h, 0, nf)
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
