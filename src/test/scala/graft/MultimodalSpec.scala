package graft

import org.apache.spark.sql.functions._
import graft.ops.Multimodal
import graft.ops.Multimodal.{FakeCodec, MediaRow}

/** Multimodal plumbing tests: binary payload round-trip, partition-local
  * batched decode, metadata pushdown shape, frame-sampling fan-out.
  */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Tables.documents(spark, "/root/testdata/sf0.001")
  private lazy val media = Multimodal.mediaFromDocuments(docs)

  test("media table: payload is the exact UTF-8 bytes, kinds cycle deterministically") {
    val r = media.filter(col("media_id") === 0).head()
    val origText = docs.filter(col("doc_id") === 0).head().getString(1)
    assert(r.payload.toSeq == origText.getBytes("UTF-8").toSeq)
    assert(r.kind == "image")
    assert(media.filter(col("media_id") === 1).head().kind == "audio")
    assert(media.filter(col("media_id") === 2).head().kind == "video")
  }

  test("decodeBatches: one output row per input, checksum matches local codec") {
    val decoded = Multimodal.decodeBatches(media).cache()
    assert(decoded.count() == media.count())
    val row0 = media.filter(col("media_id") === 7).head()
    val got = decoded.filter(col("media_id") === 7).head()
    val want = FakeCodec.decode(row0)
    assert(got.checksum == want.checksum && got.n_bytes == want.n_bytes)
    assert(got.features.toSeq == want.features.toSeq)
    assert(got.features.length == FakeCodec.FeatureDim)
    decoded.unpersist()
  }

  test("decodeBatches is partition-local: decode count independent of partitioning") {
    val p1 = Multimodal.decodeBatches(media.repartition(1))
      .agg(sum("checksum")).head().getLong(0)
    val p8 = Multimodal.decodeBatches(media.repartition(8))
      .agg(sum("checksum")).head().getLong(0)
    assert(p1 == p8)
  }

  test("selectDecodable prunes by kind and payload size") {
    val sel = Multimodal.selectDecodable(media.toDF(), Seq("image"), maxBytes = 300)
    val rows = sel.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[String]("kind") == "image")
      assert(r.getAs[Array[Byte]]("payload").length <= 300)
    }
  }

  test("sampleFrames: stride-4 indices within [0, n_frames)") {
    val frames = Multimodal.sampleFrames(media.toDF(), stride = 4)
    val joined = frames.join(media.toDF().select("media_id", "n_frames"), "media_id")
    val bad = joined.filter(col("frame_idx") < 0 ||
      col("frame_idx") >= col("n_frames") || col("frame_idx") % 4 =!= 0)
    assert(bad.count() == 0)
    // video with n_frames=f -> ceil(f/4) sampled frames
    val one = media.filter(col("kind") === "video").head()
    val expected = (one.n_frames + 3) / 4
    assert(frames.filter(col("media_id") === one.media_id).count() == expected)
  }

  test("embedBatches: batch geometry is batchSize slices, outputs in order") {
    import spark.implicits._
    val media = Multimodal.mediaFromDocuments(
      docs.limit(12)).repartition(1)
    val out = Multimodal.embedBatches(media, batchSize = 5).collect()
    assert(out.length == 12)
    // 12 rows in one partition at batchSize 5 -> batches of 5, 5, 2:
    // three batch starts (pos 0), max in-batch position 4
    assert(out.count(_.batch_pos == 0) == 3)
    assert(out.map(_.batch_pos).max == 4)
    // embeddings are a pure function of the row (batch-composition-free):
    // a different batch size must yield identical vectors per media_id
    val other = Multimodal.embedBatches(media, batchSize = 7).collect()
      .map(e => e.media_id -> e.embedding.toSeq).toMap
    assert(out.forall(e => other(e.media_id) == e.embedding.toSeq))
  }

  // ---- ImageCodec: REAL PNG decode (JDK ImageIO) ----

  /** Byte-author a PNG from the public spec (the NetcdfClassicSpec
    * discipline): signature, IHDR (8-bit RGB, no interlace), one IDAT of
    * zlib-deflated filter-0 scanlines, IEND — CRCs computed, nothing
    * written through ImageIO. Proves the codec reads the FORMAT, not just
    * its own writer's output.
    */
  private def chunk(typ: String, data: Array[Byte]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(data.length + 12)
    bb.putInt(data.length).put(typ.getBytes("US-ASCII")).put(data)
    val crc = new java.util.zip.CRC32
    crc.update(typ.getBytes("US-ASCII"))
    crc.update(data)
    bb.putInt(crc.getValue.toInt)
    bb.array()
  }

  private def pngBytes(w: Int, h: Int, px: (Int, Int) => (Int, Int, Int)): Array[Byte] = {
    val ihdr = java.nio.ByteBuffer.allocate(13)
    ihdr.putInt(w).putInt(h)
      .put(8.toByte).put(2.toByte).put(0.toByte).put(0.toByte).put(0.toByte)
    val raw = new java.io.ByteArrayOutputStream
    for (y <- 0 until h) {
      raw.write(0) // filter type None per scanline
      for (x <- 0 until w) {
        val (r, g, b) = px(x, y)
        raw.write(r); raw.write(g); raw.write(b)
      }
    }
    val defl = new java.util.zip.Deflater()
    defl.setInput(raw.toByteArray)
    defl.finish()
    val out = new java.io.ByteArrayOutputStream
    val buf = new Array[Byte](512)
    while (!defl.finished()) out.write(buf, 0, defl.deflate(buf))
    defl.end()
    Array.concat(
      Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte),
      chunk("IHDR", ihdr.array), chunk("IDAT", out.toByteArray),
      chunk("IEND", Array.emptyByteArray))
  }

  test("ImageCodec decodes a byte-authored PNG exactly (dims + channel sums)") {
    // 3x2, pixel (x,y) = (10x+1, 20y+2, 30x+y)
    val bytes = pngBytes(3, 2, (x, y) => (10 * x + 1, 20 * y + 2, 30 * x + y))
    val stats = Multimodal.ImageCodec.decode(
      MediaRow(42L, "image", bytes, 3, 2, 0, 0))
    assert(stats.media_id == 42L && stats.width == 3 && stats.height == 2)
    assert(stats.n_pixels == 6L)
    assert(stats.sum_r == 2L * (1 + 11 + 21))          // per row: 1,11,21
    assert(stats.sum_g == 3L * (2 + 22))               // per col: 2 then 22
    assert(stats.sum_b == (0 + 30 + 60) + (1 + 31 + 61))
  }

  test("ImageCodec rejects a corrupt payload loudly, naming the row") {
    val bad = MediaRow(99L, "image", Array[Byte](1, 2, 3, 4, 5), 0, 0, 0, 0)
    val e = intercept[IllegalArgumentException](Multimodal.ImageCodec.decode(bad))
    assert(e.getMessage.contains("media_id=99"))
    assert(e.getMessage.contains("not a decodable image"))
    // and distributed: the task failure surfaces the same message
    val ds = Seq(bad).toDS()
    val e2 = intercept[org.apache.spark.SparkException](
      Multimodal.ImageCodec.decodeImages(ds).collect())
    assert(e2.getMessage.contains("media_id=99") ||
      e2.getCause.getMessage.contains("media_id=99"))
  }

  test("pngFromDocuments round trip matches the arithmetic prediction") {
    val decoded = Multimodal.ImageCodec.decodeImages(
      Multimodal.pngFromDocuments(docs.limit(50))).collect()
    assert(decoded.length == 50)
    decoded.foreach { s =>
      val id = s.media_id
      val w = (id % 64).toInt + 1; val h = (id % 48).toInt + 1
      val wl = w / 2; val wr = w - wl
      assert(s.width == w && s.height == h && s.n_pixels == w.toLong * h)
      assert(s.sum_r == h.toLong * (wl * (id % 256) + wr * ((id * 3) % 256)))
      assert(s.sum_g == h.toLong * (wl * ((id * 7) % 256) + wr * ((id * 5) % 256)))
      assert(s.sum_b == h.toLong * (wl * ((id * 13) % 256) + wr * ((id * 11) % 256)))
    }
  }

  test("resizeHalf: 2x2 block truncating means on a hand image, odd " +
    "edges floor-cropped") {
    // 5x3, pixel (x,y) = (10x+y, x+y, 7x): out 2x1; block X=0 averages
    // x∈{0,1},y∈{0,1}; X=1 averages x∈{2,3},y∈{0,1}; col 4 and row 2 crop
    val bytes = pngBytes(5, 3, (x, y) => (10 * x + y, x + y, 7 * x))
    val s = Multimodal.ImageCodec.resizeHalf(
      MediaRow(7L, "image", bytes, 5, 3, 0, 0))
    assert(s.in_w == 5 && s.in_h == 3 && s.out_w == 2 && s.out_h == 1)
    assert(s.n_pixels == 2L)
    assert(s.sum_r == (0 + 10 + 1 + 11) / 4 + (20 + 30 + 21 + 31) / 4)
    assert(s.sum_g == (0 + 1 + 1 + 2) / 4 + (2 + 3 + 3 + 4) / 4) // 1 + 3
    assert(s.sum_b == (0 + 7 + 0 + 7) / 4 + (14 + 21 + 14 + 21) / 4)
  }

  test("resizeHalf: 1-pixel-wide and 1-pixel-tall images resize to empty " +
    "stats, never a crash") {
    for ((w, h) <- Seq((1, 8), (8, 1), (1, 1))) {
      val s = Multimodal.ImageCodec.resizeHalf(
        MediaRow(1L, "image", pngBytes(w, h, (_, _) => (9, 9, 9)), w, h, 0, 0))
      assert(s.out_w == w / 2 && s.out_h == h / 2 && s.n_pixels == (w / 2).toLong * (h / 2))
      assert((s.sum_r == 0L && s.sum_g == 0L && s.sum_b == 0L) || s.n_pixels > 0)
    }
  }

  test("resizeImages over pngFromDocuments matches the closed-form " +
    "block census (the oracle's arithmetic)") {
    val got = Multimodal.ImageCodec.resizeImages(
      Multimodal.pngFromDocuments(docs.limit(50))).collect()
    assert(got.length == 50)
    got.foreach { s =>
      val id = s.media_id
      val w = (id % 64).toInt + 1; val h = (id % 48).toInt + 1
      val wl = w / 2
      val (ow, oh) = (w / 2, h / 2)
      val nl = wl / 2; val st = wl % 2; val nr = ow - nl - st
      def ch(l: Long, r: Long) = oh.toLong * (nl * l + st * ((l + r) / 2) + nr * r)
      assert(s.in_w == w && s.in_h == h && s.out_w == ow && s.out_h == oh)
      assert(s.n_pixels == ow.toLong * oh)
      assert(s.sum_r == ch(id % 256, (id * 3) % 256))
      assert(s.sum_g == ch((id * 7) % 256, (id * 5) % 256))
      assert(s.sum_b == ch((id * 13) % 256, (id * 11) % 256))
    }
  }

  test("AudioCodec decodes a byte-authored WAV exactly (mono and stereo)") {
    import spark.implicits._
    // mono: hand-checkable samples
    val mono = Multimodal.MediaRow(7L, "audio",
      Multimodal.wavBytes(Array[Short](100, -200, 300), 8000), 0, 0, 8000, 3)
    val m = Multimodal.AudioCodec.decode(mono)
    assert(m == Multimodal.AudioStats(7L, 8000, 1, 3,
      100 - 200 + 300, 100L * 100 + 200L * 200 + 300L * 300))
    // stereo: frames interleave L/R; n_samples counts frames, sums span
    // both channels
    val st = Multimodal.MediaRow(8L, "audio",
      Multimodal.wavBytes(Array[Short](10, -10, 20, -20), 44100,
        channels = 2), 0, 0, 44100, 2)
    val s2 = Multimodal.AudioCodec.decode(st)
    assert(s2 == Multimodal.AudioStats(8L, 44100, 2, 2,
      0, 2L * (10 * 10) + 2L * (20 * 20)))
    // the whole thing through the distributed path
    val got = Multimodal.AudioCodec.decodeAudio(
      Seq(mono, st).toDS().repartition(2)).collect().sortBy(_.media_id)
    assert(got.toSeq == Seq(m, s2))
  }

  test("decodeAudioWindows: hand-checkable per-window sums; windows " +
    "partition the whole-payload totals; stereo rejected by name") {
    import spark.implicits._
    val rows = Seq(Multimodal.MediaRow(9L, "audio",
      Multimodal.wavBytes(Array[Short](1, 2, 3, 4, 5), 8000), 0, 0, 8000, 5))
    val got = Multimodal.AudioCodec
      .decodeAudioWindows(rows.toDS(), window = 2)
      .collect().sortBy(_.window_id).toSeq
    assert(got == Seq(
      Multimodal.AudioWindow(9L, 0L, 2L, 3L, 5L),
      Multimodal.AudioWindow(9L, 1L, 2L, 7L, 25L),
      Multimodal.AudioWindow(9L, 2L, 1L, 5L, 25L)))
    // windows partition the totals the whole-payload decode certifies
    val whole = Multimodal.AudioCodec.decode(rows.head)
    assert(got.map(_.sum_amp).sum == whole.sum_amp &&
      got.map(_.sum_sq).sum == whole.sum_sq &&
      got.map(_.n_frames).sum == whole.n_samples)
    val stereo = Seq(Multimodal.MediaRow(10L, "audio",
      Multimodal.wavBytes(Array[Short](1, 2), 44100, channels = 2),
      0, 0, 44100, 1))
    val e = intercept[Exception] {
      Multimodal.AudioCodec.decodeAudioWindows(stereo.toDS()).collect()
    }
    assert(e.getMessage.contains("mono"))
  }

  test("AudioCodec rejects corrupt and unsupported payloads loudly") {
    val junk = Multimodal.MediaRow(99L, "audio",
      Array.tabulate[Byte](64)(_.toByte), 0, 0, 8000, 0)
    val e = intercept[IllegalArgumentException] {
      Multimodal.AudioCodec.decode(junk)
    }
    assert(e.getMessage.contains("media_id=99") &&
      e.getMessage.contains("not decodable audio"))
    // valid WAV container but 8-bit samples (a consistent 8-bit header:
    // bits=8, blockAlign=1, byteRate=rate): named rejection, no misread
    val w8 = Multimodal.wavBytes(Array[Short](1, 2), 8000)
    val bb = java.nio.ByteBuffer.wrap(w8)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putShort(34, 8).putShort(32, 1).putInt(28, 8000)
    val e2 = intercept[IllegalArgumentException] {
      Multimodal.AudioCodec.decode(
        Multimodal.MediaRow(5L, "audio", w8, 0, 0, 8000, 2))
    }
    assert(e2.getMessage.contains("media_id=5") &&
      e2.getMessage.contains("16-bit"), s"got: ${e2.getMessage}")
  }

  test("wavFromDocuments round trip matches the arithmetic prediction") {
    val decoded = Multimodal.AudioCodec.decodeAudio(
      Multimodal.wavFromDocuments(docs.limit(40))).collect()
    assert(decoded.length == 40)
    decoded.foreach { s =>
      val id = s.media_id
      val n = (id % 200).toInt + 40
      val vs = (0 until n).map(i => (id * 31 + i.toLong * 7919) % 2001 - 1000)
      assert(s.sample_rate == 8000 + (id % 4).toInt * 4000)
      assert(s.channels == 1 && s.n_samples == n)
      assert(s.sum_amp == vs.sum)
      assert(s.sum_sq == vs.map(v => v * v).sum)
    }
  }

  test("aviFromDocuments round trip matches the arithmetic prediction") {
    val decoded = Multimodal.VideoCodec.decodeVideo(
      Multimodal.aviFromDocuments(docs.limit(40))).collect()
    assert(decoded.length == 40)
    decoded.foreach { v =>
      val id = v.media_id
      val nf = (id % 5) + 2
      assert(v.n_frames == nf)
      assert(v.sum_w == nf * ((id % 32) + 16))
      assert(v.sum_h == nf * ((id % 24) + 12))
    }
  }

  test("VideoCodec.frames honors RIFF rules: odd-size padding, unknown " +
    "chunks skipped, nested movi LISTs recursed, '##db' accepted") {
    def chunk(id: String, body: Array[Byte]): Array[Byte] = {
      val bb = java.nio.ByteBuffer
        .allocate(8 + body.length + (body.length & 1))
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put(id.getBytes("US-ASCII")).putInt(body.length).put(body)
      bb.array()
    }
    def list(kind: String, body: Array[Byte]): Array[Byte] =
      chunk("LIST", kind.getBytes("US-ASCII") ++ body)
    def riff(body: Array[Byte]): Array[Byte] = {
      val full = "AVI ".getBytes("US-ASCII") ++ body
      val bb = java.nio.ByteBuffer.allocate(8 + full.length)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put("RIFF".getBytes("US-ASCII")).putInt(full.length).put(full)
      bb.array()
    }
    // odd-length frame (3 bytes, padded), a junk chunk inside movi that
    // must be skipped, a 'rec ' grouping LIST, and a '01db' stream chunk
    val f1 = Array[Byte](1, 2, 3)
    val f2 = Array[Byte](4, 5, 6, 7)
    val f3 = Array[Byte](8)
    val movi = list("movi",
      chunk("00dc", f1) ++ chunk("JUNK", Array[Byte](9, 9, 9)) ++
        list("rec ", chunk("01db", f2)) ++ chunk("00dc", f3))
    val avi = riff(chunk("avih", new Array[Byte](56)) ++ movi)
    val got = Multimodal.VideoCodec.frames(avi, mediaId = 7L)
    assert(got.map(_.toSeq) == Vector(f1.toSeq, f2.toSeq, f3.toSeq))
    // loud failures: not AVI, and a chunk overrunning its parent
    val e1 = intercept[IllegalArgumentException](
      Multimodal.VideoCodec.frames("RIFFxxxxWAVE".getBytes, 8L))
    assert(e1.getMessage.contains("media_id=8"))
    val truncated = java.util.Arrays.copyOf(avi, avi.length - 2)
    val e2 = intercept[IllegalArgumentException](
      Multimodal.VideoCodec.frames(truncated, 9L))
    assert(e2.getMessage.contains("media_id=9"))
  }

  test("embedBatches rejects a model that drops or duplicates rows") {
    import spark.implicits._
    val media = Multimodal.mediaFromDocuments(
      docs.limit(4)).repartition(1)
    val bad = Multimodal.embedBatches(media, batchSize = 4,
      model = batch => Multimodal.FakeModel.embed(batch).tail)
    val e = intercept[org.apache.spark.SparkException](bad.collect())
    assert(e.getMessage.contains("embeddings") ||
      e.getCause.getMessage.contains("embeddings"))
  }
}
