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
