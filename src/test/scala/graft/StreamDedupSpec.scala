package graft

import java.sql.Timestamp
import graft.streaming.StreamDedup

/** Streaming dedup specs: duplicate suppression across micro-batches, and
  * the watermark-bounded state contract (a repeat AFTER the watermark
  * passes is allowed through — state for the key was evicted).
  */
object StreamDedupSpec {
  case class Ev(event_id: Long, ts: Timestamp, text: String)
}

class StreamDedupSpec extends SparkSpec {
  import spark.implicits._
  import StreamDedupSpec.Ev

  private def ev(id: Long, s: String, text: String = "x") =
    Ev(id, Timestamp.valueOf(s), text)

  test("exactOnceWithin drops repeats across micro-batches inside the watermark") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val mem = MemoryStream[Ev]
    val out = StreamDedup.exactOnceWithin(mem.toDF(), "ts", "1 hour", Seq("event_id"))
    val q = out.writeStream.outputMode("append").format("memory")
      .queryName("dedup_ids").start()
    try {
      mem.addData(ev(1, "2024-01-01 10:00:00"), ev(2, "2024-01-01 10:00:10"))
      q.processAllAvailable()
      mem.addData(ev(1, "2024-01-01 10:05:00")) // duplicate id, within watermark
      mem.addData(ev(3, "2024-01-01 10:06:00"))
      q.processAllAvailable()
      val ids = spark.table("dedup_ids").as[Ev].collect().map(_.event_id).sorted
      assert(ids.toSeq == Seq(1L, 2L, 3L)) // id 1 emitted exactly once
    } finally q.stop()
  }

  test("contentOnceWithin drops same-content rows even under different ids") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val mem = MemoryStream[Ev]
    val out = StreamDedup.contentOnceWithin(
      mem.toDF(), "ts", "1 hour", org.apache.spark.sql.functions.col("text"))
    val q = out.writeStream.outputMode("append").format("memory")
      .queryName("dedup_content").start()
    try {
      mem.addData(ev(1, "2024-01-01 10:00:00", "Hello  World"))
      q.processAllAvailable()
      // same normalized content (case/whitespace differences), new id
      mem.addData(ev(2, "2024-01-01 10:01:00", "hello world"))
      mem.addData(ev(3, "2024-01-01 10:02:00", "different content"))
      q.processAllAvailable()
      val ids = spark.table("dedup_content").as[Ev].collect().map(_.event_id).sorted
      assert(ids.toSeq == Seq(1L, 3L))
      // schema contract: the internal fingerprint column does not leak
      assert(spark.table("dedup_content").columns.toSet == Set("event_id", "ts", "text"))
    } finally q.stop()
  }
}
