package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.{EventAggs, Sessionize, StreamDedup}

/** Bounded-state proof for the stateful streaming family (r12 VERDICT #5):
  * state-store rows after each micro-batch must be a function of
  * (watermark horizon, key cardinality), NEVER of stream length. Each test
  * replays hour-advancing micro-batches and asserts (a) an absolute bound
  * derived from horizon x keys and (b) flatness — late-stream state no
  * bigger than mid-stream state — while total input keeps growing.
  * `graft.StreamStateScale` records the same curves at sf1/sf10 rates for
  * the BASELINE.md rung.
  */
class StreamStateBoundSpec extends SparkSpec {
  import spark.implicits._

  private val epoch = Timestamp.valueOf("2024-01-01 00:00:00").getTime

  private def hour(h: Int, m: Int = 0): Timestamp =
    new Timestamp(epoch + h * 3600000L + m * 60000L)

  private def stateRows(
      q: org.apache.spark.sql.streaming.StreamingQuery): Long =
    Option(q.lastProgress).toSeq.flatMap(_.stateOperators)
      .map(_.numRowsTotal).sum

  test("windowedByType: state rows bounded by types x horizon windows, " +
    "flat as the stream grows") {
    implicit val sqlCtx = spark.sqlContext
    val types = Seq("view", "click", "buy")
    val mem = MemoryStream[(Timestamp, String, Double)]
    val agg = EventAggs.windowedByType(
      mem.toDF().toDF("ts", "event_type", "value"), watermark = "1 hour")
    val q = agg.writeStream.outputMode("append").format("noop").start()
    try {
      val perBatch = (1 to 24).map { h => // one event-time hour per batch
        mem.addData(types.flatMap(t =>
          (0 until 5).map(i => (hour(h, i * 7 % 60), t, 1.0))))
        q.processAllAvailable()
        stateRows(q)
      }
      // 1h tumbling windows, 1h watermark: at most the current window,
      // the previous (not yet past watermark), and one boundary window
      // per type survive any batch.
      val bound = types.size.toLong * 4
      assert(perBatch.drop(3).forall(_ <= bound),
        s"state exceeded types x horizon bound $bound: $perBatch")
      // flat: 24h of stream holds no more state than 12h
      assert(perBatch.last <= perBatch(11),
        s"state grew with stream length: $perBatch")
    } finally q.stop()
  }

  test("exactOnceWithin: state rows track the watermark horizon, not " +
    "total ids seen") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp)]
    val dedup = StreamDedup.exactOnceWithin(
      mem.toDF().toDF("event_id", "ts"), "ts", "1 hour", Seq("event_id"))
    val q = dedup.writeStream.outputMode("append").format("noop").start()
    try {
      val perBatch = (1 to 24).map { h => // 100 globally-unique ids/hour
        mem.addData((0 until 100).map(i =>
          (h * 1000L + i, hour(h, i % 60))))
        q.processAllAvailable()
        stateRows(q)
      }
      // horizon = watermark (1h) + current batch: ids from at most ~3
      // hourly batches may be retained at any boundary.
      assert(perBatch.drop(3).forall(_ <= 300),
        s"dedup state exceeded horizon bound: $perBatch")
      assert(perBatch.last <= perBatch(11),
        s"dedup state grew with stream length (total ids 2400): $perBatch")
    } finally q.stop()
  }

  test("intervalJoin: stream-stream state tracks the watermark horizon, " +
    "not stream length") {
    implicit val sqlCtx = spark.sqlContext
    val lmem = MemoryStream[(Long, Timestamp, Long)]
    val rmem = MemoryStream[(Long, Timestamp, Long)]
    val joined = graft.streaming.StreamJoins.intervalJoin(
      lmem.toDF().toDF("event_id", "ts", "user_id"),
      rmem.toDF().toDF("event_id", "ts", "user_id"),
      "user_id", "ts")
    val q = joined.writeStream.outputMode("append").format("noop").start()
    try {
      val perBatch = (1 to 24).map { h => // 100 left + 10 right rows/hour
        lmem.addData((0 until 100).map(i =>
          (h * 1000L + i, hour(h, i % 60), (i % 20).toLong)))
        rmem.addData((0 until 10).map(i =>
          (h * 1000L + i, hour(h, i % 60), (i % 20).toLong)))
        q.processAllAvailable()
        stateRows(q)
      }
      // 2h watermark + 1h lookBack: at most ~4 hourly batches of both
      // sides may be retained at any boundary (440 rows/hour x 4)
      assert(perBatch.drop(5).forall(_ <= 4 * 440L),
        s"join state exceeded horizon bound: $perBatch")
      assert(perBatch.last <= perBatch(11),
        s"join state grew with stream length: $perBatch")
    } finally q.stop()
  }

  test("sessionsEvicting: churned keys leave state at the horizon, and " +
    "their sessions emit via timeout") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Sessionize.Event]
    val q = Sessionize.sessionsEvicting(
        mem.toDS().withWatermark("ts", "1 hour"),
        gapUs = 30L * 60 * 1000 * 1000).toDF()
      .writeStream.outputMode("append").format("memory")
      .queryName("evict_sessions").start()
    try {
      // open-world churn: a FRESH user each hour, never returning — the
      // NoTimeout variant would accumulate one state row per hour
      val perBatch = (1 to 16).map { h =>
        mem.addData(Sessionize.Event(1000L + h, hour(h), "view"))
        q.processAllAvailable()
        stateRows(q)
      }
      // watermark 1h + gap 30m: only ~the last two hours' users can be
      // in state at any boundary; 16 hours of churn must NOT accumulate
      assert(perBatch.drop(4).forall(_ <= 3),
        s"evicting state accumulated churned keys: $perBatch")
      assert(perBatch.last <= perBatch(7),
        s"evicting state grew with stream length: $perBatch")
      // evicted users' sessions were EMITTED (not dropped): the early
      // users' single-event sessions are in the output
      val emitted = spark.table("evict_sessions")
        .select("user_id").as[Long].collect().toSet
      assert((1 to 10).forall(h => emitted.contains(1000L + h)),
        s"timeout closures missing from output: $emitted")
    } finally q.stop()
  }

  test("sessionize: state rows equal active-key cardinality, independent " +
    "of event count") {
    implicit val sqlCtx = spark.sqlContext
    val users = 50L
    val mem = MemoryStream[Sessionize.Event]
    val q = Sessionize.sessions(mem.toDS()).toDF()
      .writeStream.outputMode("append").format("noop").start()
    try {
      val perBatch = (1 to 12).map { h =>
        mem.addData((0L until users).map(u =>
          Sessionize.Event(u, hour(h, (u % 60).toInt), "view")))
        q.processAllAvailable()
        stateRows(q)
      }
      // every user always has exactly one open session in state — the
      // bound is key cardinality whether the stream carried 50 or 600
      // events per user.
      assert(perBatch.drop(1).forall(_ == users),
        s"sessionize state != user cardinality $users: $perBatch")
    } finally q.stop()
  }
}
