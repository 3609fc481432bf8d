package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.StreamJoins

/** Stream-join surface (§2.8 beyond-reference): stream-static enrichment
  * and the watermark-bounded stream-stream interval join.
  */
class StreamJoinsSpec extends SparkSpec {
  import spark.implicits._

  test("intervalJoin batch/stream parity on a memory stream") {
    // batch truth
    val views = Seq(
      (1L, 10L, Timestamp.valueOf("2024-01-01 10:30:00"), 1.0),
      (2L, 10L, Timestamp.valueOf("2024-01-01 12:00:00"), 2.0),
      (3L, 20L, Timestamp.valueOf("2024-01-01 10:30:00"), 3.0)
    ).toDF("event_id", "user_id", "ts", "value")
    val purchases = Seq(
      (10L, Timestamp.valueOf("2024-01-01 10:00:00"), 100L, 9.0), // in window of view 1
      (10L, Timestamp.valueOf("2024-01-01 11:30:00"), 101L, 8.0), // in window of view 2
      (20L, Timestamp.valueOf("2024-01-01 08:00:00"), 102L, 7.0)  // too old for view 3
    ).toDF("user_id", "ts", "purchase_id", "purchase_value")
    val batch = StreamJoins.intervalJoin(views, purchases, "user_id", "ts")
      .select(col("l.event_id"), col("purchase_id"))
      .as[(Long, Long)].collect().toSet
    assert(batch == Set((1L, 100L), (2L, 101L)))

    // same data through streaming sides
    implicit val sqlCtx = spark.sqlContext
    val lMem = MemoryStream[(Long, Long, Timestamp, Double)]
    val rMem = MemoryStream[(Long, Timestamp, Long, Double)]
    val lDf = lMem.toDF().toDF("event_id", "user_id", "ts", "value")
    val rDf = rMem.toDF().toDF("user_id", "ts", "purchase_id", "purchase_value")
    val joined = StreamJoins.intervalJoin(lDf, rDf, "user_id", "ts")
      .select(col("l.event_id"), col("purchase_id"))
    val q = joined.writeStream.outputMode("append")
      .format("memory").queryName("ivjoin").start()
    try {
      views.as[(Long, Long, Timestamp, Double)].collect().foreach(r => lMem.addData(r))
      purchases.as[(Long, Timestamp, Long, Double)].collect().foreach(r => rMem.addData(r))
      q.processAllAvailable()
      // advance both watermarks far past the data so all pairs emit
      lMem.addData((99L, 998L, Timestamp.valueOf("2024-01-02 00:00:00"), 0.0))
      rMem.addData((999L, Timestamp.valueOf("2024-01-02 00:00:00"), 999L, 0.0))
      q.processAllAvailable()
      val got = spark.table("ivjoin").as[(Long, Long)].collect().toSet
      assert(got == batch, "streaming emission must match the batch join")
    } finally q.stop()
  }

  test("rangeJoinBinned: keyless batch/stream parity; bins never change results") {
    val clicks = Seq(
      (1L, Timestamp.valueOf("2024-01-01 10:15:00")), // in window of anchor 100
      (2L, Timestamp.valueOf("2024-01-01 10:29:00")), // in window, crosses hour bin
      (3L, Timestamp.valueOf("2024-01-01 11:31:00")), // 1 min past anchor 100's window
      (4L, Timestamp.valueOf("2024-01-01 23:55:00"))  // in window of anchor 200 only
    ).toDF("click_id", "ts")
    val errors = Seq(
      (100L, Timestamp.valueOf("2024-01-01 10:45:00")),
      (200L, Timestamp.valueOf("2024-01-02 00:10:00")) // window crosses midnight
    ).toDF("error_id", "ets")
    val HalfHour = 1800000L
    def run(p: org.apache.spark.sql.DataFrame, a: org.apache.spark.sql.DataFrame) =
      StreamJoins.rangeJoinBinned(p, "ts", a, "ets",
        beforeMs = HalfHour, afterMs = HalfHour, binMs = 3600000L)
        .select(col("click_id"), col("error_id"))
    val batch = run(clicks, errors).as[(Long, Long)].collect().toSet
    assert(batch == Set((1L, 100L), (2L, 100L), (4L, 200L)))
    // a different bin width changes cost, never results
    assert(StreamJoins.rangeJoinBinned(clicks, "ts", errors, "ets",
        HalfHour, HalfHour, binMs = 600000L)
      .select(col("click_id"), col("error_id"))
      .as[(Long, Long)].collect().toSet == batch)

    // same pairs through streaming sides
    implicit val sqlCtx = spark.sqlContext
    val pMem = MemoryStream[(Long, Timestamp)]
    val aMem = MemoryStream[(Long, Timestamp)]
    val joined = run(pMem.toDF().toDF("click_id", "ts"),
      aMem.toDF().toDF("error_id", "ets"))
    val q = joined.writeStream.outputMode("append")
      .format("memory").queryName("rangejoin").start()
    try {
      pMem.addData(clicks.as[(Long, Timestamp)].collect().toSeq: _*)
      aMem.addData(errors.as[(Long, Timestamp)].collect().toSeq: _*)
      q.processAllAvailable()
      val streamed = spark.table("rangejoin")
        .as[(Long, Long)].collect().toSet
      assert(streamed == batch)
    } finally q.stop()
  }

  test("intervalJoin on streams keeps bounded state (watermark present in plan)") {
    implicit val sqlCtx = spark.sqlContext
    val lMem = MemoryStream[(Long, Timestamp)]
    val rMem = MemoryStream[(Long, Timestamp)]
    val joined = StreamJoins.intervalJoin(
      lMem.toDF().toDF("user_id", "ts"), rMem.toDF().toDF("user_id", "ts"),
      "user_id", "ts")
    // both sides must carry event-time watermarks, otherwise Spark rejects
    // the stream-stream join or retains state forever
    val q = joined.writeStream.outputMode("append")
      .format("memory").queryName("ivjoin_state").start()
    try {
      lMem.addData((1L, Timestamp.valueOf("2024-01-01 10:00:00")))
      rMem.addData((1L, Timestamp.valueOf("2024-01-01 09:30:00")))
      q.processAllAvailable()
      assert(q.lastProgress != null)
    } finally q.stop()
  }

  test("enrich: stream-static dimension join, stream side never shuffles") {
    val facts = Seq((1L, 10L), (2L, 20L), (3L, 99L)).toDF("event_id", "user_id")
    val dim = Seq((10L, "gold"), (20L, "basic")).toDF("user_id", "tier")
    val out = StreamJoins.enrich(facts, dim, "user_id")
      .select("event_id", "tier").as[(Long, Option[String])].collect().toSet
    assert(out == Set((1L, Some("gold")), (2L, Some("basic")), (3L, None)))
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    val plan = StreamJoins.enrich(facts, dim, "user_id").queryExecution.executedPlan
    assert(plan.collect { case s: ShuffleExchangeExec => s }.isEmpty,
      "enrichment must broadcast the dim, never shuffle the fact side")
  }

  test("semiFilter: bloom-prefiltered stream-static semi join matches plain left_semi") {
    implicit val sqlCtx = spark.sqlContext
    val dim = Seq(10L, 20L, 30L).toDF("user_id")
    val mem = MemoryStream[(Long, Long)]
    val facts = mem.toDF().toDF("event_id", "user_id")
    val q = StreamJoins.semiFilter(facts, dim, "user_id")
      .writeStream.outputMode("append")
      .format("memory").queryName("semifilter").start()
    try {
      mem.addData((1L, 10L), (2L, 99L), (3L, 20L))
      q.processAllAvailable()
      mem.addData((4L, 10L), (5L, 77L))
      q.processAllAvailable()
      val got = spark.table("semifilter")
        .select("event_id").as[Long].collect().toSet
      assert(got == Set(1L, 3L, 4L),
        "only dim-matched facts may pass, across micro-batches")
    } finally q.stop()
    // batch form: identical rows to a plain semi-join, and the prefilter
    // is the native codegen'd predicate (asserted on a parquet-backed
    // frame — ConvertToLocalRelation folds filters over local Seqs away)
    val bFacts = Tables.events(spark, "/root/testdata/sf0.001")
      .select("event_id", "user_id")
    val bDim = bFacts.filter(col("user_id") % 5 === 0)
      .select("user_id").distinct()
    val got = StreamJoins.semiFilter(bFacts, bDim, "user_id")
    val want = bFacts.join(bDim, Seq("user_id"), "left_semi")
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
    assert(got.queryExecution.executedPlan.toString.contains("might_contain"))
  }
}
