package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.operators.SkewJoin
import graft.streaming.{EventAggs, Sessionize}
import graft.streaming.Sessionize.{Event, Session}

/** Specs for the skew-salted join, gap sessionization, and HLL rollup. */
class SkewSessionSpec extends SparkSpec {
  import spark.implicits._

  test("saltedInnerJoin equals the plain join on a skewed key distribution") {
    // 90% of rows share key 1 (hot), remainder spread over 100 keys
    val large = spark.range(10000).select(
      when(col("id") % 10 =!= 0, 1L).otherwise(col("id") % 100).as("k"),
      col("id").as("payload"))
    val small = spark.range(100).select(col("id").as("k"), (col("id") * 2).as("v"))
    val plain = large.join(small, Seq("k")).agg(
      count(lit(1)), sum("payload"), sum("v")).head()
    val salted = SkewJoin.saltedInnerJoin(large, small, Seq("k")).agg(
      count(lit(1)), sum("payload"), sum("v")).head()
    assert(salted == plain)
  }

  test("salted join spreads a hot key over multiple partitions") {
    val large = spark.range(1000).select(lit(7L).as("k"), col("id").as("payload"))
    val small = Seq((7L, "x")).toDF("k", "v")
    val parts = SkewJoin.saltedInnerJoin(large, small, Seq("k"), nSalts = 8)
      .groupBy(spark_partition_id()).count().count()
    assert(parts > 1) // without salting a single hot key lands in ONE partition
  }

  test("salted join spreads even when hot-key payloads are identical") {
    // exact-duplicate rows (and key-only tables) defeat a payload-derived
    // salt: every row hashes alike. The row-local salt must still spread.
    val large = spark.range(1000).select(lit(7L).as("k"), lit("same").as("payload"))
    val small = Seq((7L, "x")).toDF("k", "v")
    val salted = SkewJoin.saltedInnerJoin(large, small, Seq("k"), nSalts = 8)
    assert(salted.count() == 1000)
    val parts = salted.groupBy(spark_partition_id()).count().count()
    assert(parts > 1)
  }

  test("sessionize (batch): gap splits, counts, and boundaries") {
    def e(u: Long, s: String) = Event(u, Timestamp.valueOf(s), "click")
    val events = Seq(
      e(1, "2024-01-01 10:00:00"), e(1, "2024-01-01 10:10:00"),
      e(1, "2024-01-01 11:30:00"), // >30min gap -> closes session 1
      e(1, "2024-01-01 11:40:00"),
      e(1, "2024-01-01 13:00:00"), // closes session 2; stays open (not emitted)
      e(2, "2024-01-01 10:00:00"), e(2, "2024-01-01 12:00:00") // s1 closed, s2 open
    ).toDS()
    val got = Sessionize.sessions(events).collect().toSet
    assert(got == Set(
      Session(1, Timestamp.valueOf("2024-01-01 10:00:00"),
        Timestamp.valueOf("2024-01-01 10:10:00"), 2),
      Session(1, Timestamp.valueOf("2024-01-01 11:30:00"),
        Timestamp.valueOf("2024-01-01 11:40:00"), 2),
      Session(2, Timestamp.valueOf("2024-01-01 10:00:00"),
        Timestamp.valueOf("2024-01-01 10:00:00"), 1)))
  }

  test("sessionize (stream): state persists across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val mem = MemoryStream[Event]
    val q = Sessionize.sessions(mem.toDS())
      .writeStream.outputMode("append").format("memory")
      .queryName("sessions").start()
    try {
      mem.addData(Event(9, Timestamp.valueOf("2024-01-01 10:00:00"), "a"))
      q.processAllAvailable()
      assert(spark.table("sessions").count() == 0) // still open
      mem.addData(Event(9, Timestamp.valueOf("2024-01-01 12:00:00"), "b"))
      q.processAllAvailable()
      val s = spark.table("sessions").as[Session].collect().toSeq
      assert(s == Seq(Session(9, Timestamp.valueOf("2024-01-01 10:00:00"),
        Timestamp.valueOf("2024-01-01 10:00:00"), 1)))
    } finally q.stop()
  }

  test("approx user counts within rsd of exact") {
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
    val joined = EventAggs.approxUserCounts(ev)
      .join(ev.groupBy("event_type")
        .agg(countDistinct("user_id").as("exact_users")), "event_type")
    joined.collect().foreach { r =>
      val approx = r.getAs[Long]("approx_users").toDouble
      val exact = r.getAs[Long]("exact_users").toDouble
      assert(math.abs(approx - exact) / exact <= 0.1)
    }
  }
}
