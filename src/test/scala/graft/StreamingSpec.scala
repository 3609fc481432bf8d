package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.icenet.{North, TableOps}
import graft.streaming.{EventAggs, FileIngest}

/** Streaming-surface tests: file-at-a-time ingest (S1 semantics) and
  * watermarked event-time aggregation (§2.8 beyond-reference).
  */
class StreamingSpec extends SparkSpec {
  import spark.implicits._

  test("FileIngest: two files arriving -> pipeline state converges per batch") {
    val inDir = tmpDir("stream_in")
    val wh = tmpDir("stream_wh")
    val ckpt = tmpDir("stream_ckpt")

    def writeFile(gen: String): Unit = {
      val t = Timestamp.valueOf(s"$gen 00:00:00")
      val rows = for { xi <- 1 to 2; yi <- 1 to 2; lt <- 1 to 2 }
        yield (t, lt, xi * 25.0, yi * 25.0, 85.0, 10.0, 0.1 * xi + 0.01 * lt, 0.01)
      rows.toDF("time", "leadtime", "xc", "yc", "lat", "lon", "sic_mean", "sic_stddev")
        .coalesce(1).write.mode("append").parquet(inDir)
    }

    writeFile("2020-06-01")
    val q = FileIngest.start(spark, inDir, wh, North, ckpt)
    try {
      q.processAllAvailable()
      assert(TableOps.read(spark, s"$wh/north_forecast").count() == 8)
      writeFile("2020-06-08") // second "blob" lands
      q.processAllAvailable()
      val facts = TableOps.read(spark, s"$wh/north_forecast")
      assert(facts.count() == 16)
      val latest = TableOps.read(spark, s"$wh/north_forecast_latest")
      assert(latest.select("date_forecast_generated").distinct().head().getDate(0)
        == java.sql.Date.valueOf("2020-06-08"))
      assert(TableOps.read(spark, s"$wh/forecast_meta").count() == 2)
    } finally q.stop()
  }

  test("startNc: raw .nc blobs (classic CDF-1 + HDF5) stream through the " +
    "byte decoders; state == batch path; replay converges") {
    val inDir = tmpDir("ncstream_in")
    val whStream = tmpDir("ncstream_whS")
    val whBatch = tmpDir("ncstream_whB")
    val ckpt = tmpDir("ncstream_ckpt")

    // two real .nc drops, one per codec, different generation dates —
    // the exact blob sequence the reference's trigger consumes
    def writeNc(path: String, dayOffset: Int, hdf5: Boolean): Unit = {
      val times = Array((1590969600L + dayOffset * 86400L) * 1000000L) // 2020-06-01 + d
      val leads = Array(1, 2)
      val yc = Array(-537.5, -512.5)
      val xc = Array(-262.5, -237.5)
      val mean = Array.tabulate(8)(i => 0.1 * dayOffset + 0.01 * (i + 1))
      val sd = Array.tabulate(8)(i => 0.001 * (i + 1))
      if (hdf5)
        graft.sources.Hdf5Netcdf.write(path, times, leads, yc, xc, mean, sd)
      else
        graft.sources.NetcdfClassic.write(path, times, leads, yc, xc, mean, sd,
          recordTime = true)
    }
    writeNc(s"$inDir/drop_a.nc", 0, hdf5 = false)

    val q = FileIngest.startNc(spark, inDir, whStream, North, ckpt)
    try {
      q.processAllAvailable()
      assert(TableOps.read(spark, s"$whStream/north_forecast").count() == 8)
      writeNc(s"$inDir/drop_b.nc", 7, hdf5 = true) // second blob, other codec
      q.processAllAvailable()
    } finally q.stop()

    // batch path over the same two blobs in the same order
    val pipeB = new graft.icenet.Pipeline(spark, whBatch, North)
    pipeB.ingest(spark.read.format("gridded").load(s"$inDir/drop_a.nc"))
    pipeB.ingest(spark.read.format("gridded").load(s"$inDir/drop_b.nc"))

    def state(wh: String, table: String): Set[String] =
      TableOps.read(spark, s"$wh/$table").collect()
        .map(_.toSeq.map(String.valueOf).mkString("|")).toSet
    for (t <- Seq("north_forecast", "north_forecast_latest", "forecast_meta")) {
      val s = state(whStream, t)
      assert(s == state(whBatch, t), s"stream vs batch state diverges on $t")
      assert(s.nonEmpty, s"$t empty")
    }
    assert(state(whStream, "north_forecast_latest")
      .forall(_.contains("2020-06-08")), "latest view must be the second drop")

    // replay: fresh checkpoint, same files, same warehouse -> fixed point
    val before = Seq("north_forecast", "north_forecast_latest", "forecast_meta")
      .map(t => t -> state(whStream, t)).toMap
    val q2 = FileIngest.startNc(spark, inDir, whStream, North, tmpDir("ncstream_ckpt2"))
    try q2.processAllAvailable() finally q2.stop()
    for ((t, s) <- before)
      assert(state(whStream, t) == s, s"replay must converge on $t")
  }

  test("windowedByType on a stream: watermark drops data later than 1 hour") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String, Double)]
    val events = mem.toDF().toDF("ts", "event_type", "value")
    val agg = EventAggs.windowedByType(events, watermark = "1 hour")
    val q = agg.writeStream.outputMode("update")
      .format("memory").queryName("winagg").start()
    try {
      mem.addData((Timestamp.valueOf("2024-01-01 10:05:00"), "click", 1.0))
      mem.addData((Timestamp.valueOf("2024-01-01 13:00:00"), "click", 2.0)) // advances watermark to 12:00
      q.processAllAvailable()
      mem.addData((Timestamp.valueOf("2024-01-01 10:10:00"), "click", 4.0)) // 2h late: dropped
      mem.addData((Timestamp.valueOf("2024-01-01 13:10:00"), "click", 8.0)) // on time
      q.processAllAvailable()
      val out = spark.table("winagg")
        .groupBy("window_start", "event_type")
        .agg(max("n_events").as("n"), max("sum_value").as("v"))
        .collect().map(r => (r.getTimestamp(0).toString, r.getLong(2), r.getDouble(3)))
        .toSet
      // 10:00 window saw only the first event (late one dropped);
      // 13:00 window saw both on-time events.
      assert(out == Set(
        ("2024-01-01 10:00:00.0", 1L, 1.0),
        ("2024-01-01 13:00:00.0", 2L, 10.0)))
    } finally q.stop()
  }

  test("windowedTopK: stream answer is bit-identical to batch (top-k " +
    "merge is a semilattice; ties break on user_id)") {
    implicit val sqlCtx = spark.sqlContext
    val rows = (1 to 120).map { i =>
      // 2 hourly windows; values collide (i % 7) so the user_id ASC
      // tie-break is exercised at the k boundary
      (Timestamp.valueOf(f"2024-01-01 ${10 + i % 2}%02d:15:00"),
        (i % 40).toLong, (i % 7).toDouble)
    }
    def shape(df: org.apache.spark.sql.DataFrame) =
      df.collect()
        .map(r => (r.getTimestamp(0).toString, r.getLong(1), r.getLong(2),
          r.getDouble(3))).toSet
    val batch = shape(EventAggs.windowedTopK(
      rows.toDF("ts", "user_id", "value"), k = 5))
    assert(batch.size == 10) // 2 windows x top-5
    assert(batch.forall(_._4 == 6.0)) // 7 collisions of the max value
    val mem = MemoryStream[(Timestamp, Long, Double)]
    val q = EventAggs.windowedTopK(
      mem.toDF().toDF("ts", "user_id", "value"), k = 5)
      .writeStream.outputMode("complete")
      .format("memory").queryName("topkwin").start()
    try {
      val shuffled = rows.reverse
      mem.addData(shuffled.take(50)); q.processAllAvailable()
      mem.addData(shuffled.drop(50)); q.processAllAvailable()
      assert(shape(spark.table("topkwin")) == batch)
    } finally q.stop()
  }

  test("windowedDistinctSketch: stream answer is bit-identical to batch " +
    "(mergeable state is arrival-order-invariant)") {
    implicit val sqlCtx = spark.sqlContext
    val rows = (1 to 300).map { i =>
      // 3 hourly windows, duplicated users (100 distinct per window)
      (Timestamp.valueOf(f"2024-01-01 ${10 + i % 3}%02d:30:00"),
        (i % 100).toLong + 1000L * (i % 3))
    }
    val batchDf = rows.toDF("ts", "user_id")
    val batch = EventAggs.windowedDistinctSketch(batchDf, k = 32)
      .collect().map(r => (r.getTimestamp(0).toString, r.getLong(1), r.getInt(2)))
      .toSet
    val mem = MemoryStream[(Timestamp, Long)]
    val stream = EventAggs.windowedDistinctSketch(
      mem.toDF().toDF("ts", "user_id"), k = 32)
    // complete mode: the memory sink holds exactly the final per-window
    // state after the last micro-batch — no last-row disambiguation
    val q = stream.writeStream.outputMode("complete")
      .format("memory").queryName("kmvwin").start()
    try {
      // deliver in three shuffled slices across separate micro-batches:
      // same SET, different order and batching
      val shuffled = rows.reverse
      mem.addData(shuffled.take(100)); q.processAllAvailable()
      mem.addData(shuffled.slice(100, 250)); q.processAllAvailable()
      mem.addData(shuffled.drop(250)); q.processAllAvailable()
      val streamed = spark.table("kmvwin")
        .collect().map(r => (r.getTimestamp(0).toString, r.getLong(1), r.getInt(2)))
        .toSet
      assert(streamed == batch)
      // 100 distinct users per window, k=32 -> sketch saturated at 32,
      // estimate within the KMV envelope
      assert(batch.forall(_._3 == 32))
      assert(batch.forall(t => math.abs(t._2 - 100L) < 50))
    } finally q.stop()
  }

  test("windowedDistinctHll: stream answer is bit-identical to batch " +
    "(register max-merge is arrival-order- and batching-invariant)") {
    implicit val sqlCtx = spark.sqlContext
    val rows = (1 to 300).map { i =>
      (Timestamp.valueOf(f"2024-01-01 ${10 + i % 3}%02d:30:00"),
        (i % 100).toLong + 1000L * (i % 3))
    }
    val batchDf = rows.toDF("ts", "user_id")
    val batch = EventAggs.windowedDistinctHll(batchDf)
      .collect().map(r => (r.getTimestamp(0).toString, r.getLong(1), r.getLong(2)))
      .toSet
    val mem = MemoryStream[(Timestamp, Long)]
    val stream = EventAggs.windowedDistinctHll(mem.toDF().toDF("ts", "user_id"))
    val q = stream.writeStream.outputMode("complete")
      .format("memory").queryName("hllwin").start()
    try {
      val shuffled = rows.reverse
      mem.addData(shuffled.take(100)); q.processAllAvailable()
      mem.addData(shuffled.slice(100, 250)); q.processAllAvailable()
      mem.addData(shuffled.drop(250)); q.processAllAvailable()
      val streamed = spark.table("hllwin")
        .collect().map(r => (r.getTimestamp(0).toString, r.getLong(1), r.getLong(2)))
        .toSet
      assert(streamed == batch)
      // 100 distinct per window: deep inside the small-range regime, so
      // nearly all 2048 registers stay zero — the regime indicator works
      assert(batch.forall(_._3 > 1900L))
    } finally q.stop()
  }

  test("windowedDistinctBitmap: stream answer equals batch equals exact " +
    "count (bitmap union is arrival-order- and batching-invariant)") {
    implicit val sqlCtx = spark.sqlContext
    val rows = (1 to 300).map { i =>
      (Timestamp.valueOf(f"2024-01-01 ${10 + i % 3}%02d:30:00"),
        (i % 100).toLong + 1000L * (i % 3))
    }
    val batch = EventAggs.windowedDistinctBitmap(rows.toDF("ts", "user_id"))
      .collect().map(r => (r.getTimestamp(0).toString, r.getLong(1))).toSet
    assert(batch.forall(_._2 == 100L)) // exact, not an estimate
    val mem = MemoryStream[(Timestamp, Long)]
    val q = EventAggs.windowedDistinctBitmap(mem.toDF().toDF("ts", "user_id"))
      .writeStream.outputMode("complete").format("memory")
      .queryName("bmwin").start()
    try {
      val shuffled = rows.reverse
      mem.addData(shuffled.take(150)); q.processAllAvailable()
      mem.addData(shuffled.drop(150)); q.processAllAvailable()
      val streamed = spark.table("bmwin")
        .collect().map(r => (r.getTimestamp(0).toString, r.getLong(1))).toSet
      assert(streamed == batch)
    } finally q.stop()
  }

  test("windowedByType batch/stream parity on the events fixture") {
    val batch = EventAggs.windowedByType(Tables.events(spark, "/root/testdata/sf0.001"))
    assert(batch.count() > 0)
    val total = batch.agg(sum("n_events")).head().getLong(0)
    assert(total == 1000L) // every event lands in exactly one window
  }

  test("slidingByType: every event lands in exactly size/slide windows") {
    val sliding = EventAggs.slidingByType(Tables.events(spark, "/root/testdata/sf0.001"))
    // 1h windows sliding by 15m: each event belongs to exactly 4 windows
    assert(sliding.agg(sum("n_events")).head().getLong(0) == 4000L)
  }

  test("windowedQuantileSketch: watermark drops late rows from the " +
    "window sample (bounded streaming state)") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String, Double)]
    val q = EventAggs.windowedQuantileSketch(
      mem.toDF().toDF("ts", "event_id", "value"), k = 16,
      watermark = "1 hour")
      .writeStream.outputMode("update").format("memory")
      .queryName("qwmark").start()
    try {
      mem.addData((Timestamp.valueOf("2024-01-01 10:05:00"), "a", 1.0))
      mem.addData((Timestamp.valueOf("2024-01-01 13:00:00"), "b", 2.0))
      q.processAllAvailable() // watermark advances to 12:00
      mem.addData((Timestamp.valueOf("2024-01-01 10:10:00"), "c", 99.0)) // late
      q.processAllAvailable()
      val tenOClock = spark.table("qwmark")
        .filter(col("window_start") === Timestamp.valueOf("2024-01-01 10:00:00"))
        .groupBy("window_start").agg(max("n_rows").as("n"), max("m").as("m"))
        .collect()
      // the 2h-late row never entered the 10:00 window's sample
      assert(tenOClock.map(r => (r.getLong(1), r.getLong(2))).toSet ==
        Set((1L, 1L)))
    } finally q.stop()
  }

  test("windowedFrequencySketch: stream CMS is bit-identical to batch, " +
    "and probes are one-sided (est >= exact)") {
    implicit val sqlCtx = spark.sqlContext
    val types = Seq("click", "view", "error", "purchase")
    val rows = (1 to 400).map { i =>
      (Timestamp.valueOf(f"2024-01-01 ${10 + i % 2}%02d:15:00"),
        types(if (i % 10 < 6) 0 else i % 4)) // Zipf-ish: clicks dominate
    }
    val batchDf = rows.toDF("ts", "event_type")
    def cells(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getTimestamp(0).toString, r.getInt(1),
        r.getLong(2), r.getLong(3))).toSet
    val batch = cells(EventAggs.windowedFrequencySketch(batchDf, d = 3, w = 32))
    val mem = MemoryStream[(Timestamp, String)]
    val q = EventAggs.windowedFrequencySketch(
      mem.toDF().toDF("ts", "event_type"), d = 3, w = 32)
      .writeStream.outputMode("complete").format("memory")
      .queryName("cmswin").start()
    try {
      val shuffled = rows.reverse
      mem.addData(shuffled.take(150)); q.processAllAvailable()
      mem.addData(shuffled.drop(150)); q.processAllAvailable()
      assert(cells(spark.table("cmswin")) == batch)
    } finally q.stop()
    // probe each (window, type) from the sketch: est = min over rows j of
    // its bucket count; must be >= the exact count (one-sided guarantee)
    val sketch = EventAggs.windowedFrequencySketch(batchDf, d = 3, w = 32)
      .collect().map(r => ((r.getTimestamp(0).toString, r.getInt(1),
        r.getLong(2)), r.getLong(3))).toMap
    def bucket(j: Int, key: String): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$j:$key".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(8)
      java.lang.Long.parseLong(hex, 16) % 32
    }
    val exact = rows.groupBy { case (ts, t) =>
      (ts.toString.substring(0, 13), t)
    }.map { case (_, g) => (g.head._1, g.head._2, g.size.toLong) }
    for ((ts, t, n) <- exact) {
      val winStart = Timestamp.valueOf(
        ts.toString.substring(0, 13) + ":00:00").toString
      val est = (0 until 3).map(j =>
        sketch.getOrElse((winStart, j, bucket(j, t)), 0L)).min
      assert(est >= n, s"($winStart, $t): est $est < exact $n")
    }
  }

  test("windowedQuantileSketch: stream sample is bit-identical to batch; " +
    "small windows are exact") {
    implicit val sqlCtx = spark.sqlContext
    val rows = (1 to 120).map { i =>
      // two hourly windows, 60 values each; values 1..60 per window
      (Timestamp.valueOf(f"2024-01-01 ${10 + i % 2}%02d:40:00"),
        (i % 2).toString + "-" + i.toString, (i / 2 % 60 + 1).toDouble)
    }
    val batchDf = rows.toDF("ts", "event_id", "value")
    def out(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getTimestamp(0).toString, r.getLong(1),
        r.getLong(2), r.getDouble(3), r.getDouble(4))).toSet
    val batch = out(EventAggs.windowedQuantileSketch(batchDf, k = 16))
    val mem = MemoryStream[(Timestamp, String, Double)]
    val q = EventAggs.windowedQuantileSketch(
      mem.toDF().toDF("ts", "event_id", "value"), k = 16)
      .writeStream.outputMode("complete").format("memory")
      .queryName("qwin").start()
    try {
      val shuffled = rows.reverse
      mem.addData(shuffled.take(40)); q.processAllAvailable()
      mem.addData(shuffled.slice(40, 90)); q.processAllAvailable()
      mem.addData(shuffled.drop(90)); q.processAllAvailable()
      assert(out(spark.table("qwin")) == batch)
    } finally q.stop()
    // with k >= n the sample is the whole window and estimates are exact
    val exact = out(EventAggs.windowedQuantileSketch(batchDf, k = 128))
    assert(exact.forall { case (_, n, m, p50, p90) =>
      n == 60L && m == 60L && p50 == 30.0 && p90 == 54.0 })
  }
}
