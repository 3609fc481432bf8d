package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Per-stage wall/CPU profiler (not part of the driver contract):
  * `runMain graft.StageProf <query> [sfDir] [passes]` — runs the query under
  * the bench session shape and, for the LAST pass, prints every completed
  * stage's task-time sum, executor CPU, task count and peak shuffle volumes,
  * so the dominant stage of a multi-exchange plan is attributable without
  * the (disabled) UI.
  */
object StageProf {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.ansi.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val passes = args.lift(2).map(_.toInt).getOrElse(3)
    def run(): Double = {
      val t0 = System.nanoTime()
      SparkEntry.queries(args(0))(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    (1 until passes).foreach(_ => run()) // warmup passes
    val stages = scala.collection.mutable.ArrayBuffer
      .empty[(Int, String, Long, Long, Long, Long, Int, Long, Long)]
    val listener = new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val m = si.taskMetrics
        val scopes = si.rddInfos.flatMap(r => r.scope.map(_.name))
          .distinct.mkString(",").take(70)
        stages += ((si.stageId, scopes,
          m.executorRunTime, m.executorCpuTime / 1000000,
          m.jvmGCTime, m.shuffleReadMetrics.fetchWaitTime,
          si.numTasks, m.shuffleReadMetrics.totalBytesRead,
          m.shuffleWriteMetrics.bytesWritten))
      }
    }
    spark.sparkContext.addSparkListener(listener)
    val wall = run()
    // drain BEFORE removing: the listener bus is async, so events still
    // queued at removal would never be delivered and the profile would
    // under-report the run's final stages (r13 ADVICE)
    Thread.sleep(500)
    spark.sparkContext.removeSparkListener(listener)
    println(f"STAGEPROF ${args(0)} wall=$wall%.3f s")
    println("stage  runMs   cpuMs    gcMs  fetchW tasks   shufR   shufW  scopes")
    stages.sortBy(-_._3).foreach { case (id, scopes, rt, cpu, gc, fw, n, sr, sw) =>
      println(f"$id%5d $rt%6d $cpu%7d $gc%7d $fw%7d $n%5d $sr%7d $sw%7d  $scopes")
    }
    spark.stop()
  }
}
