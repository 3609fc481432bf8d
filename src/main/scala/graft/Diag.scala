package graft

import org.apache.spark.sql.SparkSession

/** Repeat-timing harness for per-query variance attribution: runs the named
  * queries N times each under the bench sink (noop write) in one JVM and
  * prints every pass, so environment stalls (external CPU contention, JIT
  * storms) are distinguishable from structural plan cost — a stall shows as
  * outlier passes around a fast steady-state, a structural cost reproduces
  * on every pass. Used to adjudicate BENCH outliers (see BASELINE.md
  * "Bench variance protocol").
  *
  * Usage: runMain graft.Diag <sfDir> [passes] [queryName...]
  * Defaults: sf0.1, 6 passes, stream_daily_rollup + stream_window_agg.
  */
object Diag {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // ANSI is the Spark 4 default; pinned so the repo's numeric-budget
      // overflows fail loudly even under cluster-level config drift.
      .config("spark.sql.ansi.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val passes = args.drop(1).headOption.map(_.toInt).getOrElse(6)
    val names =
      if (args.length > 2) args.drop(2).toSeq
      else Seq("stream_daily_rollup", "stream_window_agg")
    def run(name: String): Double = {
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, dir).write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    for (i <- 1 to passes) {
      val line = names.map(n => f"$n=${run(n)}%.3f").mkString(" ")
      println(s"DIAG pass$i $line")
    }
    spark.stop()
  }
}
