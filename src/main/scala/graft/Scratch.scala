package graft
import org.apache.spark.sql.SparkSession

/** Steady-state single-query timer (not part of the driver contract):
  * `runMain graft.TimeQ <name> [sfDir] [passes]` — warmup + min of passes.
  */
object TimeQ {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      // ANSI is the Spark 4 default; pinned so the repo's numeric-budget
      // overflows fail loudly even under cluster-level config drift.
      .config("spark.sql.ansi.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val passes = args.lift(2).map(_.toInt).getOrElse(2)
    def run(): Double = {
      val t0 = System.nanoTime()
      SparkEntry.queries(args(0))(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    run() // warmup
    val best = (1 to passes).map(_ => run()).min
    println(f"TIMEQ ${args(0)} $best%.3f s")
    spark.stop()
  }
}

/** Throwaway plan-inspection main (not part of the driver contract):
  * executes under the bench session shape (local[cpus], AQE on) and prints
  * the POST-EXECUTION adaptive plan, so AQEShuffleRead coalesce decisions
  * (the real runtime partition counts) are visible, not just the initial
  * plan explain shows.
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // ANSI is the Spark 4 default; pinned so the repo's numeric-budget
      // overflows fail loudly even under cluster-level config drift.
      .config("spark.sql.ansi.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = SparkEntry.queries(args(0))(spark, args.lift(1).getOrElse("/root/testdata/sf0.001"))
    // execute THIS QueryExecution (a .write would plan its own), so the
    // printed AdaptiveSparkPlan is the finalized one (isFinalPlan=true,
    // AQEShuffleRead nodes showing the real coalesce decisions)
    val qe = df.queryExecution
    qe.toRdd.count()
    println(qe.executedPlan.toString)
    spark.stop()
  }
}
