package graft

import org.apache.spark.sql.SparkSession

/** Repeat-timing harness for the WRITE path — [[Bench.benchIngest]] run N
  * times in one JVM, every pass printed. The ingest analog of [[Diag]]:
  * BENCH_r10 recorded 10.5 k rows/s, below the 12–29 k machine band for
  * the first time, and the adjudication question is the usual one —
  * environment stall (outlier passes around a fast steady state) vs a
  * structural regression (every pass slow). The first pass doubles as the
  * JIT warmup, so read the steady state from passes 2+.
  *
  * Usage: runMain graft.IngestDiag [passes] [nFiles]
  */
object IngestDiag {
  def main(args: Array[String]): Unit = {
    val passes = args.headOption.map(_.toInt).getOrElse(4)
    val nFiles = args.drop(1).headOption.map(_.toInt).getOrElse(6)
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
    spark.sparkContext.setLogLevel("ERROR")
    for (i <- 1 to passes) {
      val r = Bench.benchIngest(spark, nFiles)
      println(f"INGEST pass$i rows=${r.rows} sec=${r.seconds}%.2f " +
        f"rows_per_sec=${r.rowsPerSec}%.0f")
    }
    spark.stop()
  }
}
