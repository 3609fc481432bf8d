package graft

import org.apache.spark.sql.SparkSession

/** Plan auditor: dumps `explain("formatted")` for every SparkEntry query so
  * scan pruning (PushedFilters/ReadSchema), join strategy (broadcast vs
  * shuffle), and WholeStageCodegen coverage can be reviewed per query.
  *
  * Usage: runMain graft.Explain <sfDir> [queryName...]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names = if (args.length > 1) args.drop(1).toSeq
                else SparkEntry.queries.keys.toSeq.sorted
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // ANSI is the Spark 4 default; pinned so the repo's numeric-budget
      // overflows fail loudly even under cluster-level config drift.
      .config("spark.sql.ansi.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { name =>
      println(s"\n================ $name ================")
      try {
        val df = SparkEntry.queries(name)(spark, sfDir)
        println(df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode))
      } catch {
        case e: Throwable => println(s"EXPLAIN FAILED: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
