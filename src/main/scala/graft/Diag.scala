package graft

import org.apache.spark.sql.SparkSession

// temporary diagnostic main (not part of the library surface)
object Diag {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    def run(name: String): Double = {
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, dir).write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    println("DIAG events rows = " + Tables.events(spark, dir).count())
    for (i <- 1 to 6)
      println(f"DIAG pass$i daily=${run("stream_daily_rollup")}%.3f window=${run("stream_window_agg")}%.3f")
    spark.stop()
  }
}
