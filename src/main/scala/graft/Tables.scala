package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated parquet fixtures (see TESTDATA.md).
  *
  * Every query in [[SparkEntry.queries]] receives a scale-factor directory and
  * reads tables through here, so projection/predicate pushdown reaches the
  * parquet scan uniformly. At cluster scale these would be catalog tables
  * (`spark.read.table`); the URI is the only thing that changes.
  */
object Tables {
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** `events.parquet` has stored `ts` as parquet TIMESTAMP(NANOS) in some
    * fixture generations (which Spark 4 rejects unless read as a raw long)
    * and TIMESTAMP(MICROS) in others. Normalize whatever is on disk to a
    * session-zoned micros TimestampType so downstream code sees one type:
    * nanos arrive as long (via `nanosAsLong`) and are rebuilt with integer
    * DIV — epoch-ns values (~1.7e18) exceed double's 2^53 integer range, so
    * floating division would be off by up to 1 us — while micros arrive as
    * TIMESTAMP_NTZ and cast losslessly under the UTC session zone.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    val raw = table(spark, dir, "events")
    raw.schema("ts").dataType match {
      case LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast(TimestampType))
      case _ => raw
    }
  }

  def region(s: SparkSession, d: String): DataFrame    = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = table(s, d, "lineitem")
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")

  /** Session factory for library consumers / tests (the driver's Verify/Bench
    * mains build their own). local[32] mirrors the bench harness; on a real
    * cluster these settings come from spark-submit and this is not used.
    */
  def localSession(appName: String = "graft", cores: Int = 32): SparkSession =
    SparkSession.builder()
      .master(s"local[$cores]")
      .appName(appName)
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // ANSI is the Spark 4 default; pinned so the repo's numeric-budget
      // overflows fail loudly even under cluster-level config drift.
      .config("spark.sql.ansi.enabled", "true")
      .getOrCreate()
}
