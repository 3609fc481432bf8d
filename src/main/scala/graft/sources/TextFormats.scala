package graft.sources

import org.apache.spark.sql.DataFrame

/** CSV / JSON-lines read+write — the text-format leg of the source surface
  * (the reference's inputs are NetCDF + its SQL store; a complete library
  * also has to ingest the interchange formats everything else emits).
  *
  * Both round-trips pin the two decisions that make text formats exact:
  *  - an EXPLICIT schema on read (never inference — inference costs an
  *    extra full scan at 100 TB and can widen/narrow types between
  *    batches), and
  *  - an explicit microsecond timestamp render (`TsFmt`), because the
  *    default CSV timestamp format truncates sub-second precision and a
  *    naive reader would silently shift typed columns.
  * Doubles survive exactly: both writers emit Java's shortest
  * round-trip-exact rendering and both parsers reproduce the bit pattern.
  *
  * Scale notes: CSV and JSON-lines files are SPLITTABLE as written here
  * (one record per line); enabling `multiLine` (needed only for
  * newline-bearing CSV fields) forces whole-file parsing — keep such
  * fields out of big tables, or pay the non-splittable read.
  */
object TextFormats {

  /** Microsecond-exact timestamp render shared by writer and reader. */
  val TsFmt = "yyyy-MM-dd HH:mm:ss.SSSSSS"

  /** Writes `df` as headered CSV under `root`, reads it back with `df`'s
    * own schema. `multiLine` only if fields may embed newlines (the read
    * then stops being splittable).
    */
  def csvRoundTrip(
      df: DataFrame, root: String, multiLine: Boolean = false): DataFrame = {
    df.write.mode("overwrite")
      .option("header", "true")
      .option("timestampFormat", TsFmt)
      .csv(root)
    df.sparkSession.read
      .schema(df.schema)
      .option("header", "true")
      .option("timestampFormat", TsFmt)
      .option("multiLine", multiLine.toString)
      .csv(root)
  }

  /** Writes `df` as JSON lines under `root`, reads it back with `df`'s
    * own schema (JSON lines stay splittable; no multiLine variant — a
    * JSON string field carries `\n` escaped, unlike CSV).
    */
  def jsonRoundTrip(df: DataFrame, root: String): DataFrame = {
    df.write.mode("overwrite")
      .option("timestampFormat", TsFmt)
      .json(root)
    df.sparkSession.read
      .schema(df.schema)
      .option("timestampFormat", TsFmt)
      .json(root)
  }
}
