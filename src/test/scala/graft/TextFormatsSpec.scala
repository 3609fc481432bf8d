package graft

import java.sql.Timestamp

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.sources.TextFormats

/** Text-format round-trips on exactly the value classes that break naive
  * CSV/JSON plumbing: embedded delimiters/quotes, unicode, nulls,
  * shortest-repr-critical doubles, sub-second timestamps, and (CSV only)
  * newline-bearing fields under multiLine.
  */
class TextFormatsSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("id", LongType),
    StructField("s", StringType),
    StructField("x", DoubleType),
    StructField("t", TimestampType)))

  private def tricky = spark.createDataFrame(
    java.util.Arrays.asList(
      Row(1L, "plain", 1.5, Timestamp.valueOf("2024-01-02 03:04:05.123456")),
      Row(2L, "comma, inside", 0.1 + 0.2, // 0.30000000000000004 — needs 17 digits
        Timestamp.valueOf("2024-01-02 03:04:05")),
      Row(3L, "quote \" inside", -1.0e-300,
        Timestamp.valueOf("1999-12-31 23:59:59.999999")),
      Row(4L, null, null, null),
      Row(5L, "unicode é漢🎯", 9.007199254740993e15, // 2^53 + 1, exact double
        Timestamp.valueOf("2024-06-01 00:00:00.000001"))),
    schema)

  private def asSet(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.get(0), r.get(1), r.get(2), r.get(3))).toSet

  test("CSV round-trip is exact on delimiters, quotes, unicode, nulls, " +
    "17-digit doubles, and microsecond timestamps") {
    val got = TextFormats.csvRoundTrip(tricky, tmpDir("csv_rt"))
    assert(asSet(got) == asSet(tricky))
  }

  test("CSV round-trip carries newline-bearing fields under multiLine") {
    val nl = spark.createDataFrame(
      java.util.Arrays.asList(
        Row(1L, "line one\nline two", 2.5,
          Timestamp.valueOf("2024-01-01 00:00:00"))),
      schema)
    val got = TextFormats.csvRoundTrip(nl, tmpDir("csv_nl"), multiLine = true)
    assert(asSet(got) == asSet(nl))
  }

  test("JSON round-trip is exact on the same value classes") {
    val got = TextFormats.jsonRoundTrip(tricky, tmpDir("json_rt"))
    assert(asSet(got) == asSet(tricky))
    // JSON needs no multiLine: the newline travels escaped inside the string
    val nl = spark.createDataFrame(
      java.util.Arrays.asList(
        Row(1L, "line one\nline two", 2.5,
          Timestamp.valueOf("2024-01-01 00:00:00"))),
      schema)
    assert(asSet(TextFormats.jsonRoundTrip(nl, tmpDir("json_nl"))) == asSet(nl))
  }
}
