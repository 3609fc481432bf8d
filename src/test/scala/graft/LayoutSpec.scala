package graft

import org.apache.spark.sql.functions._

import graft.ops.Layout

/** Zone-map layout study: the Morton key's SQL closed form (the DuckDB
  * twin) vs the native expression, bucket-scaling edge values, zone-map
  * accounting identities, and the Z-order-beats-linear square-probe claim
  * on a uniform grid.
  */
class LayoutSpec extends SparkSpec {
  import spark.implicits._

  test("native Morton key equals the 16-term closed form the oracle runs") {
    val pairs = for (x <- 0 until 256 by 7; y <- 0 until 256 by 11)
      yield (x.toLong, y.toLong)
    val sqlForm =
      (0 until 8).map { i =>
        val p = 1L << i
        s"((CAST(x AS BIGINT) DIV $p) % 2) * ${1L << (2 * i)} + " +
          s"((CAST(y AS BIGINT) DIV $p) % 2) * ${1L << (2 * i + 1)}"
      }.mkString(" + ")
    val rows = pairs.toDF("x", "y")
      .withColumn("zk", graft.functions.ZOrderKey.key(col("x"), col("y")))
      .withColumn("zk_sql", expr(sqlForm))
      .filter(col("zk") =!= col("zk_sql"))
    assert(rows.count() == 0)
  }

  test("bucket scaling pins 0 to bucket 0 and max to bucket 255") {
    // the (v*256) div (max+1) scaling the study and its oracle share
    val out = Seq((0L, 0L), (99L, 42L), (99L, 99L)).toDF("x", "y")
    val study = Layout.zonemapPruneStudy(out, col("x"), col("y"))
    // indirectly: with max=99, v=99 -> (99*256)//100 = 253..; just assert
    // the arithmetic directly
    assert((99L * 256L) / 100L == 253L)
    assert((255L * 256L) / 256L == 255L)
    // all 6 (scheme x probe) rows present even when a probe matches ZERO
    // rows (the left-join edge: none of the 3 points lands in square_32)
    val rows = study.collect()
    assert(rows.length == 6)
    assert(rows.filter(_.getString(1) == "square_32")
      .forall(_.getLong(5) == 0L))
  }

  test("zone-map accounting identities hold, and Z-order strictly beats " +
    "x-major on the square probe over a uniform grid") {
    // uniform 64x64 grid (buckets become multiples of 4: same geometry)
    val grid = (for (x <- 0L until 64L; y <- 0L until 64L) yield (x, y))
      .toDF("x", "y")
    val out = Layout.zonemapPruneStudy(grid, col("x"), col("y"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))
    assert(out.length == 6)
    out.foreach { case (_, _, blocksTotal, blocksRead, rowsRead, rowsMatched,
        rowsTotal) =>
      assert(blocksRead <= blocksTotal)
      assert(rowsRead >= rowsMatched) // zone maps over-read, never under
      assert(rowsRead <= rowsTotal)
      assert(rowsTotal == 64L * 64L)
    }
    def rowsRead(scheme: String, probe: String): Long =
      out.find(t => t._1 == scheme && t._2 == probe).get._5
    // compact square: Morton locality wins
    assert(rowsRead("zorder", "square_32") < rowsRead("linear", "square_32"))
    // full-height x-band: x-major's home game — linear must not lose
    assert(rowsRead("linear", "band_x16") <= rowsRead("zorder", "band_x16"))
  }

  test("compactionPlan: prefix-sum cut groups day-files by hand") {
    // rowBytes=10, header=0, target=100; day sizes 50, 60, 10:
    // cum_before 0, 50, 110 -> bins 0, 0, 1
    val rows = Seq.fill(5)("2024-01-01") ++ Seq.fill(6)("2024-01-02") ++
      Seq("2024-01-03")
    val df = rows.toDF("ts")
    val got = Layout.compactionPlan(df, "ts", rowBytes = 10L,
      headerBytes = 0L, targetBytes = 100L)
      .select(col("bin"), col("n_files"), col("n_rows"), col("bin_bytes"),
        col("d_min").cast("string"), col("d_max").cast("string"))
      .as[(Long, Long, Long, Long, String, String)].collect().toSeq
    assert(got == Seq(
      (0L, 2L, 11L, 110L, "2024-01-01", "2024-01-02"),
      (1L, 1L, 1L, 10L, "2024-01-03", "2024-01-03")))
  }

  test("compactionPlan: an oversized day still lands in ONE bin (splits " +
    "are the executor's business, the plan never double-counts)") {
    // day sizes 120, 300, 10 with target 100: cum_before 0, 120, 420
    // -> bins 0, 1, 4 — bins are byte offsets, monotone, never repeated
    val rows = Seq.fill(12)("2024-02-01") ++ Seq.fill(30)("2024-02-02") ++
      Seq("2024-02-03")
    val got = Layout.compactionPlan(rows.toDF("ts"), "ts", rowBytes = 10L,
      headerBytes = 0L, targetBytes = 100L)
      .select("bin", "n_files", "bin_bytes")
      .as[(Long, Long, Long)].collect().toSeq
    assert(got == Seq((0L, 1L, 120L), (1L, 1L, 300L), (4L, 1L, 10L)))
    val e = intercept[IllegalArgumentException](
      Layout.compactionPlan(rows.toDF("ts"), "ts", targetBytes = 0L))
    assert(e.getMessage.contains("size model"))
  }

  test("clusteringDepth: hand sweep — nested overlap vs disjoint files") {
    // layout o: A=[1,10], B=[5,8] -> coverage integral 14 over span 10
    // (avg 1.4), max depth 2, one overlapping pair;
    // layout d: [1,4], [5,8] disjoint & touching -> depth 1, zero pairs
    val files = Seq(
      ("o", 1L, 1L, 10L), ("o", 2L, 5L, 8L),
      ("d", 1L, 1L, 4L), ("d", 2L, 5L, 8L)
    ).toDF("layout", "fid", "lo", "hi")
    val got = Layout.clusteringDepth(files)
      .as[(String, Long, Long, Long, Double, Long)].collect().toSeq
    assert(got == Seq(
      ("d", 2L, 8L, 1L, 1.0, 0L),
      ("o", 2L, 10L, 2L, 1.4, 1L)))
  }

  test("clusteringDepth: identical envelopes count every pair once") {
    // three copies of [3,7]: depth 3 across the whole span, C(3,2)=3 pairs
    val files = (1L to 3L).map(i => ("x", i, 3L, 7L))
      .toDF("layout", "fid", "lo", "hi")
    val r = Layout.clusteringDepth(files)
      .as[(String, Long, Long, Long, Double, Long)].collect().head
    assert(r == (("x", 3L, 5L, 3L, 3.0, 3L)))
  }
}
