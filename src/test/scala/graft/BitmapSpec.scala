package graft

import org.apache.spark.sql.functions._

import graft.functions.Bitmap
import graft.ops.Bitmaps

/** Roaring-style bitmap: container promotion at the 4096 boundary,
  * canonical (order-independent) serialization, build/merge/cardinality
  * equivalence with exact distinct counting, zero-copy AND walk across
  * every container-type pairing, id-domain guard, and the SQL surface.
  */
class BitmapSpec extends SparkSpec {
  import spark.implicits._

  private def buildBytes(ids: Seq[Long]): Array[Byte] = {
    val st = new Bitmap.State()
    ids.foreach(st.add)
    Bitmap.serialize(st)
  }

  test("serialization is canonical: same id set, any insertion order") {
    val ids = (0L until 9000L by 3L) ++ Seq(70000L, 1L << 40, (1L << 40) + 5)
    val a = buildBytes(ids)
    val b = buildBytes(scala.util.Random.shuffle(ids.toVector))
    assert(java.util.Arrays.equals(a, b))
    assert(Bitmap.cardinality(a) == ids.distinct.length.toLong)
  }

  test("sparse container promotes to dense exactly past 4096 members") {
    // 4096 members: sparse payload (2 bytes each); 4097th promotes to the
    // 8 KiB bitset. Cardinality and round-trip stay exact across the edge.
    val atEdge = buildBytes(0L until 4096L)
    val past = buildBytes(0L until 4097L)
    assert(atEdge.length == 4 + 8 + 2 * 4096)
    assert(past.length == 4 + 8 + 8 * 1024)
    assert(Bitmap.cardinality(atEdge) == 4096L)
    assert(Bitmap.cardinality(past) == 4097L)
    val rt = Bitmap.serialize(Bitmap.deserialize(past))
    assert(java.util.Arrays.equals(rt, past))
  }

  test("andCardinality covers sparse x sparse, sparse x dense, dense x dense") {
    val sparseA = buildBytes(Seq(1L, 5L, 9L, 70000L))        // two containers
    val sparseB = buildBytes(Seq(5L, 9L, 11L, 70001L))
    assert(Bitmap.andCardinality(sparseA, sparseB) == 2L)     // {5, 9}
    val dense = buildBytes(0L until 5000L)                    // one dense
    assert(Bitmap.andCardinality(sparseA, dense) == 3L)       // {1, 5, 9}
    assert(Bitmap.andCardinality(dense, sparseA) == 3L)       // symmetric
    val dense2 = buildBytes(2500L until 7500L)
    assert(Bitmap.andCardinality(dense, dense2) == 2500L)
    // disjoint container keys: nothing decoded, zero
    assert(Bitmap.andCardinality(buildBytes(Seq(1L)),
      buildBytes(Seq(1L << 30))) == 0L)
  }

  test("merge across container representations equals the union set") {
    val a = new Bitmap.State(); (0L until 5000L).foreach(a.add)    // dense
    val b = new Bitmap.State(); Seq(4999L, 5001L, 70000L).foreach(b.add)
    a.merge(b)
    assert(a.cardinality == 5002L)
    val viaBytes = new Bitmap.State()
    Bitmap.mergeSerialized(viaBytes, buildBytes(0L until 5000L))
    Bitmap.mergeSerialized(viaBytes, buildBytes(Seq(4999L, 5001L, 70000L)))
    assert(java.util.Arrays.equals(
      Bitmap.serialize(a), Bitmap.serialize(viaBytes)))
  }

  test("ids outside [0, 2^47) fail loudly") {
    val st = new Bitmap.State()
    val e = intercept[IllegalArgumentException](st.add(-1L))
    assert(e.getMessage.contains("2^47"))
    intercept[IllegalArgumentException](st.add(1L << 47))
  }

  test("bitmap aggregate matches count_distinct; merged ALL row matches " +
    "the direct global bitmap") {
    val df = (1 to 20000).map(i => (s"g${i % 5}", (i % 3777).toLong))
      .toDF("grp", "id")
    val viaBitmap = Bitmaps.bitmapDistinctRollup(df, col("grp"), col("id"))
      .as[(String, Long)].collect().toMap
    val exact = df.groupBy("grp").agg(count_distinct(col("id")).as("n"))
      .as[(String, Long)].collect().toMap
    exact.foreach { case (g, n) => assert(viaBitmap(g) == n) }
    assert(viaBitmap("ALL") == 3777L)
  }

  test("retention pairs: counts, inclusion-exclusion, and exact-ratio rates") {
    val df = Seq(
      (2000L, 1L), (2000L, 2L), (2000L, 3L),
      (2001L, 2L), (2001L, 3L), (2001L, 4L), (2001L, 5L),
      (2002L, 5L)).toDF("bucket", "id")
    val rows = Bitmaps.bitmapRetention(df, col("bucket"), col("id"))
      .collect()
    assert(rows.length == 2)
    val r0 = rows(0)
    assert(r0.getLong(0) == 2000L && r0.getLong(1) == 2001L)
    assert(r0.getLong(2) == 3L && r0.getLong(3) == 4L)     // n_a, n_b
    assert(r0.getLong(4) == 2L)                            // retained {2,3}
    assert(r0.getLong(5) == 1L && r0.getLong(6) == 2L)     // churned, new
    assert(r0.getDouble(7) == 0.666667)                    // 2/3 half-up 6dp
    assert(r0.getDouble(8) == 0.4)                         // 2/5
  }

  test("rollingDistinctUsers: calendar RANGE frame — a gap day shrinks " +
    "the window instead of stretching it") {
    import java.sql.Timestamp
    def t(day: Int, uid: Long) =
      (Timestamp.valueOf(f"2024-01-$day%02d 12:00:00"), uid)
    // days 1, 2, then a gap to day 9: day 9's trailing week (3..9)
    // must NOT see days 1-2 (a ROWS -6 frame would)
    val ev = (Seq(t(1, 1L), t(1, 2L), t(2, 2L), t(2, 3L), t(9, 7L)))
      .toDF("ts", "user_id")
    val got = graft.ops.Bitmaps.rollingDistinctUsers(ev)
      .collect().map(r => (r.getDate(0).toString, r.getLong(1), r.getLong(2)))
    assert(got.toSeq == Seq(
      ("2024-01-01", 2L, 2L),   // {1,2}
      ("2024-01-02", 3L, 2L),   // {1,2,3} cumulative within week
      ("2024-01-09", 1L, 1L)))  // gap: only day 9's {7}
  }

  test("the bitmap family is registered for SQL users") {
    (1 to 100).map(i => (s"g${i % 2}", (i % 37).toLong)).toDF("grp", "id")
      .createOrReplaceTempView("bitmap_sql_in")
    graft.functions.VectorFunctions.register(spark)
    val out = spark.sql(
      """SELECT grp, graft_bitmap_card(bm) AS n,
        |       graft_bitmap_and_card(bm, bm) AS n_self
        |FROM (SELECT grp, graft_bitmap(id) AS bm
        |      FROM bitmap_sql_in GROUP BY grp)""".stripMargin)
      .as[(String, Long, Long)].collect()
    assert(out.length == 2 && out.forall { case (_, n, nSelf) => n == nSelf })
    // merging the two group bitmaps covers all 37 residues
    assert(spark.sql(
      """SELECT graft_bitmap_card(graft_bitmap_merge(bm)) FROM
        |(SELECT grp, graft_bitmap(id) AS bm FROM bitmap_sql_in
        | GROUP BY grp)""".stripMargin).as[Long].head() == 37L)
    val e = intercept[org.apache.spark.sql.AnalysisException](
      spark.sql("SELECT graft_bitmap_merge(grp) FROM bitmap_sql_in").collect())
    assert(e.getMessage.contains("binary bitmap"))
  }
  test("incrementalDistinct: merged totals equal recompute, sides stitch") {
    // base: g1 {1,2,3}, g2 {10}; delta: g1 {3,4} (one seen, one new),
    // g3 {7} (delta-only group)
    val base = Seq(("g1", 1L), ("g1", 2L), ("g1", 3L), ("g2", 10L))
      .toDF("g", "id")
    val delta = Seq(("g1", 3L), ("g1", 4L), ("g3", 7L)).toDF("g", "id")
    val got = Bitmaps.incrementalDistinct(base, delta, col("g"), col("id"))
      .as[(String, Long, Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      ("g1", 3L, 2L, 4L, 1L, 1L),   // 3 standing, 2 in batch, 1 overlap
      ("g2", 1L, 0L, 1L, 0L, 0L),   // untouched by the batch
      ("g3", 0L, 1L, 1L, 0L, 1L)))  // born in the batch
  }
}
