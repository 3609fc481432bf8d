package graft

import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions

/** Tests for the codegen'd vector expressions: parity with the higher-order
  * formulation they replaced (bit-identical accumulation), null handling,
  * SQL registration, and both eval paths.
  */
class VectorExpressionsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    .withColumn("vec", transform(col("embedding"), x => x.cast("double")))

  test("dot/l2norm match the interpreted zip_with/aggregate formulation exactly") {
    val cmp = emb.select(
      VectorFunctions.dot(col("vec"), col("vec")).as("dot_native"),
      aggregate(zip_with(col("vec"), col("vec"), (x, y) => x * y),
        lit(0.0), (a, x) => a + x).as("dot_hof"),
      VectorFunctions.l2norm(col("vec")).as("norm_native"),
      sqrt(aggregate(col("vec"), lit(0.0), (a, x) => a + x * x)).as("norm_hof"))
    val bad = cmp.filter(
      col("dot_native") =!= col("dot_hof") || col("norm_native") =!= col("norm_hof"))
    assert(bad.count() == 0) // bit-identical, not just approximately equal
  }

  test("null inputs yield null (NullIntolerant)") {
    val df = Seq((Some(Seq(1.0, 2.0)), Option.empty[Seq[Double]]))
      .toDF("a", "b")
    val r = df.select(
      VectorFunctions.dot(col("a"), col("b")).as("d"),
      VectorFunctions.l2norm(col("b")).as("n")).head()
    assert(r.isNullAt(0) && r.isNullAt(1))
  }

  test("interpreted eval path agrees with codegen (small literal case)") {
    // force both: literal fold uses interpreted eval; projection uses codegen
    val df = Seq((Seq(1.0, 2.0, 3.0), Seq(4.0, 5.0, 6.0))).toDF("a", "b")
    val got = df.select(VectorFunctions.dot(col("a"), col("b"))).head().getDouble(0)
    assert(got == 32.0)
    assert(df.select(VectorFunctions.l2norm(col("a"))).head().getDouble(0)
      == math.sqrt(14.0))
  }

  test("SQL registration: graft_dot / graft_l2norm callable from spark.sql") {
    VectorFunctions.register(spark)
    emb.createOrReplaceTempView("emb_v")
    val r = spark.sql(
      """SELECT graft_dot(vec, vec) AS d, graft_l2norm(vec) AS n
        |FROM emb_v LIMIT 5""".stripMargin).collect()
    r.foreach { row =>
      assert(math.abs(row.getDouble(0) - row.getDouble(1) * row.getDouble(1)) < 1e-9)
    }
  }

  test("zorder: interleave is exact, order groups quadrants, SQL-callable") {
    import graft.functions.ZOrderKey
    // 0b101 even-spread + 0b011 odd-spread = 0b01'10'11 read pairwise
    assert(ZOrderKey.interleave(5L, 3L) == 27L)
    assert(ZOrderKey.spread(0xFFFFFFFFL) == 0x5555555555555555L)
    assert(ZOrderKey.interleave(0L, 0L) == 0L)
    // quadrant property: every key in the (x,y < 4) block sorts before
    // every key in the (x,y >= 4) block — what makes file min/max prune 2-D
    val lo = for (x <- 0L to 3L; y <- 0L to 3L) yield ZOrderKey.interleave(x, y)
    val hi = for (x <- 4L to 7L; y <- 4L to 7L) yield ZOrderKey.interleave(x, y)
    assert(lo.max < hi.min)
    // column API and codegen path agree with the scala reference impl
    val df = Seq((5L, 3L), (12345L, 67890L), (0L, 0L)).toDF("x", "y")
    val got = df.select(ZOrderKey.key(col("x"), col("y"))).as[Long].collect()
    assert(got.toSeq == Seq(27L, ZOrderKey.interleave(12345L, 67890L), 0L))
    VectorFunctions.register(spark)
    df.createOrReplaceTempView("zin")
    assert(spark.sql("SELECT graft_zorder(x, y) AS z FROM zin WHERE x = 5")
      .as[Long].head() == 27L)
  }

  test("mismatched lengths use the common prefix (zip semantics)") {
    val df = Seq((Seq(1.0, 2.0), Seq(3.0, 4.0, 5.0))).toDF("a", "b")
    assert(df.select(VectorFunctions.dot(col("a"), col("b"))).head().getDouble(0)
      == 11.0)
  }
}
