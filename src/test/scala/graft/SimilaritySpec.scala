package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.ops.Similarity

/** ANN-layer specs beyond the DuckDB oracles: k-means refinement
  * properties and multi-probe assignment mechanics on the generated
  * embeddings fixture.
  */
class SimilaritySpec extends SparkSpec {

  private lazy val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")

  /** Mean best-centroid cosine over the corpus — the (negated) spherical
    * k-means objective.
    */
  private def meanBestCos(cents: DataFrame): Double =
    Similarity.ivfAssignTo(emb, cents)
      .join(broadcast(cents), col("cell") === col("cent_id"))
      .select(avg(Similarity.cosine(
        col("vec"), col("cvec"), col("norm"), col("cnorm"))))
      .head().getDouble(0)

  test("kmeans refinement does not decrease the spherical objective") {
    val seeds = Similarity.kmeansCentroids(emb, k = 8, iters = 0)
    val refined = Similarity.kmeansCentroids(emb, k = 8, iters = 2)
    assert(refined.count() <= 8 && refined.count() > 0)
    val before = meanBestCos(seeds)
    val after = meanBestCos(refined)
    assert(after >= before - 1e-9, s"objective regressed: $before -> $after")
  }

  test("kmeans centroids keep the embedding dimensionality") {
    val dims = Similarity.kmeansCentroids(emb, k = 4, iters = 1)
      .select(size(col("cvec"))).distinct().collect().map(_.getInt(0)).toSet
    assert(dims == Set(64))
  }

  test("multi-probe assignment emits nProbe distinct cells per vector") {
    val probes = Similarity.ivfAssign(emb, nCentroids = 16, nProbe = 3)
      .groupBy("vec_id")
      .agg(countDistinct("cell").as("n"))
      .select(min("n"), max("n")).head()
    assert(probes.getLong(0) == 3L && probes.getLong(1) == 3L)
  }

  test("multi-probe top-k recall >= single-probe (probes can only add candidates)") {
    val single = Similarity.ivfTopK(emb).select("query_id", "neighbor_id", "cos_sim")
    val multi = Similarity.ivfTopKMultiProbe(emb)
      .select("query_id", "neighbor_id", "cos_sim")
    val exact = Similarity.bruteForceTopK(emb, k = 3)
      .select("query_id", "neighbor_id")
    def recall(approx: DataFrame): Double =
      approx.join(exact, Seq("query_id", "neighbor_id")).count().toDouble /
        exact.count()
    assert(recall(multi) >= recall(single) - 1e-12)
  }
}
