package graft.sim

import graft.SparkSpec

/** s8 kNN graph: structural contract over the shared d5/d9 candidate
  * checkpoint. Value-exactness is the DuckDB oracle's job (brute twin
  * under the NearDupBruteMax gate); determinism rides on the pair
  * table's (d5's oracle). */
class KnnGraphSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  test("each vector gets at most K neighbors, ranked by descending " +
      "cosine with contiguous ranks, never itself") {
    val rows = graft.SparkEntry.queries("s8_knn_graph")(spark, sf)
      .collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("neighbor_id"),
        r.getAs[Double]("cos"), r.getAs[Long]("rank")))
    assert(rows.nonEmpty)
    assert(rows.forall { case (v, nb, _, _) => v != nb })
    val byVec = rows.groupBy(_._1)
    for ((v, es) <- byVec) {
      val sorted = es.sortBy(_._4)
      assert(sorted.length <= SimilarityQueries.KnnGraphK, s"vec $v")
      assert(sorted.map(_._4).toSeq === (1L to sorted.length).toSeq,
        s"vec $v ranks not contiguous")
      val cs = sorted.map(_._3).toSeq
      assert(cs === cs.sorted.reverse, s"vec $v not cosine-descending")
    }
    // under the brute gate (sf0.001 << NearDupBruteMax) every vector
    // has candidates, so the graph is total
    val n = graft.sources.Tables.table(spark, sf, "embeddings").count()
    assert(byVec.size.toLong === n, "graph must be total at brute scale")
  }

  test("the graph edge set agrees with the pair checkpoint's top-K") {
    // independent recomputation from the shared pair table
    val p = graft.dedup.DedupQueries.embeddingPairs(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val adj = (p.map(t => (t._1, (t._2, t._3))) ++
        p.map(t => (t._2, (t._1, t._3))))
      .groupBy(_._1)
      .map { case (v, es) =>
        v -> es.map(_._2).sortBy { case (nb, c) => (-c, nb) }
          .take(SimilarityQueries.KnnGraphK).toSeq }
    val got = graft.SparkEntry.queries("s8_knn_graph")(spark, sf)
      .collect()
      .groupBy(_.getAs[Long]("vec_id"))
      .map { case (v, rs) =>
        v -> rs.sortBy(_.getAs[Long]("rank"))
          .map(r => (r.getAs[Long]("neighbor_id"), r.getAs[Double]("cos")))
          .toSeq }
    assert(got === adj)
  }
}
