package graft.sim

import graft.SparkSpec

/** s6 product-quantization ANN: structural contract + retrieval quality
  * against the exact brute-force baseline (s1). The value-exact check
  * (codebooks, codes, ADC scores) is the DuckDB oracle the driver runs;
  * here we pin determinism and that the compressed index still retrieves. */
class PqSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  test("PQ emits TopK ADC-ranked neighbors per query, deterministically") {
    val run = () => graft.SparkEntry.queries("s6_ann_pq")(spark, sf)
      .collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"),
        r.getAs[Long]("adc_e12"), r.getAs[Long]("rank")))
    val a = run()
    assert(a.length ===
      SimilarityQueries.NumQueries * SimilarityQueries.TopK)
    a.groupBy(_._1).foreach { case (_, rows) =>
      assert(rows.map(_._4).sorted.toSeq === (1L to SimilarityQueries.TopK))
      // ADC scores non-decreasing in rank
      assert(rows.sortBy(_._4).map(_._3).sliding(2)
        .forall(p => p.length < 2 || p(0) <= p(1)))
    }
    assert(a.forall { case (q, n, _, _) => q != n })
    assert(run().toSeq === a.toSeq, "repeat run must be bit-identical")
  }

  test("IVFADC (s7) is deterministic and scores only probed-cell members") {
    val run = () => graft.SparkEntry.queries("s7_ann_ivfadc")(spark, sf)
      .collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"),
        r.getAs[Long]("adc_e12"), r.getAs[Long]("rank")))
    val a = run()
    assert(a.nonEmpty && a.forall { case (q, n, d, _) => q != n && d >= 0 })
    // every neighbor must live in one of its query's probed cells
    val cells = graft.SparkEntry.queries("s4_kmeans_embeddings")(spark, sf)
      .collect().map(r => r.getAs[Long]("vec_id") -> r.getAs[Long]("cluster"))
      .toMap
    a.groupBy(_._1).foreach { case (q, rows) =>
      val probed = rows.map(r => cells(r._2)).toSet
      assert(probed.size <= SimilarityQueries.IvfNprobe,
        s"query $q drew neighbors from ${probed.size} cells > nprobe")
    }
    assert(run().toSeq === a.toSeq, "repeat run must be bit-identical")
  }

  test("PQ top-k overlaps the exact top-k (compression keeps signal)") {
    def topSets(name: String) =
      graft.SparkEntry.queries(name)(spark, sf).collect()
        .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id")))
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val exact = topSets("s1_ann_bruteforce")
    val pq = topSets("s6_ann_pq")
    val recalls = exact.keys.toSeq.map { q =>
      (pq(q) & exact(q)).size.toDouble / exact(q).size
    }
    val mean = recalls.sum / recalls.size
    // 8x4-bit codes over 64 dims are a coarse sketch; the point is the
    // shortlist beats chance by a wide margin (chance ~ TopK/n = 2%)
    assert(mean >= 0.2, s"mean PQ recall@10 too low: $mean")
  }
}
