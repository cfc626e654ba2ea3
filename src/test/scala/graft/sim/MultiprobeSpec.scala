package graft.sim

import graft.SparkSpec

/** s15 multi-probe recall: the lsh_band row must grade EXACTLY the
  * candidate set s2 ranks (same index, same keys, no flips), and the
  * multi-probe row can only widen it — more candidates, recall at
  * least as high, and every returned set stays TopK-bounded. */
class MultiprobeSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  private def pairs(name: String): Set[(Long, Long)] =
    graft.SparkEntry.queries(name)(spark, sf).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id")))
      .toSet

  test("s15: band row == s2's grading; multiprobe only widens") {
    val truth = pairs("s1_ann_bruteforce")
    val s2 = pairs("s2_ann_lsh")
    val rows = graft.SparkEntry.queries("s15_multiprobe_recall")(spark, sf)
      .collect().map(r => r.getAs[String]("method") -> r).toMap
    assert(rows.keySet === Set("lsh_band", "lsh_multiprobe"))
    val band = rows("lsh_band")
    assert(band.getAs[Long]("n_truth") === truth.size.toLong)
    assert(band.getAs[Long]("n_returned") === s2.size.toLong,
      "band method returns exactly s2's top-k")
    assert(band.getAs[Long]("n_hits") === (s2 intersect truth).size.toLong)
    assert(band.getAs[Long]("recall_micro") ===
      (s2 intersect truth).size.toLong * 1000000L / truth.size)
    val multi = rows("lsh_multiprobe")
    assert(multi.getAs[Long]("n_cand_pairs") >=
      band.getAs[Long]("n_cand_pairs"), "probes only add candidates")
    assert(multi.getAs[Long]("recall_micro") >=
      band.getAs[Long]("recall_micro"),
      "a superset of candidates cannot lose exact-reranked recall")
    for (r <- rows.values) {
      assert(r.getAs[Long]("n_returned") <=
        (SimilarityQueries.NumQueries * SimilarityQueries.TopK).toLong)
      assert(r.getAs[Long]("n_hits") <= r.getAs[Long]("n_returned"))
    }
  }
}
