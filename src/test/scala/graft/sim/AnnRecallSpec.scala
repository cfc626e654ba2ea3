package graft.sim

import graft.SparkSpec

/** s9 ANN recall report: the numbers must equal a driver-side
  * recomputation from the graded queries' own outputs (the oracle
  * already proves DuckDB parity; this pins the SEMANTICS — hits are
  * set-intersections on (query_id, neighbor_id), recall is exact
  * integer micro over the truth count). */
class AnnRecallSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  private def pairs(name: String): Set[(Long, Long)] =
    graft.SparkEntry.queries(name)(spark, sf).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id")))
      .toSet

  test("s9 recall equals a driver-side recount of the graded queries") {
    val truth = pairs("s1_ann_bruteforce")
    val expect = Map("lsh" -> pairs("s2_ann_lsh"), "ivf" -> pairs("s3_ann_ivf"))
    val rows = graft.SparkEntry.queries("s9_ann_recall")(spark, sf).collect()
    assert(rows.map(_.getAs[String]("method")).toSet === Set("lsh", "ivf"))
    for (r <- rows) {
      val m = r.getAs[String]("method")
      val got = expect(m)
      assert(r.getAs[Long]("n_truth") === truth.size.toLong)
      assert(r.getAs[Long]("n_returned") === got.size.toLong)
      val hits = (got intersect truth).size.toLong
      assert(r.getAs[Long]("n_hits") === hits, s"$m hit recount")
      assert(r.getAs[Long]("recall_micro") ===
        hits * 1000000L / truth.size, s"$m recall formula")
      assert(r.getAs[Long]("n_hits") <=
        math.min(r.getAs[Long]("n_returned"), r.getAs[Long]("n_truth")))
    }
    // the truth set is the full NumQueries x TopK grid at this sf
    assert(truth.size ===
      SimilarityQueries.NumQueries * SimilarityQueries.TopK)
  }

  test("s12 pq recall equals a driver-side recount of the coded queries") {
    val truth = pairs("s1_ann_bruteforce")
    val expect = Map("pq" -> pairs("s6_ann_pq"),
      "ivfadc" -> pairs("s7_ann_ivfadc"))
    val rows = graft.SparkEntry.queries("s12_pq_recall")(spark, sf).collect()
    assert(rows.map(_.getAs[String]("method")).toSet ===
      Set("pq", "ivfadc"))
    for (r <- rows) {
      val m = r.getAs[String]("method")
      val got = expect(m)
      assert(r.getAs[Long]("n_truth") === truth.size.toLong)
      assert(r.getAs[Long]("n_returned") === got.size.toLong)
      val hits = (got intersect truth).size.toLong
      assert(r.getAs[Long]("n_hits") === hits, s"$m hit recount")
      assert(r.getAs[Long]("recall_micro") ===
        hits * 1000000L / truth.size, s"$m recall formula")
      assert(r.getAs[Long]("n_hits") > 0L,
        s"$m finds nothing — a dead index would grade 0 recall")
    }
  }
}
