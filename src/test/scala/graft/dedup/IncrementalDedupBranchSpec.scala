package graft.dedup

import graft.SparkSpec

/** r16: d14's engine gained join-side delta/index pruning (always on)
  * and a gated §3.2 Bloom prefilter over the pair stream's ids. The
  * gate is a file-size probe, so this forces the Bloom branch on the
  * small fixture corpus (gate 0) and pins row-set equality against the
  * default (filters-only) branch — false positives may re-admit rows,
  * the joins must drop them, the answers must be identical. */
class IncrementalDedupBranchSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  test("d14 bloom-prefilter branch equals the filters-only branch") {
    val plain = DedupQueries.incrementalDedup(spark, sf)
    val bloomed = DedupQueries.incrementalDedup(spark, sf,
      bloomGateBytes = 0L)
    assert(plain.exceptAll(bloomed).isEmpty &&
      bloomed.exceptAll(plain).isEmpty)
    // the delta channel must report every delta doc exactly once
    assert(bloomed.count() === bloomed.select("doc_id").distinct().count())
  }
}
