package graft.text

import graft.SparkSpec

/** t19 label-noise audit: its per-source counts must reconcile exactly
  * with t3's confusion matrix (both ride the one shared language-ID
  * kernel), and each share must be the documented integer-micro
  * truncation. */
class LangLabelNoiseSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  test("t19 totals reconcile with t3's confusion matrix") {
    val t3 = graft.SparkEntry.queries("t3_lang_id")(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val rows = graft.SparkEntry.queries("t19_lang_label_noise")(spark, sf)
      .collect()
    val nDocs = rows.map(_.getAs[Long]("n_docs")).sum
    val nUnd = rows.map(_.getAs[Long]("n_und")).sum
    val nDis = rows.map(_.getAs[Long]("n_disagree")).sum
    assert(nDocs === t3.values.sum, "every doc is audited")
    assert(nUnd === t3.collect {
      case ((_, p), n) if p == "und" => n }.sum, "und total matches t3")
    assert(nDis === t3.collect {
      case ((l, p), n) if p != "und" && l != p => n }.sum,
      "disagreement total matches t3's off-diagonal")
    for (r <- rows) {
      val (d, u, x) = (r.getAs[Long]("n_docs"), r.getAs[Long]("n_und"),
        r.getAs[Long]("n_disagree"))
      assert(u + x <= d)
      assert(r.getAs[Long]("und_share_micro") === u * 1000000L / d)
      if (d > u)
        assert(r.getAs[Long]("disagree_share_micro") ===
          x * 1000000L / (d - u))
    }
    assert(rows.length > 1, "fixture has multiple sources")
  }
}
