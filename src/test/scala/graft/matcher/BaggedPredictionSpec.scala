package graft.matcher

import graft.SparkSpec

class BaggedPredictionSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  test("bagged prediction covers every holdout column with averaged scores") {
    val out = MatcherQueries.defs("m8_bagged_predictions").fn(spark, sf).collect()
    assert(out.length === Labels.holdout.size)
    // reference testBagging contract: every column yields exactly
    // numBags bags (short columns are replication-filled to bagSize)
    assert(out.forall { r =>
      r.getAs[Long]("n_bags") === Resampler.DefaultNumBags.toLong
    })
    assert(out.forall { r =>
      val c = r.getAs[Double]("confidence"); c >= 0.0 && c <= 1.0
    })
    // bag-averaged predictions should broadly agree with the whole-column
    // path on the easy classes
    val expected = Labels.holdout.map { case (t, c, l) => s"$t.$c" -> l }.toMap
    val acc = out.count(r => expected(r.getAs[String]("col_name")) ==
      r.getAs[String]("predicted_label")).toDouble / out.length
    info(s"bagged holdout accuracy: $acc")
    assert(acc >= 0.6)
  }

  test("bagged prediction is deterministic") {
    def run() = MatcherQueries.defs("m8_bagged_predictions")
      .fn(spark, sf).collect().map(_.toSeq).toSeq
    assert(run() === run())
  }
}
