package graft.matcher

import graft.SparkSpec

/** Guards the m6 oracle's pinned prediction list: the pin must equal the
  * live model's deterministic output at the driver's correctness scale
  * factor (sf0.01), so any feature/model change that shifts predictions
  * fails here (with a refresh hint) before it fails the driver's
  * DuckDB compare. */
class PredictionPinSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.01"

  test("pinned sf0.01 predictions match the live model") {
    val live = SemanticTypeClassifier.predict(
        MatcherSession.model(spark, sf),
        MatcherSession.holdoutFeatures(spark, sf))
      .select("col_name", "predicted_label")
      .collect()
      .map(r => r.getString(0) -> r.getString(1))
      .sortBy(_._1)
    assert(live.toSeq === EvalQueries.PinnedPredictionsSf001,
      "matcher predictions drifted — refresh EvalQueries.PinnedPredictionsSf001")
  }
}
