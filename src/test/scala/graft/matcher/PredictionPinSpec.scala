package graft.matcher

import graft.SparkSpec

/** Guards every pinned matcher oracle (m4/m6, m7, m8): each pin must
  * equal the live pipeline's deterministic output at the driver's
  * correctness scale factor (sf0.01), so any feature/model change that
  * shifts outputs fails here (with a refresh hint) before it fails the
  * driver's DuckDB compare. */
class PredictionPinSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.01"

  test("pinned sf0.01 predictions (m4/m6) match the live model") {
    val live = SemanticTypeClassifier.predict(
        MatcherSession.model(spark, sf),
        MatcherSession.holdoutFeatures(spark, sf))
      .select("col_name", "predicted_label", "confidence")
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getDouble(2)))
      .sortBy(_._1)
    assert(live.toSeq === EvalQueries.PinnedM4Sf001,
      "matcher predictions drifted — refresh EvalQueries.PinnedM4Sf001")
  }

  test("pinned sf0.01 bagged predictions (m8) match the live pipeline") {
    val live = graft.SparkEntry.queries("m8_bagged_predictions")(spark, sf)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getDouble(2), r.getLong(3)))
      .sortBy(_._1)
    assert(live.toSeq === MatcherQueries.PinnedM8Sf001,
      "bagged predictions drifted — refresh MatcherQueries.PinnedM8Sf001")
  }

  test("pinned sf0.01 learned-type candidates (g4) match the live query") {
    val live = graft.SparkEntry.queries("g4_learned_types")(spark, sf)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2),
        r.getString(3), r.getDouble(4)))
      .sortBy(t => (t._1, t._2))
    assert(live.toSeq === graft.modeler.ModelerQueries.PinnedG4Sf001,
      "learned-type candidates drifted — refresh ModelerQueries.PinnedG4Sf001")
  }

  test("pinned sf0.01 pairwise features (m7) match the live query") {
    val live = graft.SparkEntry.queries("m7_pairwise_features")(spark, sf)
      .collect()
      .map { r =>
        (r.getString(0), r.getString(1), r.getDouble(2), r.getLong(3),
          (4 to 10).map(r.getLong).toSeq,
          r.getLong(11), r.getDouble(12), r.getDouble(13), r.getDouble(14))
      }
      .sortBy(t => (t._1, t._2))
    assert(live.toSeq === EvalQueries.PinnedM7Sf001,
      "pairwise features drifted — refresh EvalQueries.PinnedM7Sf001")
  }
}
