package graft.modeler

import graft.SparkSpec

/** Guards the g1/g3 pinned oracles: both outputs are data-independent
  * (derived from the tpch ontology and the flat column names alone), so
  * the pins must equal the live suggester at any sf — drift fails here
  * (with a refresh hint) before it fails the driver's DuckDB compare. */
class ModelerPinSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  test("g1 oracle pin matches the live suggester") {
    val live = graft.SparkEntry.queries("g1_semantic_models")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getString(3),
        r.getDouble(4), r.getDouble(5)))
      .sortBy(t => (t._1, t._2, t._3, t._4))
    assert(live.toSeq === ModelerQueries.PinnedSuggestions,
      "suggestions drifted — refresh ModelerQueries.PinnedSuggestions")
  }

  test("g3 oracle pin matches the live evaluation") {
    val live = graft.SparkEntry.queries("g3_model_evaluation")(spark, sf)
      .collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2), r.getDouble(3)))
    assert(live.toSeq === Seq(("top1", 1.0, 1.0, 1.0)),
      "evaluation drifted — refresh the g3 oracle in ModelerQueries")
  }
}
