package graft.core

import graft.SparkSpec
import graft.matcher.Labels
import graft.modeler.{ModelerQueries, Ontology}
import graft.functions.{Transformation, Transformations}

class OctopusSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  test("octopus trains both legs, persists, predicts, and reloads") {
    val work = java.nio.file.Files.createTempDirectory("graft-octopus").toString
    val oct = new Octopus(Ontology.tpch,
      Seq(ModelerQueries.knownOrderModel), work)
    assert(oct.trainState === Octopus.Untrained)
    assert(oct.train(spark, sf) === Octopus.Complete)
    // persisted artifacts exist (M9)
    assert(java.nio.file.Files.exists(java.nio.file.Paths.get(s"$work/pipeline")))
    assert(java.nio.file.Files.exists(java.nio.file.Paths.get(s"$work/alignment.json")))
    // retrain with unchanged inputs is a cached no-op
    assert(oct.train(spark, sf) === Octopus.Complete)
    val pred = oct.predict(spark, sf, Labels.holdoutTables)
    assert(pred.columnPredictions.count() === Labels.holdout.size.toLong)
    assert(pred.suggestions.nonEmpty)
    assert(pred.suggestions.forall(_.model.isConnected))
    // reload path
    assert(oct.reload().isDefined)
  }

  test("transformations rewrite only the targeted semantic class") {
    import spark.implicits._
    val df = Seq(("phone", "(02) 1234"), ("name", "(02) 1234"))
      .toDF("label", "value")
    val out = Transformations.apply(df, "value", "label",
      Seq(Transformation("phone", "[^0-9]", "")))
      .collect().map(r => (r.getString(0), r.getString(1))).toMap
    assert(out("phone") === "021234")
    assert(out("name") === "(02) 1234")
  }
}
