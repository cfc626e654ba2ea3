package graft.matcher

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Cost-matrix training knob (the reference's stubbed CostMatrix
  * strategy, ClassImbalanceResampler.scala:409-411): per-class weights
  * from [[FeaturesConfig.classWeights]] drive the RF's `weightCol`. */
class WeightedTrainingSpec extends SparkSpec {

  /** A one-feature config so the training frame can be synthesized. */
  private val feature = FeaturesConfig.SingleFeatures.head
  private def cfg(weights: Map[String, String]) = FeaturesConfig(
    Set(feature), Set.empty,
    if (weights.isEmpty) Map.empty else Map("class-weights" -> weights))

  /** The contested value 0.5 carries 2 a-rows and 1 b-row — a leaf no
    * split can purify (identical feature value, mixed labels). The
    * unweighted majority there is a (2:1); with b upweighted 10x the
    * leaf's weighted mass is b (10:2). A split-position fixture would
    * NOT work: weights move leaf distributions, not the candidate
    * split thresholds between well-separated classes. */
  private def trainFrame = {
    import spark.implicits._
    (Seq(0.00, 0.05, 0.10).zipWithIndex
      .map { case (x, i) => (s"t.a$i", x, "a") } ++
     Seq(("t.a3", 0.5, "a"), ("t.a4", 0.5, "a"), ("t.b0", 0.5, "b")) ++
     Seq(0.95, 1.00).zipWithIndex
      .map { case (x, i) => (s"t.b${i + 1}", x, "b") })
      .toDF("col_name", feature, "label")
  }

  private def borderline = {
    import spark.implicits._
    Seq(("t.q", 0.5)).toDF("col_name", feature)
  }

  test("class weights shift a borderline prediction (cost-sensitive training)") {
    val plain = SemanticTypeClassifier.train(trainFrame, cfg(Map.empty))
    val up = SemanticTypeClassifier.train(trainFrame,
      cfg(Map("b" -> "10.0")))
    def predicted(m: org.apache.spark.ml.PipelineModel): String =
      SemanticTypeClassifier.predict(m, borderline)
        .select("predicted_label").head().getString(0)
    assert(predicted(plain) === "a",
      "fixture invalid: unweighted model should side with the majority")
    assert(predicted(up) === "b",
      "10x class weight failed to flip the borderline column")
  }

  test("empty weights are bit-identical to the unweighted path") {
    val a = SemanticTypeClassifier.train(trainFrame, cfg(Map.empty))
    val b = SemanticTypeClassifier.train(trainFrame,
      FeaturesConfig(Set(feature), Set.empty, Map.empty))
    val fa = SemanticTypeClassifier.predict(a, borderline)
      .select("confidence").head().getDouble(0)
    val fb = SemanticTypeClassifier.predict(b, borderline)
      .select("confidence").head().getDouble(0)
    assert(fa === fb)
  }

  test("class weights round-trip through the persisted config (M9)") {
    val c = FeaturesConfig(Set(feature), Set("knn_name"),
      Map("class-weights" -> Map("money" -> "2.5", "text" -> "0.5"),
        FeaturesConfig.KnnGroup -> Map("num-neighbours" -> "3")))
    assert(c.classWeights === Map("money" -> 2.5, "text" -> 0.5))
    val back = FeaturesConfig.fromJson(c.toJson)
    assert(back.classWeights === c.classWeights,
      "classWeights lost in the features.json round-trip")
    assert(back.knnNeighbours === 3)
    // unparseable weights are ignored, not fatal
    assert(FeaturesConfig(Set(feature), Set.empty,
      Map("class_weights" -> Map("a" -> "not-a-number", "b" -> "2")))
      .classWeights === Map("b" -> 2.0))
  }
}
