package graft.matcher

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.ml.PipelineModel
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Per-JVM cache of trained matcher artifacts keyed by sf directory —
  * the reference caches trained models exactly the same way (state
  * machine + modified-date checks, OctopusInterface.checkTraining
  * :81-110). Several harness queries (m4 predictions, m6 eval,
  * importances) share one training run instead of re-melting and
  * re-fitting per query; feature frames are persisted so the heavy
  * profile aggregation runs once. */
object MatcherSession {

  private val models = new ConcurrentHashMap[String, PipelineModel]()
  private val features = new ConcurrentHashMap[(String, String), DataFrame]()

  def trainLabelsDf(s: SparkSession): DataFrame = {
    import s.implicits._
    Labels.train.map { case (t, c, l) => (s"$t.$c", l) }.toDF("col_name", "label")
  }

  /** Train-table features (persisted, computed once per dir). */
  def trainFeatures(s: SparkSession, dir: String): DataFrame =
    features.computeIfAbsent((dir, "train"), _ =>
      FeatureMatrix.features(s, dir, Labels.trainTables).persist())

  /** Holdout-table features (persisted, computed once per dir). */
  def holdoutFeatures(s: SparkSession, dir: String): DataFrame =
    features.computeIfAbsent((dir, "holdout"), _ =>
      FeatureMatrix.features(s, dir, Labels.holdoutTables).persist())

  /** Trained pipeline for a dir (trained once per JVM). */
  def model(s: SparkSession, dir: String): PipelineModel =
    models.computeIfAbsent(dir, _ =>
      SemanticTypeClassifier.train(
        trainFeatures(s, dir).join(trainLabelsDf(s), "col_name")))
}
