package graft.matcher

import org.apache.spark.sql.functions._

import graft.QueryDef
import graft.functions.StringFunctions

/** Evaluation + pairwise-feature queries (reference
  * eval/metrics/EvaluationMetrics.scala:7-19, ConfusionMatrix.scala;
  * pairwise: AttributePairFeatureExtractor.scala:33-148). */
object EvalQueries {

  /** m4's deterministic holdout predictions at the driver's correctness
    * scale factor (sf0.01) — pinned so the m6 confusion/P/R/F1 arithmetic
    * has a value-exact DuckDB oracle (the RF itself is not
    * SQL-expressible; its output at a fixed sf is a deterministic,
    * spec-asserted constant). PredictionPinSpec regenerates these from
    * the live model and fails on drift, so a feature change can't
    * silently invalidate the pin. */
  val PinnedPredictionsSf001: Seq[(String, String)] = Seq(
    "events.event_id" -> "identifier",
    "events.event_type" -> "category",
    "events.props" -> "category",
    "events.ts" -> "date",
    "events.user_id" -> "identifier",
    "events.value" -> "money",
    "nation.n_name" -> "name",
    "nation.n_nationkey" -> "identifier",
    "nation.n_regionkey" -> "identifier",
    "region.r_name" -> "name",
    "region.r_regionkey" -> "identifier")

  val defs: Map[String, QueryDef] = Map(

    // ---- m6: confusion matrix + per-class precision/recall/F1 (M10)
    "m6_matcher_eval" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        val expected = Labels.holdout
          .map { case (t, c, l) => (s"$t.$c", l) }.toDF("col_name", "expected")
        val preds = SemanticTypeClassifier.predict(
            MatcherSession.model(s, dir),
            MatcherSession.holdoutFeatures(s, dir))
          .join(expected, "col_name")
        val byClass = preds.groupBy(col("expected").as("label"))
          .agg(
            count(lit(1)).as("n"),
            sum(when(col("predicted_label") === col("expected"), 1L)
              .otherwise(0L)).as("tp"))
        val predCounts = preds.groupBy(col("predicted_label").as("label"))
          .agg(count(lit(1)).as("n_predicted"))
        byClass.join(predCounts, Seq("label"), "full")
          .select(
            col("label"),
            coalesce(col("n"), lit(0L)).as("n_actual"),
            coalesce(col("n_predicted"), lit(0L)).as("n_predicted"),
            coalesce(col("tp"), lit(0L)).as("tp"),
            round(coalesce(col("tp") / col("n_predicted"), lit(0.0)), 6)
              .as("precision"),
            round(coalesce(col("tp") / col("n"), lit(0.0)), 6).as("recall"))
          .withColumn("f1", round(
            when(col("precision") + col("recall") > 0,
              lit(2.0) * col("precision") * col("recall") /
                (col("precision") + col("recall"))).otherwise(0.0), 6))
          .orderBy(col("label"))
      },
      Some {
        val predVals = PinnedPredictionsSf001
          .map { case (c, l) => s"('$c', '$l')" }.mkString(",\n      ")
        val expVals = Labels.holdout
          .map { case (t, c, l) => s"('$t.$c', '$l')" }.mkString(",\n      ")
        s"""WITH pred(col_name, predicted_label) AS (VALUES
      $predVals
        ), expd(col_name, expected) AS (VALUES
      $expVals
        ), j AS (
          SELECT expd.col_name, expected, predicted_label
          FROM expd JOIN pred ON expd.col_name = pred.col_name
        ), byclass AS (
          SELECT expected AS label, count(*) AS n,
            sum(CASE WHEN predicted_label = expected THEN 1 ELSE 0 END) AS tp
          FROM j GROUP BY 1
        ), pc AS (
          SELECT predicted_label AS label, count(*) AS n_predicted
          FROM j GROUP BY 1
        ), pr AS (
          SELECT coalesce(byclass.label, pc.label) AS label,
            coalesce(n, 0) AS n_actual,
            coalesce(n_predicted, 0) AS n_predicted,
            coalesce(tp, 0) AS tp,
            round(coalesce(CAST(tp AS DOUBLE) / n_predicted, 0.0), 6) AS precision,
            round(coalesce(CAST(tp AS DOUBLE) / n, 0.0), 6) AS recall
          FROM byclass FULL JOIN pc ON byclass.label = pc.label
        )
        SELECT label, CAST(n_actual AS BIGINT) AS n_actual,
          CAST(n_predicted AS BIGINT) AS n_predicted,
          CAST(tp AS BIGINT) AS tp, precision, recall,
          round(CASE WHEN precision + recall > 0
            THEN 2.0 * precision * recall / (precision + recall)
            ELSE 0.0 END, 6) AS f1
        FROM pr ORDER BY label"""
      }),

    // ---- m7: pairwise attribute features over held-out column pairs
    //      (§2.5, reference AttributePairFeatureExtractor.scala:33-127):
    //      uniqueness-ratio diff, string-equality one-hot, the 7
    //      type-equality one-hots over the A19 inferred types, and the
    //      name-distance battery (WordNet extractors excluded with
    //      J4/A25/F5 — config-gated absence, see COVERAGE.md).
    "m7_pairwise_features" -> QueryDef(
      (s, dir) => {
        val prof = MatcherSession.holdoutFeatures(s, dir)
          .select(col("col_name"), col("prop_unique_vals"))
        val types = graft.profile.ColumnProfiler.inferredTypeOneHots(
          FeatureMatrix.sampledMelt(s, dir, Labels.holdoutTables))
          .select(col("col_name") +: TypeEqKeys.map(k =>
            col(s"inferred_type_$k")): _*)
        val joined = prof.join(types, "col_name")
        val short = (c: org.apache.spark.sql.Column) => substring_index(c, ".", -1)
        val a = joined.select(joined.columns.map(c => col(c).as(s"a_$c")): _*)
        val b = joined.select(joined.columns.map(c => col(c).as(s"b_$c")): _*)
        val bothTypes = TypeEqKeys.map(k =>
          (col(s"a_inferred_type_$k") * col(s"b_inferred_type_$k"))
            .cast("long").as(s"both_$k"))
        a.join(b, col("a_col_name") < col("b_col_name"))
          .select(Seq(
            col("a_col_name"), col("b_col_name"),
            round(abs(col("a_prop_unique_vals") - col("b_prop_unique_vals")), 6)
              .as("unique_vals_diff"),
            when(lower(short(col("a_col_name"))) ===
              lower(short(col("b_col_name"))), 1L).otherwise(0L)
              .as("string_equality")) ++ bothTypes ++ Seq(
            levenshtein(lower(short(col("a_col_name"))),
              lower(short(col("b_col_name")))).cast("long").as("lev_dist"),
            round(StringFunctions.nwUdf(short(col("a_col_name")),
              short(col("b_col_name"))), 6).as("nw_dist"),
            round(StringFunctions.jaroUdf(short(col("a_col_name")),
              short(col("b_col_name"))), 6).as("jaro_sim"),
            round(StringFunctions.ngramUdf(short(col("a_col_name")),
              short(col("b_col_name"))), 6).as("ngram_dist")): _*)
          .orderBy(col("a_col_name"), col("b_col_name"))
      },
      None)
  )

  /** Type-equality one-hot keys (reference
    * DataTypeEqualityFeatureExtractor, AttributePairFeatureExtractor
    * .scala:50-75 — note: no `long` there). */
  val TypeEqKeys: Seq[String] = Seq(
    "float", "integer", "boolean", "date", "time", "datetime", "string")
}
