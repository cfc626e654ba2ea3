package graft.matcher

import org.apache.spark.sql.functions._

import graft.QueryDef
import graft.functions.StringFunctions

/** Evaluation + pairwise-feature queries (reference
  * eval/metrics/EvaluationMetrics.scala:7-19, ConfusionMatrix.scala;
  * pairwise: AttributePairFeatureExtractor.scala:33-148). */
object EvalQueries {

  /** m4's deterministic holdout predictions (with confidences) at the
    * driver's correctness scale factor (sf0.01) — pinned so m4 itself
    * and the m6 confusion/P/R/F1 arithmetic have value-exact DuckDB
    * regression oracles (the RF itself is not SQL-expressible; its
    * output at a fixed sf is a deterministic, spec-asserted constant).
    * PredictionPinSpec regenerates these from the live model and fails
    * on drift, so a feature change can't silently invalidate the pin. */
  val PinnedM4Sf001: Seq[(String, String, Double)] = Seq(
    ("events.event_id", "identifier", 0.492188),
    ("events.event_type", "category", 0.664063),
    ("events.props", "category", 0.335938),
    ("events.ts", "date", 0.359375),
    ("events.user_id", "identifier", 0.476563),
    ("events.value", "money", 0.460938),
    ("nation.n_name", "name", 0.619792),
    ("nation.n_nationkey", "identifier", 0.984375),
    ("nation.n_regionkey", "identifier", 0.664063),
    ("region.r_name", "name", 0.484375),
    ("region.r_regionkey", "identifier", 0.648438))

  val PinnedPredictionsSf001: Seq[(String, String)] =
    PinnedM4Sf001.map { case (c, l, _) => (c, l) }

  /** Type-equality one-hot keys (reference
    * DataTypeEqualityFeatureExtractor, AttributePairFeatureExtractor
    * .scala:50-75 — note: no `long` there). */
  val TypeEqKeys: Seq[String] = Seq(
    "float", "integer", "boolean", "date", "time", "datetime", "string")

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
        val a = joined.select(joined.columns.toIndexedSeq
          .map(c => col(c).as(s"a_$c")): _*)
        val b = joined.select(joined.columns.toIndexedSeq
          .map(c => col(c).as(s"b_$c")): _*)
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
      // pinned regression oracle at the driver's correctness sf (0.01),
      // guarded live-vs-pin by PredictionPinSpec. The ingredients are
      // independently value-oracled elsewhere: levenshtein in m1/m2,
      // the uniqueness profile in p1-p6, inferred types in p5; NW is
      // not SQL-expressible, which is what makes this a pin not a
      // re-derivation.
      Some {
        val vals = PinnedM7Sf001.map { case (a, b, ud, se, both, lev, nw, jaro, ng) =>
          s"('$a', '$b', $ud, $se, ${both.mkString(", ")}, $lev, $nw, $jaro, $ng)"
        }.mkString(",\n      ")
        val bothCols = TypeEqKeys.map(k => s"both_$k").mkString(", ")
        val bothCast = TypeEqKeys.map(k =>
          s"CAST(both_$k AS BIGINT) AS both_$k").mkString(",\n          ")
        s"""SELECT a_col_name, b_col_name,
          CAST(unique_vals_diff AS DOUBLE) AS unique_vals_diff,
          CAST(string_equality AS BIGINT) AS string_equality,
          $bothCast,
          CAST(lev_dist AS BIGINT) AS lev_dist,
          CAST(nw_dist AS DOUBLE) AS nw_dist,
          CAST(jaro_sim AS DOUBLE) AS jaro_sim,
          CAST(ngram_dist AS DOUBLE) AS ngram_dist
        FROM (VALUES
      $vals
        ) AS t(a_col_name, b_col_name, unique_vals_diff, string_equality,
          $bothCols, lev_dist, nw_dist, jaro_sim, ngram_dist)
        ORDER BY a_col_name, b_col_name"""
      })
  )

  /** m7's pinned output at sf0.01 (driver correctness scale), in output
    * column order: (a_col, b_col, unique_vals_diff, string_equality,
    * both_[float,integer,boolean,date,time,datetime,string], lev_dist,
    * nw_dist, jaro_sim, ngram_dist). Kept in sync with the live query by
    * PredictionPinSpec. */
  lazy val PinnedM7Sf001: Seq[(String, String, Double, Long, Seq[Long], Long, Double, Double, Double)] = Seq(
    ("events.event_id", "events.event_type", 0.99925, 0L, Seq(0L, 0L, 0L, 0L, 0L, 0L, 0L), 4L, 0.4, 0.783333, 0.545455),
    ("events.event_id", "events.props", 0.99, 0L, Seq(0L, 0L, 0L, 0L, 0L, 0L, 0L), 8L, 1.0, 0.0, 1.0),
    ("events.event_id", "events.ts", 0.0, 0L, Seq(0L, 0L, 0L, 0L, 0L, 0L, 0L), 7L, 0.875, 0.0, 1.0),
    ("events.event_id", "events.user_id", 0.9845, 0L, Seq(0L, 1L, 0L, 0L, 0L, 0L, 0L), 4L, 0.5, 0.690476, 0.818182),
    ("events.event_id", "events.value", 0.34675, 0L, Seq(0L, 0L, 0L, 0L, 0L, 0L, 0L), 7L, 0.875, 0.55, 1.0),
    ("events.event_id", "nation.n_name", 0.0, 0L, Seq(0L, 0L, 0L, 0L, 0L, 0L, 0L), 7L, 0.875, 0.361111, 1.0),
    ("events.event_id", "nation.n_nationkey", 0.0, 0L, Seq(0L, 1L, 0L, 0L, 0L, 0L, 0L), 10L, 0.909091, 0.537879, 1.0),
    ("events.event_id", "nation.n_regionkey", 0.8, 0L, Seq(0L, 1L, 0L, 0L, 0L, 0L, 0L), 10L, 0.909091, 0.496212, 1.0),
    ("events.event_id", "region.r_name", 0.0, 0L, Seq(0L, 0L, 0L, 0L, 0L, 0L, 0L), 7L, 0.875, 0.361111, 1.0),
    ("events.event_id", "region.r_regionkey", 0.0, 0L, Seq(0L, 1L, 0L, 0L, 0L, 0L, 0L), 10L, 0.909091, 0.454545, 1.0),
    ("events.event_type", "events.props", 0.00925, 0L, Seq(0L, 0L, 0L, 0L, 0L, 0L, 1L), 9L, 0.9, 0.0, 1.0),
    ("events.event_type", "events.ts", 0.99925, 0L, Seq(0L, 0L, 0L, 0L, 0L, 0L, 0L), 9L, 0.9, 0.533333, 1.0),
    ("events.event_type", "events.user_id", 0.01475, 0L, Seq(0L, 0L, 0L, 0L, 0L, 0L, 0L), 8L, 0.8, 0.495238, 1.0),
    ("events.event_type", "events.value", 0.6525, 0L, Seq(0L, 0L, 0L, 0L, 0L, 0L, 0L), 8L, 0.8, 0.366667, 1.0),
    ("events.event_type", "nation.n_name", 0.99925, 0L, Seq(0L, 0L, 0L, 0L, 0L, 0L, 1L), 7L, 0.7, 0.433333, 1.0),
    ("events.event_type", "nation.n_nationkey", 0.99925, 0L, Seq(0L, 0L, 0L, 0L, 0L, 0L, 0L), 9L, 0.818182, 0.518182, 1.0),
    ("events.event_type", "nation.n_regionkey", 0.19925, 0L, Seq(0L, 0L, 0L, 0L, 0L, 0L, 0L), 10L, 0.909091, 0.484848, 1.0),
    ("events.event_type", "region.r_name", 0.99925, 0L, Seq(0L, 0L, 0L, 0L, 0L, 0L, 1L), 8L, 0.8, 0.488889, 1.0),
    ("events.event_type", "region.r_regionkey", 0.99925, 0L, Seq(0L, 0L, 0L, 0L, 0L, 0L, 0L), 10L, 0.909091, 0.484848, 1.0),
    ("events.props", "events.ts", 0.99, 0L, Seq(0L, 0L, 0L, 0L, 0L, 0L, 0L), 4L, 0.8, 0.0, 1.0),
    ("events.props", "events.user_id", 0.0055, 0L, Seq(0L, 0L, 0L, 0L, 0L, 0L, 0L), 6L, 0.857143, 0.447619, 1.0),
    ("events.props", "events.value", 0.64325, 0L, Seq(0L, 0L, 0L, 0L, 0L, 0L, 0L), 5L, 1.0, 0.0, 1.0),
    ("events.props", "nation.n_name", 0.99, 0L, Seq(0L, 0L, 0L, 0L, 0L, 0L, 1L), 6L, 1.0, 0.0, 1.0),
    ("events.props", "nation.n_nationkey", 0.99, 0L, Seq(0L, 0L, 0L, 0L, 0L, 0L, 0L), 10L, 0.909091, 0.430303, 1.0),
    ("events.props", "nation.n_regionkey", 0.19, 0L, Seq(0L, 0L, 0L, 0L, 0L, 0L, 0L), 9L, 0.818182, 0.527273, 1.0),
    ("events.props", "region.r_name", 0.99, 0L, Seq(0L, 0L, 0L, 0L, 0L, 0L, 1L), 6L, 1.0, 0.455556, 1.0),
    ("events.props", "region.r_regionkey", 0.99, 0L, Seq(0L, 0L, 0L, 0L, 0L, 0L, 0L), 9L, 0.818182, 0.527273, 1.0),
    ("events.ts", "events.user_id", 0.9845, 0L, Seq(0L, 0L, 0L, 0L, 0L, 0L, 0L), 6L, 0.857143, 0.547619, 1.0),
    ("events.ts", "events.value", 0.34675, 0L, Seq(0L, 0L, 0L, 0L, 0L, 0L, 0L), 5L, 1.0, 0.0, 1.0),
    ("events.ts", "nation.n_name", 0.0, 0L, Seq(0L, 0L, 0L, 0L, 0L, 0L, 0L), 6L, 1.0, 0.0, 1.0),
    ("events.ts", "nation.n_nationkey", 0.0, 0L, Seq(0L, 0L, 0L, 0L, 0L, 0L, 0L), 10L, 0.909091, 0.530303, 1.0),
    ("events.ts", "nation.n_regionkey", 0.8, 0L, Seq(0L, 0L, 0L, 0L, 0L, 0L, 0L), 11L, 1.0, 0.0, 1.0),
    ("events.ts", "region.r_name", 0.0, 0L, Seq(0L, 0L, 0L, 0L, 0L, 0L, 0L), 6L, 1.0, 0.0, 1.0),
    ("events.ts", "region.r_regionkey", 0.0, 0L, Seq(0L, 0L, 0L, 0L, 0L, 0L, 0L), 11L, 1.0, 0.0, 1.0),
    ("events.user_id", "events.value", 0.63775, 0L, Seq(0L, 0L, 0L, 0L, 0L, 0L, 0L), 7L, 1.0, 0.447619, 1.0),
    ("events.user_id", "nation.n_name", 0.9845, 0L, Seq(0L, 0L, 0L, 0L, 0L, 0L, 0L), 7L, 1.0, 0.0, 1.0),
    ("events.user_id", "nation.n_nationkey", 0.9845, 0L, Seq(0L, 1L, 0L, 0L, 0L, 0L, 0L), 10L, 0.909091, 0.489177, 1.0),
    ("events.user_id", "nation.n_regionkey", 0.1845, 0L, Seq(0L, 1L, 0L, 0L, 0L, 0L, 0L), 10L, 0.909091, 0.561688, 1.0),
    ("events.user_id", "region.r_name", 0.9845, 0L, Seq(0L, 0L, 0L, 0L, 0L, 0L, 0L), 7L, 1.0, 0.0, 0.9),
    ("events.user_id", "region.r_regionkey", 0.9845, 0L, Seq(0L, 1L, 0L, 0L, 0L, 0L, 0L), 10L, 0.909091, 0.520022, 0.933333),
    ("events.value", "nation.n_name", 0.34675, 0L, Seq(0L, 0L, 0L, 0L, 0L, 0L, 0L), 5L, 0.833333, 0.577778, 1.0),
    ("events.value", "nation.n_nationkey", 0.34675, 0L, Seq(0L, 0L, 0L, 0L, 0L, 0L, 0L), 9L, 0.818182, 0.430303, 1.0),
    ("events.value", "nation.n_regionkey", 0.45325, 0L, Seq(0L, 0L, 0L, 0L, 0L, 0L, 0L), 10L, 0.909091, 0.430303, 1.0),
    ("events.value", "region.r_name", 0.34675, 0L, Seq(0L, 0L, 0L, 0L, 0L, 0L, 0L), 5L, 0.833333, 0.577778, 1.0),
    ("events.value", "region.r_regionkey", 0.34675, 0L, Seq(0L, 0L, 0L, 0L, 0L, 0L, 0L), 10L, 0.909091, 0.430303, 1.0),
    ("nation.n_name", "nation.n_nationkey", 0.0, 0L, Seq(0L, 0L, 0L, 0L, 0L, 0L, 0L), 6L, 0.545455, 0.762626, 0.75),
    ("nation.n_name", "nation.n_regionkey", 0.8, 0L, Seq(0L, 0L, 0L, 0L, 0L, 0L, 0L), 8L, 0.727273, 0.590909, 0.928571),
    ("nation.n_name", "region.r_name", 0.0, 0L, Seq(0L, 0L, 0L, 0L, 0L, 0L, 1L), 1L, 0.166667, 0.822222, 0.333333),
    ("nation.n_name", "region.r_regionkey", 0.0, 0L, Seq(0L, 0L, 0L, 0L, 0L, 0L, 0L), 9L, 0.818182, 0.505051, 1.0),
    ("nation.n_nationkey", "nation.n_regionkey", 0.8, 0L, Seq(0L, 1L, 0L, 0L, 0L, 0L, 0L), 3L, 0.272727, 0.818182, 0.571429),
    ("nation.n_nationkey", "region.r_name", 0.0, 0L, Seq(0L, 0L, 0L, 0L, 0L, 0L, 0L), 7L, 0.636364, 0.593434, 0.846154),
    ("nation.n_nationkey", "region.r_regionkey", 0.0, 0L, Seq(0L, 1L, 0L, 0L, 0L, 0L, 0L), 4L, 0.363636, 0.757576, 0.666667),
    ("nation.n_regionkey", "region.r_name", 0.8, 0L, Seq(0L, 0L, 0L, 0L, 0L, 0L, 0L), 9L, 0.818182, 0.593434, 1.0),
    ("nation.n_regionkey", "region.r_regionkey", 0.8, 0L, Seq(0L, 1L, 0L, 0L, 0L, 0L, 0L), 1L, 0.090909, 0.906061, 0.181818),
    ("region.r_name", "region.r_regionkey", 0.0, 0L, Seq(0L, 0L, 0L, 0L, 0L, 0L, 0L), 8L, 0.727273, 0.590909, 0.928571))

}
