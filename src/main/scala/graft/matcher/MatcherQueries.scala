package graft.matcher

import org.apache.spark.sql.functions._

import graft.QueryDef

/** Matcher (schema-matching) queries registered with the driver harness.
  * The kNN / min-distance feature queries are oracle-checked (DuckDB has
  * `levenshtein`); classifier prediction and resampling are rows-only
  * (RF and hash-sampling are not SQL-expressible) and asserted by
  * MatcherSpec instead. */
object MatcherQueries {

  private def trainLabelsDf(s: org.apache.spark.sql.SparkSession) = {
    import s.implicits._
    Labels.train.map { case (t, c, l) => (s"$t.$c", l) }.toDF("col_name", "label")
  }

  private def holdoutColsDf(s: org.apache.spark.sql.SparkSession) = {
    import s.implicits._
    Labels.holdout.map { case (t, c, _) => s"$t.$c" }.toDF("col_name")
  }

  /** DuckDB VALUES list of (col_name, label) for the training pool. */
  private def poolValuesSql: String = Labels.train
    .map { case (t, c, l) => s"('$t.$c', '$l')" }.mkString(",\n      ")

  private def queryValuesSql: String = Labels.holdout
    .map { case (t, c, _) => s"('$t.$c')" }.mkString(",\n      ")

  val K = 3

  val defs: Map[String, QueryDef] = Map(

    // ---- m1: k-NN class proportions on column-name edit distance (J1/A22)
    "m1_knn_name_features" -> QueryDef(
      (s, dir) =>
        ExampleFeatures.knn(holdoutColsDf(s), trainLabelsDf(s), K, Labels.classes),
      Some {
        val props = Labels.classes.map(c =>
          s"round(CAST(sum(CASE WHEN label = '$c' THEN 1 ELSE 0 END) AS DOUBLE) / $K, 6) AS prop_$c")
          .mkString(",\n          ")
        s"""WITH pool(col_name, label) AS (VALUES
      $poolValuesSql
        ), q(col_name) AS (VALUES
      $queryValuesSql
        ), ranked AS (
          SELECT q.col_name AS query_col, pool.label,
            row_number() OVER (PARTITION BY q.col_name ORDER BY
              levenshtein(lower(split_part(q.col_name, '.', 2)),
                          lower(split_part(pool.col_name, '.', 2))),
              pool.col_name) AS rk
          FROM q CROSS JOIN pool
        )
        SELECT query_col,
          $props
        FROM ranked WHERE rk <= $K GROUP BY query_col ORDER BY query_col"""
      }),

    // ---- m2: min edit distance from each class's examples (J2/A23)
    "m2_min_class_distance" -> QueryDef(
      (s, dir) =>
        ExampleFeatures.minClassDistance(holdoutColsDf(s), trainLabelsDf(s),
          Labels.classes),
      Some {
        val mins = Labels.classes.map(c =>
          s"CAST(min(CASE WHEN label = '$c' THEN dist END) AS BIGINT) AS min_dist_$c")
          .mkString(",\n          ")
        s"""WITH pool(col_name, label) AS (VALUES
      $poolValuesSql
        ), q(col_name) AS (VALUES
      $queryValuesSql
        ), d AS (
          SELECT q.col_name AS query_col, pool.label,
            levenshtein(lower(split_part(q.col_name, '.', 2)),
                        lower(split_part(pool.col_name, '.', 2))) AS dist
          FROM q CROSS JOIN pool
        )
        SELECT query_col,
          $mins
        FROM d GROUP BY query_col ORDER BY query_col"""
      }),

    // ---- m3: mean char-distribution cosine per class (J3/A24), rows-only
    "m3_char_cosine_features" -> QueryDef(
      (s, dir) => {
        // char distributions on the bounded per-column sample (same S9
        // semantics as the classifier features)
        val trainMelt = FeatureMatrix.sampledMelt(s, dir, Labels.trainTables)
        val holdMelt = FeatureMatrix.sampledMelt(s, dir, Labels.holdoutTables)
        val hist = ExampleFeatures.charHistogram(trainMelt.unionByName(holdMelt))
        ExampleFeatures.meanCharCosinePerClass(
          hist, holdoutColsDf(s), trainLabelsDf(s), Labels.classes)
      },
      None),

    // ---- m4: end-to-end semantic-type prediction on held-out tables
    //      (M1-M8; deterministic via fixed seed + single-partition fit;
    //      model + features cached per dir via MatcherSession)
    "m4_semantic_type_predictions" -> QueryDef(
      (s, dir) => {
        SemanticTypeClassifier.predict(MatcherSession.model(s, dir),
            MatcherSession.holdoutFeatures(s, dir))
          .select(col("col_name"), col("predicted_label"), col("confidence"))
          .orderBy(col("col_name"))
      },
      None),

    // ---- m8: bagged prediction — per-bag profiles classified then
    //      score-averaged per column (A28/A29 bag aggregation)
    "m8_bagged_predictions" -> QueryDef(
      (s, dir) => {
        val melted = FeatureMatrix.sampledMelt(s, dir, Labels.holdoutTables)
        BaggedPrediction.predict(MatcherSession.model(s, dir), melted)
      },
      None),

    // ---- m5: resampling class counts (R1-R3 determinism surface)
    "m5_resample_counts" -> QueryDef(
      (s, dir) => {
        val labelled = trainLabelsDf(s)
        val strategies = Seq(
          "upsample_to_max" -> Resampler.UpsampleToMax,
          "resample_to_mean" -> Resampler.ResampleToMean,
          "upsample_to_mean" -> Resampler.UpsampleToMean,
          "resample_to_median" -> Resampler.ResampleToMedian,
          "upsample_to_median" -> Resampler.UpsampleToMedian)
        strategies.map { case (name, strat) =>
          Resampler.resample(labelled, strat)
            .groupBy(col("label")).agg(count(lit(1)).as("n"))
            .withColumn("strategy", lit(name))
        }.reduce(_ unionByName _)
          .select(col("strategy"), col("label"), col("n"))
          .orderBy(col("strategy"), col("label"))
      },
      None)
  )
}
