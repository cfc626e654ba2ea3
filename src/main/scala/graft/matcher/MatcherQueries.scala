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

  /** DuckDB twin of [[FeatureMatrix.sampledMelt]]: bound each table to
    * its first 4n rows, melt with table-qualified names, take the n
    * md5-ordered values per column (NULLS FIRST matches Spark's
    * asc_nulls_first). Emits CTEs `lim_*`, `m_all`, `samp`. */
  private def sampledMeltSql(tables: Seq[(String, Seq[String])]): String = {
    val n = FeatureMatrix.SampleN
    val lims = tables.map { case (t, _) =>
      s"lim_$t AS (SELECT * FROM $t LIMIT ${4 * n})"
    }.mkString(",\n      ")
    val melts = tables.flatMap { case (t, cols) =>
      cols.map(c =>
        s"SELECT '$t.$c' AS col_name, CAST($c AS VARCHAR) AS value FROM lim_$t")
    }.mkString("\n        UNION ALL ")
    s"""$lims,
      m_all AS (
        $melts
      ),
      samp AS (
        SELECT col_name, value FROM (
          SELECT col_name, value,
            row_number() OVER (PARTITION BY col_name
              ORDER BY md5(value) NULLS FIRST, value NULLS FIRST) AS rn
          FROM m_all) WHERE rn <= $n
      )"""
  }

  val K = 3

  /** m8's pinned output at sf0.01 (driver correctness scale):
    * (col_name, predicted_label, confidence, n_bags). Kept in sync with
    * the live bagged pipeline by PredictionPinSpec. */
  val PinnedM8Sf001: Seq[(String, String, Double, Long)] = Seq(
    ("events.event_id", "identifier", 0.438594, 50L),
    ("events.event_type", "category", 0.624688, 50L),
    ("events.props", "category", 0.34, 50L),
    ("events.ts", "date", 0.359375, 50L),
    ("events.user_id", "identifier", 0.432813, 50L),
    ("events.value", "money", 0.460938, 50L),
    ("nation.n_name", "name", 0.588542, 50L),
    ("nation.n_nationkey", "identifier", 0.976563, 50L),
    ("nation.n_regionkey", "identifier", 0.664063, 50L),
    ("region.r_name", "category", 0.46875, 50L),
    ("region.r_regionkey", "identifier", 0.664063, 50L))

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

    // ---- m3: mean char-distribution cosine per class (J3/A24)
    "m3_char_cosine_features" -> QueryDef(
      (s, dir) => {
        // char distributions on the bounded per-column sample (same S9
        // semantics as the classifier features)
        val trainMelt = FeatureMatrix.sampledMelt(s, dir, Labels.trainTables)
        val holdMelt = FeatureMatrix.sampledMelt(s, dir, Labels.holdoutTables)
        // persisted: norms, query-side and pool-side all branch off the
        // histogram — without a cache each branch re-runs the sample
        // windows; the frame itself is tiny (#cols x alphabet)
        val hist = ExampleFeatures.charHistogram(trainMelt.unionByName(holdMelt))
          .persist()
        ExampleFeatures.meanCharCosinePerClass(
          hist, holdoutColsDf(s), trainLabelsDf(s), Labels.classes)
      },
      Some {
        val allTables = Labels.trainTables ++ Labels.holdoutTables
        val means = Labels.classes.map { c =>
          val cnt = s"sum(CASE WHEN label = '$c' THEN 1 ELSE 0 END)"
          s"""floor((CAST(sum(CASE WHEN label = '$c' THEN CAST(cos AS DECIMAL(30,15)) END) AS DOUBLE) /
            CASE WHEN $cnt > 0 THEN $cnt END) * 1e6 + 0.5) / 1e6 AS mean_cos_$c"""
        }.mkString(",\n          ")
        s"""WITH ${sampledMeltSql(allTables)},
        hist AS (
          SELECT col_name, c, CAST(count(*) AS DOUBLE) AS cnt FROM (
            SELECT col_name, unnest(string_split(lower(value), '')) AS c
            FROM samp WHERE value IS NOT NULL AND length(value) > 0
          ) GROUP BY 1, 2
        ),
        norms AS (SELECT col_name, sqrt(sum(cnt*cnt)) AS nrm FROM hist GROUP BY 1),
        h AS (SELECT hist.col_name, c, cnt / nrm AS w
              FROM hist JOIN norms ON hist.col_name = norms.col_name),
        pool(col_name, label) AS (VALUES
      $poolValuesSql
        ), q(col_name) AS (VALUES
      $queryValuesSql
        ),
        qh AS (SELECT q.col_name AS query_col, c, w AS qw
               FROM h JOIN q ON h.col_name = q.col_name),
        ph AS (SELECT h.col_name AS pool_col, label, c, w AS pw
               FROM h JOIN pool ON h.col_name = pool.col_name),
        cosp AS (
          SELECT query_col, pool_col, label,
            CAST(sum(CAST(qw * pw AS DECIMAL(30,15))) AS DOUBLE) AS cos
          FROM qh JOIN ph USING (c) GROUP BY 1, 2, 3
        )
        SELECT query_col,
          $means
        FROM cosp GROUP BY query_col ORDER BY query_col"""
      }),

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
      // pinned regression oracle at the driver's correctness sf (0.01):
      // the RF is deterministic (fixed seed, single-partition fit), so
      // its output at a fixed sf is a constant, pinned in
      // EvalQueries.PinnedM4Sf001 and guarded live-vs-pin by
      // PredictionPinSpec (same contract as the m6 pin).
      Some {
        val vals = EvalQueries.PinnedM4Sf001
          .map { case (c, l, cf) => s"('$c', '$l', $cf)" }
          .mkString(",\n      ")
        s"""SELECT col_name, predicted_label,
          CAST(confidence AS DOUBLE) AS confidence
        FROM (VALUES
      $vals
        ) AS t(col_name, predicted_label, confidence)
        ORDER BY col_name"""
      }),

    // ---- m8: bagged prediction — per-bag profiles classified then
    //      score-averaged per column (A28/A29 bag aggregation)
    "m8_bagged_predictions" -> QueryDef(
      (s, dir) => {
        val melted = FeatureMatrix.sampledMelt(s, dir, Labels.holdoutTables)
        BaggedPrediction.predict(MatcherSession.model(s, dir), melted)
      },
      // pinned regression oracle at sf0.01 (deterministic hash-bagged
      // profiles + deterministic RF ⇒ constant output at a fixed sf);
      // guarded live-vs-pin by PredictionPinSpec.
      Some {
        val vals = PinnedM8Sf001
          .map { case (c, l, cf, n) => s"('$c', '$l', $cf, $n)" }
          .mkString(",\n      ")
        s"""SELECT col_name, predicted_label,
          CAST(confidence AS DOUBLE) AS confidence,
          CAST(n_bags AS BIGINT) AS n_bags
        FROM (VALUES
      $vals
        ) AS t(col_name, predicted_label, confidence, n_bags)
        ORDER BY col_name"""
      }),

    // ---- m9: A26 word-level normalized term-frequency vectors on the
    //      bounded documents sample (two-level agg; exact norms)
    "m9_word_tf" -> QueryDef(
      (s, dir) => {
        val docTables = Seq("documents" -> Seq("text", "lang", "source"))
        ExampleFeatures.wordTfVector(
          FeatureMatrix.sampledMelt(s, dir, docTables))
          .orderBy(col("col_name"), col("term"))
      },
      Some {
        val docTables = Seq("documents" -> Seq("text", "lang", "source"))
        s"""WITH ${sampledMeltSql(docTables)},
        terms AS (
          SELECT col_name,
            translate(trim(t0), '.,!?;:', '') AS term
          FROM (
            SELECT col_name,
              unnest(string_split_regex(lower(value),
                '[' || chr(10) || ' ,]')) AS t0
            FROM samp WHERE value IS NOT NULL AND length(value) > 0)
          WHERE length(translate(trim(t0), '.,!?;:', '')) > 0
        ),
        cnts AS (
          SELECT col_name, term, count(*) AS cnt FROM terms GROUP BY 1, 2
        ),
        nrms AS (
          SELECT col_name, sqrt(CAST(sum(cnt*cnt) AS DOUBLE)) AS nrm
          FROM cnts GROUP BY 1
        )
        SELECT cnts.col_name, term,
          floor((cnt / nrm) * 1e6 + 0.5) / 1e6 AS tf
        FROM cnts JOIN nrms ON cnts.col_name = nrms.col_name
        ORDER BY cnts.col_name, term"""
      }),

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
      // closed-form: every strategy resizes each class to a target
      // derived from the class-size distribution (mean = integer-floor,
      // median = lower-middle / averaged-middles — floor(median()) gives
      // both), so counts are computable straight from the label pool.
      Some(s"""WITH pool(col_name, label) AS (VALUES
      $poolValuesSql
        ), counts AS (
          SELECT label, count(*) AS c FROM pool GROUP BY label
        ), stats AS (
          SELECT max(c) AS mx,
            greatest(1, CAST(floor(CAST(sum(c) AS DOUBLE) / count(*)) AS BIGINT)) AS mean_t,
            CAST(floor(median(c)) AS BIGINT) AS med
          FROM counts
        ), strat(strategy, label, n) AS (
          SELECT 'upsample_to_max', label, mx FROM counts, stats
          UNION ALL SELECT 'resample_to_mean', label, mean_t FROM counts, stats
          UNION ALL SELECT 'upsample_to_mean', label, greatest(c, mean_t) FROM counts, stats
          UNION ALL SELECT 'resample_to_median', label, med FROM counts, stats
          UNION ALL SELECT 'upsample_to_median', label, greatest(c, med) FROM counts, stats
        )
        SELECT strategy, label, CAST(n AS BIGINT) AS n FROM strat
        ORDER BY strategy, label""")),

    // ---- m10: lexical (WordNet-family) min class-example distances
    // (J4/A25/F5). The oracle is fully relational: header tokenizations
    // and word-level metric values enter as VALUES (both are pure
    // functions of literal header strings — data-independent, like m1's
    // pool), and DuckDB re-derives the alignment (per-bigger-token min,
    // truncated micro-mean, min over examples) from relational algebra.
    "m10_lexical_features" -> QueryDef(
      (s, dir) =>
        ExampleFeatures.lexicalMinDistPerClass(holdoutColsDf(s), trainLabelsDf(s)),
      Some(lexicalOracleSql))
  )

  /** Build the m10 oracle: token VALUES + word-distance-micros VALUES +
    * the alignment SQL. Direction rule mirrors the reference: iterate
    * the BIGGER token set (amin/aavg iterate query tokens, bmin/bavg
    * example tokens; the CASE picks by set size). Two hardening rules
    * keep the twin faithful on degenerate headers the current label set
    * happens not to contain:
    *  - token VALUES carry an ORDINAL and the per-bigger-token min
    *    groups on it, so a header with a repeated token contributes one
    *    min per OCCURRENCE (the engine iterates the token list), not
    *    one per distinct value;
    *  - headers that tokenize to nothing (and classes with an
    *    empty-token example) produce explicit (-1,-1,-1) rows, exactly
    *    the engine's sentinel, instead of silently vanishing from the
    *    VALUES-driven join. */
  private def lexicalOracleSql: String = {
    import graft.functions.{Lexical, StringFunctions}
    val tax = Lexical.Taxonomy.builtin
    val qtoks = Labels.holdout.map { case (t, c, _) =>
      s"$t.$c" -> StringFunctions.tokenize(c) }
    val ptoks = Labels.train.map { case (t, c, l) =>
      (s"$t.$c", l, StringFunctions.tokenize(c)) }
    val qvals = qtoks.flatMap { case (n, ts) =>
      ts.zipWithIndex.map { case (tk, i) => s"('$n', $i, '$tk')" }
    }.mkString(",\n      ")
    val pvals = ptoks.flatMap { case (n, l, ts) =>
      ts.zipWithIndex.map { case (tk, i) => s"('$n', '$l', $i, '$tk')" }
    }.mkString(",\n      ")
    // engine sentinel rows: a zero-token query header is (-1,-1,-1) for
    // every class; a class with a zero-token example has -1 win its min
    val classes = ptoks.map(_._2).distinct.sorted
    val emptyExampleClasses = ptoks.filter(_._3.isEmpty).map(_._2).toSet
    val degenRows = (for {
      (qn, qts) <- qtoks; cls <- classes
      if qts.isEmpty || emptyExampleClasses.contains(cls)
    } yield s"('$qn', '$cls', -1000000, -1000000, -1000000)").distinct
    val degenUnion =
      if (degenRows.isEmpty) ""
      else s"""
        UNION ALL
        SELECT * FROM (VALUES
          ${degenRows.mkString(",\n          ")}
        ) AS degen(query_col, class_name, jcn_u, lin_u, wup_u)"""
    val qvocab = qtoks.flatMap(_._2).distinct.sorted
    val pvocab = ptoks.flatMap(_._3).distinct.sorted
    val wdvals = (for (qw <- qvocab; pw <- pvocab) yield {
      val (j, l, w) = tax.wordDistanceMicros(qw, pw)
      s"('$qw', '$pw', $j, $l, $w)"
    }).mkString(",\n      ")
    s"""WITH qtok(col_name, ord, tok) AS (VALUES
      $qvals
      ), ptok(col_name, label, ord, tok) AS (VALUES
      $pvals
      ), wd(w1, w2, jcn_u, lin_u, wup_u) AS (VALUES
      $wdvals
      ), qn AS (SELECT col_name, count(*) AS n FROM qtok GROUP BY 1
      ), pn AS (SELECT col_name, count(*) AS n FROM ptok GROUP BY 1
      ), pairs AS (
        SELECT q.col_name AS qcol, p.col_name AS pcol, p.label,
               q.ord AS qord, p.ord AS pord, wd.jcn_u, wd.lin_u, wd.wup_u
        FROM qtok q CROSS JOIN ptok p
        JOIN wd ON wd.w1 = q.tok AND wd.w2 = p.tok
      ), amin AS (
        SELECT qcol, pcol, label, qord, min(jcn_u) AS jcn_u,
               min(lin_u) AS lin_u, min(wup_u) AS wup_u
        FROM pairs GROUP BY 1, 2, 3, 4
      ), aavg AS (
        SELECT qcol, pcol, label,
          CAST(floor(CAST(sum(jcn_u) AS DOUBLE) / count(*)) AS BIGINT) AS jcn_u,
          CAST(floor(CAST(sum(lin_u) AS DOUBLE) / count(*)) AS BIGINT) AS lin_u,
          CAST(floor(CAST(sum(wup_u) AS DOUBLE) / count(*)) AS BIGINT) AS wup_u
        FROM amin GROUP BY 1, 2, 3
      ), bmin AS (
        SELECT qcol, pcol, label, pord, min(jcn_u) AS jcn_u,
               min(lin_u) AS lin_u, min(wup_u) AS wup_u
        FROM pairs GROUP BY 1, 2, 3, 4
      ), bavg AS (
        SELECT qcol, pcol, label,
          CAST(floor(CAST(sum(jcn_u) AS DOUBLE) / count(*)) AS BIGINT) AS jcn_u,
          CAST(floor(CAST(sum(lin_u) AS DOUBLE) / count(*)) AS BIGINT) AS lin_u,
          CAST(floor(CAST(sum(wup_u) AS DOUBLE) / count(*)) AS BIGINT) AS wup_u
        FROM bmin GROUP BY 1, 2, 3
      ), pairdist AS (
        SELECT a.qcol, a.pcol, a.label,
          CASE WHEN qn.n <= pn.n THEN b.jcn_u ELSE a.jcn_u END AS jcn_u,
          CASE WHEN qn.n <= pn.n THEN b.lin_u ELSE a.lin_u END AS lin_u,
          CASE WHEN qn.n <= pn.n THEN b.wup_u ELSE a.wup_u END AS wup_u
        FROM aavg a
        JOIN bavg b ON a.qcol = b.qcol AND a.pcol = b.pcol AND a.label = b.label
        JOIN qn ON qn.col_name = a.qcol
        JOIN pn ON pn.col_name = a.pcol
      )
      SELECT query_col, class_name,
        min(jcn_u) / 1000000.0 AS jcn_dist,
        min(lin_u) / 1000000.0 AS lin_dist,
        min(wup_u) / 1000000.0 AS wup_dist
      FROM (
        SELECT qcol AS query_col, label AS class_name, jcn_u, lin_u, wup_u
        FROM pairdist$degenUnion
      ) GROUP BY 1, 2 ORDER BY 1, 2"""
  }
}
