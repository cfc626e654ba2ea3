package graft.profile

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.QueryDef
import graft.sources.Tables

/** Profiling queries registered with the driver harness. Double-typed
  * columns are kept out of the string-melt profiles (Java vs DuckDB
  * shortest-double formatting can differ); they are profiled numerically
  * by `p4_numeric_stats` instead — same split the reference makes between
  * string features and stats-of-numerical-type
  * (reference FeatureExtractor.scala:779-839). */
object ProfileQueries {

  private def prof(table: String, cols: Seq[String]): QueryDef = QueryDef(
    (s, dir) =>
      ColumnProfiler.profile(
        ColumnProfiler.melt(Tables.table(s, dir, table), cols)),
    Some(ColumnProfiler.oracleSql(table, cols)))

  /** A17 shares (full-pass, documented divergence — see ColumnProfiler's
    * sampling contract) + the full A19 inferred-type group: per-value
    * type battery over a bounded deterministic sample, majority vote,
    * 8 one-hot indicators (reference DataPreprocessor.scala:172-210,
    * DataTypeParser.scala:14-52, FeatureExtractor.scala:665-731). */
  private def inferTypes(table: String, cols: Seq[String]): QueryDef = {
    val intRe = ColumnProfiler.IntRe
    val floatRe = ColumnProfiler.FloatRe
    val boolRe = ColumnProfiler.BoolRe
    val dateRe = ColumnProfiler.DateRe
    val n = ColumnProfiler.TypeSampleN
    QueryDef(
      (s, dir) => {
        val m = ColumnProfiler.melt(Tables.table(s, dir, table), cols)
        val bounded = ColumnProfiler.melt(
          Tables.table(s, dir, table).limit(4 * n), cols)
        ColumnProfiler.typeShares(m)
          .join(ColumnProfiler.sampledDateShare(bounded), Seq("col_name"), "left")
          .withColumn("share_date_sampled",
            coalesce(col("share_date_sampled"), lit(0.0)))
          .join(ColumnProfiler.inferredTypeOneHots(bounded), Seq("col_name"))
          .orderBy("col_name")
      },
      Some {
        val meltSql = cols
          .map(c => s"SELECT '$c' AS col_name, CAST($c AS VARCHAR) AS value FROM $table")
          .mkString("\n        UNION ALL ")
        val limMeltSql = cols
          .map(c => s"SELECT '$c' AS col_name, CAST($c AS VARCHAR) AS value FROM lim")
          .mkString("\n        UNION ALL ")
        val ne = "value IS NOT NULL AND length(trim(value)) > 0"
        def share(re: String) =
          s"round(CAST(sum(CASE WHEN $ne AND regexp_matches(lower(trim(value)), '$re') THEN 1 ELSE 0 END) AS DOUBLE) / sum(CASE WHEN $ne THEN 1 ELSE 0 END), 6)"
        val typeCase = s"""CASE
            WHEN length(trim(value)) = 0 THEN 'unknown'
            WHEN regexp_matches(value, '${ColumnProfiler.FloatFullRe}') THEN 'float'
            WHEN regexp_matches(value, '${ColumnProfiler.BoolCharRe}') THEN 'boolean'
            WHEN regexp_matches(value, '${ColumnProfiler.IntFullRe}') THEN
              CASE WHEN length(value) = 4 AND TRY_CAST(value AS INTEGER)
                     BETWEEN 1500 AND ${ColumnProfiler.YearMax} THEN 'date'
                   WHEN TRY_CAST(value AS INTEGER) IS NOT NULL THEN 'integer'
                   WHEN TRY_CAST(value AS BIGINT) IS NOT NULL THEN 'long'
                   ELSE 'string' END
            WHEN regexp_matches(value, '${ColumnProfiler.TimeOnlyRe}') THEN 'time'
            WHEN regexp_matches(value, '${ColumnProfiler.DateTimeRe}') THEN 'datetime'
            WHEN regexp_matches(value, '${ColumnProfiler.DateFullRe}') THEN 'date'
            ELSE 'string' END"""
        val rankCase = "CASE t " + ColumnProfiler.TypeRank.zipWithIndex
          .map { case (t, i) => s"WHEN '$t' THEN $i" }
          .mkString(" ") + s" ELSE ${ColumnProfiler.TypeRank.size} END"
        val oneHots = ColumnProfiler.TypeKeys.map(k =>
          s"CAST(CASE WHEN inferred_type = '$k' THEN 1 ELSE 0 END AS BIGINT) AS inferred_type_$k")
          .mkString(",\n          ")
        s"""WITH m AS (
        $meltSql
        ), sh AS (
          SELECT col_name,
            ${share(intRe)} AS share_int,
            ${share(floatRe)} AS share_float,
            ${share(boolRe)} AS share_bool,
            ${share(dateRe)} AS share_date
          FROM m GROUP BY col_name
        ), lim AS (
          SELECT * FROM $table LIMIT ${4 * n}
        ), lm AS (
        $limMeltSql
        ), samp AS (
          SELECT col_name, value FROM (
            SELECT col_name, value,
              row_number() OVER (PARTITION BY col_name
                ORDER BY md5(value), value) AS rn
            FROM lm WHERE value IS NOT NULL AND length(value) > 0)
          WHERE rn <= $n
        ), sds AS (
          SELECT col_name,
            round(CAST(sum(CASE WHEN regexp_matches(lower(trim(value)), '$dateRe')
              THEN 1 ELSE 0 END) AS DOUBLE) / count(*), 6) AS share_date_sampled
          FROM samp GROUP BY col_name
        ), typed AS (
          SELECT col_name, $typeCase AS t FROM samp
        ), tcnt AS (
          SELECT col_name, t, count(*) AS cnt FROM typed GROUP BY 1, 2
        ), moded AS (
          SELECT col_name, t FROM (
            SELECT col_name, t,
              row_number() OVER (PARTITION BY col_name
                ORDER BY cnt DESC, $rankCase) AS rn
            FROM tcnt) WHERE rn = 1
        ), withdef AS (
          SELECT allc.col_name, coalesce(t, 'string') AS inferred_type
          FROM (SELECT DISTINCT col_name FROM m) allc
          LEFT JOIN moded ON allc.col_name = moded.col_name
        )
        SELECT sh.col_name, share_int, share_float, share_bool, share_date,
          coalesce(share_date_sampled, 0.0) AS share_date_sampled,
          inferred_type,
          $oneHots
        FROM sh JOIN withdef ON sh.col_name = withdef.col_name
        LEFT JOIN sds ON sh.col_name = sds.col_name
        ORDER BY sh.col_name"""
      })
  }

  /** Numeric column stats (reference stats-of-numerical-type,
    * FeatureExtractor.scala:779-839): melt numeric columns keeping them
    * as doubles; exact decimal accumulation for sum/mean. */
  private def numericStats(table: String, cols: Seq[String]): QueryDef = QueryDef(
    (s, dir) => {
      val parts = cols.map(c => s"'$c', cast(`$c` as double)").mkString(", ")
      Tables.table(s, dir, table)
        .selectExpr(s"stack(${cols.size}, $parts) as (col_name, x)")
        .groupBy(col("col_name"))
        .agg(
          count(col("x")).as("n"),
          round(sum(col("x").cast(DecimalType(30, 10))).cast("double"), 2)
            .as("sum_x"),
          round(sum(col("x").cast(DecimalType(30, 10))).cast("double") /
            count(col("x")), 6).as("mean_x"),
          min(col("x")).as("min_x"),
          max(col("x")).as("max_x"))
        .orderBy("col_name")
    },
    Some {
      val meltSql = cols
        .map(c => s"SELECT '$c' AS col_name, CAST($c AS DOUBLE) AS x FROM $table")
        .mkString("\n      UNION ALL ")
      s"""WITH m AS (
      $meltSql
      )
      SELECT col_name, count(x) AS n,
        round(CAST(sum(CAST(x AS DECIMAL(30,10))) AS DOUBLE), 2) AS sum_x,
        round(CAST(sum(CAST(x AS DECIMAL(30,10))) AS DOUBLE) / count(x), 6) AS mean_x,
        min(x) AS min_x, max(x) AS max_x
      FROM m GROUP BY col_name ORDER BY col_name"""
    })

  val defs: Map[String, QueryDef] = Map(
    "p1_profile_customer" -> prof("customer",
      Seq("c_custkey", "c_name", "c_nationkey", "c_mktsegment")),
    "p2_profile_documents" -> prof("documents",
      Seq("doc_id", "text", "lang", "source", "n_chars")),
    "p3_profile_orders" -> prof("orders",
      Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_orderdate",
        "o_orderpriority")),
    "p4_numeric_stats" -> numericStats("lineitem",
      Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")),
    "p5_inferred_types" -> inferTypes("events",
      Seq("event_id", "ts", "event_type", "props")),
    "p6_profile_part" -> prof("part",
      Seq("p_partkey", "p_name", "p_brand", "p_type", "p_size")))
}
