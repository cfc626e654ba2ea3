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

  /** Share of non-null values matching a type pattern + majority-vote
    * inferred logical type (reference DataPreprocessor.scala:172-210,
    * DataTypeParser.scala:23-73) — computed over all rows (one distributed
    * pass) instead of the reference's 100-row driver-side sample. */
  private def inferTypes(table: String, cols: Seq[String]): QueryDef = {
    val intRe = ColumnProfiler.IntRe
    val floatRe = ColumnProfiler.FloatRe
    val boolRe = ColumnProfiler.BoolRe
    val dateRe = ColumnProfiler.DateRe
    QueryDef(
      (s, dir) => {
        val m = ColumnProfiler.melt(Tables.table(s, dir, table), cols)
        ColumnProfiler.typeShares(m)
          .withColumn("inferred_type",
            when(col("share_int") > 0.5, "integer")
              .when(col("share_float") > 0.5, "float")
              .when(col("share_bool") > 0.5, "boolean")
              .when(col("share_date") > 0.5, "date")
              .otherwise("string"))
          .orderBy("col_name")
      },
      Some {
        val meltSql = cols
          .map(c => s"SELECT '$c' AS col_name, CAST($c AS VARCHAR) AS value FROM $table")
          .mkString("\n        UNION ALL ")
        val ne = "value IS NOT NULL AND length(trim(value)) > 0"
        def share(re: String) =
          s"round(CAST(sum(CASE WHEN $ne AND regexp_matches(lower(trim(value)), '$re') THEN 1 ELSE 0 END) AS DOUBLE) / sum(CASE WHEN $ne THEN 1 ELSE 0 END), 6)"
        s"""WITH m AS (
        $meltSql
        ), sh AS (
          SELECT col_name,
            ${share(intRe)} AS share_int,
            ${share(floatRe)} AS share_float,
            ${share(boolRe)} AS share_bool,
            ${share(dateRe)} AS share_date
          FROM m GROUP BY col_name
        )
        SELECT col_name, share_int, share_float, share_bool, share_date,
          CASE WHEN share_int > 0.5 THEN 'integer'
               WHEN share_float > 0.5 THEN 'float'
               WHEN share_bool > 0.5 THEN 'boolean'
               WHEN share_date > 0.5 THEN 'date'
               ELSE 'string' END AS inferred_type
        FROM sh ORDER BY col_name"""
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
