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

  /** Key-typed columns scanned by p7's inclusion-dependency pass. */
  val InclusionKeyCols: Seq[(String, String)] = Seq(
    "region" -> "r_regionkey", "nation" -> "n_nationkey",
    "nation" -> "n_regionkey", "customer" -> "c_custkey",
    "customer" -> "c_nationkey", "supplier" -> "s_suppkey",
    "supplier" -> "s_nationkey", "part" -> "p_partkey",
    "orders" -> "o_orderkey", "orders" -> "o_custkey",
    "lineitem" -> "l_orderkey", "lineitem" -> "l_partkey",
    "lineitem" -> "l_suppkey")

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
      Seq("p_partkey", "p_name", "p_brand", "p_type", "p_size")),

    // ---- p7: inclusion-dependency discovery (candidate foreign keys)
    //      — the SPIDER/SINDY data-integration pass the semantic
    //      modeler's cross-table alignment presupposes: for every
    //      ordered key-column pair (A, B), containment =
    //      |distinct(A) ∩ distinct(B)| / |distinct(A)|; containment 1
    //      means A ⊆ B, a candidate FK edge. Shape: one distinct
    //      (column, value) frame, self-joined on VALUE (key-equality;
    //      per-value fan-out is bounded by #key-columns², never by row
    //      count), then two map-side-combined counts — the set-overlap
    //      matrix costs O(distinct values × matches), not O(pairs ×
    //      corpus).
    "p7_inclusion_deps" -> QueryDef(
      (s, dir) => {
        val dv = InclusionKeyCols
          .map { case (t, c) =>
            Tables.table(s, dir, t)
              .select(lit(s"$t.$c").as("col_name"),
                col(c).cast("long").as("v"))
          }
          .reduce(_ unionByName _)
          .filter(col("v").isNotNull).distinct().persist()
        val sizes = dv.groupBy(col("col_name")).agg(count(lit(1)).as("n"))
        val inter = dv.select(col("col_name").as("col_a"), col("v"))
          .join(dv.select(col("col_name").as("col_b"), col("v")), "v")
          .filter(col("col_a") =!= col("col_b"))
          .groupBy(col("col_a"), col("col_b"))
          .agg(count(lit(1)).as("n_common"))
        inter
          .join(sizes.withColumnRenamed("col_name", "col_a")
            .withColumnRenamed("n", "n_a"), "col_a")
          .withColumn("containment",
            floor(col("n_common").cast("double") / col("n_a") * 1e6 + 0.5)
              / 1e6)
          .withColumn("is_inclusion",
            (col("n_common") === col("n_a")).cast("long"))
          .select(col("col_a"), col("col_b"), col("n_common"),
            col("containment"), col("is_inclusion"))
          .orderBy(col("col_a"), col("col_b"))
      },
      Some {
        val selects = InclusionKeyCols.map { case (t, c) =>
          s"SELECT DISTINCT '$t.$c' AS col_name, CAST($c AS BIGINT) AS v FROM $t WHERE $c IS NOT NULL"
        }.mkString("\n        UNION ALL ")
        s"""WITH dv AS (
        $selects
      ), sizes AS (
        SELECT col_name, count(*) AS n FROM dv GROUP BY 1
      ), inter AS (
        SELECT a.col_name AS col_a, b.col_name AS col_b, count(*) AS n_common
        FROM dv a JOIN dv b ON a.v = b.v AND a.col_name <> b.col_name
        GROUP BY 1, 2
      )
      SELECT col_a, col_b, n_common,
        floor(CAST(n_common AS DOUBLE) / s.n * 1e6 + 0.5) / 1e6
          AS containment,
        CAST(n_common = s.n AS BIGINT) AS is_inclusion
      FROM inter JOIN sizes s ON s.col_name = col_a
      ORDER BY col_a, col_b"""
      }))
}
