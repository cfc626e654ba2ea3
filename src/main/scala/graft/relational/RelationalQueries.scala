package graft.relational

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType

import graft.QueryDef
import graft.sources.Tables

/** Relational operator surface (SURVEY.md §2 scans/filters/joins/aggs/
  * sorts/set-ops), expressed as declarative DataFrame plans so Catalyst
  * gets pushdown, pruning, join selection, and whole-stage codegen for
  * free (SURVEY.md §4).
  *
  * Determinism-at-scale convention: every floating-point SUM goes through
  * exact decimal accumulation (`sum(cast(x as decimal(25,6)))`) so the
  * result is independent of partitioning / aggregation order — identical
  * on local[32] and on a 1000-executor cluster, and bit-equal to the
  * DuckDB oracle.
  */
object RelationalQueries {

  /** Order-insensitive exact sum of a double expression. */
  private def dsum(c: Column): Column = sum(c.cast(DecimalType(25, 6)))
  /** Money-style rounded exact sum, returned as double. */
  private def money(c: Column): Column = round(dsum(c).cast("double"), 2)

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.table(s, dir, n)

  val defs: Map[String, QueryDef] = Map(

    // ---- q1: pricing summary (full-scan grouped aggregate, TPC-H Q1 shape)
    "q1_pricing_summary" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        t(s, dir, "lineitem")
          .groupBy($"l_returnflag", $"l_linestatus")
          .agg(
            money($"l_quantity").as("sum_qty"),
            money($"l_extendedprice").as("sum_base_price"),
            money($"l_extendedprice" * (lit(1.0) - $"l_discount")).as("sum_disc_price"),
            money($"l_extendedprice" * (lit(1.0) - $"l_discount") * (lit(1.0) + $"l_tax")).as("sum_charge"),
            round(dsum($"l_discount").cast("double") / count(lit(1)), 6).as("avg_disc"),
            count(lit(1)).as("count_order"))
          .orderBy($"l_returnflag", $"l_linestatus")
      },
      Some("""SELECT l_returnflag, l_linestatus,
        round(CAST(sum(CAST(l_quantity AS DECIMAL(25,6))) AS DOUBLE), 2) AS sum_qty,
        round(CAST(sum(CAST(l_extendedprice AS DECIMAL(25,6))) AS DOUBLE), 2) AS sum_base_price,
        round(CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(25,6))) AS DOUBLE), 2) AS sum_disc_price,
        round(CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax) AS DECIMAL(25,6))) AS DOUBLE), 2) AS sum_charge,
        round(CAST(sum(CAST(l_discount AS DECIMAL(25,6))) AS DOUBLE) / count(*), 6) AS avg_disc,
        count(*) AS count_order
        FROM lineitem GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus""")),

    // ---- q2: selective filter + projection (predicate pushdown to parquet)
    "q2_filter_project" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        t(s, dir, "lineitem")
          .filter($"l_quantity" > 45.0 && $"l_discount" >= 0.08)
          .select($"l_orderkey", $"l_linenumber".cast("long").as("l_linenumber"),
            $"l_quantity", $"l_extendedprice")
          .orderBy($"l_orderkey", $"l_linenumber")
      },
      Some("""SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
        l_quantity, l_extendedprice
        FROM lineitem WHERE l_quantity > 45.0 AND l_discount >= 0.08
        ORDER BY l_orderkey, l_linenumber""")),

    // ---- q3: join + grouped top-k revenue (shuffle join; AQE picks strategy)
    "q3_top_customers" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        val c = t(s, dir, "customer")
        val o = t(s, dir, "orders")
        val l = t(s, dir, "lineitem")
        c.join(o, $"c_custkey" === $"o_custkey")
          .join(l, $"o_orderkey" === $"l_orderkey")
          .filter($"o_orderdate" >= lit(java.sql.Timestamp.valueOf("1997-01-01 00:00:00")))
          .groupBy($"c_custkey", $"c_name")
          .agg(money($"l_extendedprice" * (lit(1.0) - $"l_discount")).as("revenue"))
          .orderBy($"revenue".desc, $"c_custkey")
          .limit(10)
      },
      Some("""SELECT c_custkey, c_name,
        round(CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(25,6))) AS DOUBLE), 2) AS revenue
        FROM customer JOIN orders ON c_custkey = o_custkey
        JOIN lineitem ON o_orderkey = l_orderkey
        WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
        GROUP BY c_custkey, c_name
        ORDER BY revenue DESC, c_custkey LIMIT 10""")),

    // ---- q5: multi-way star join down to nation revenue (broadcast dims)
    "q5_nation_revenue" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        val c = t(s, dir, "customer")
        val o = t(s, dir, "orders")
        val l = t(s, dir, "lineitem")
        val n = broadcast(t(s, dir, "nation"))
        val r = broadcast(t(s, dir, "region"))
        c.join(o, $"c_custkey" === $"o_custkey")
          .join(l, $"o_orderkey" === $"l_orderkey")
          .join(n, $"c_nationkey" === $"n_nationkey")
          .join(r, $"n_regionkey" === $"r_regionkey")
          .filter($"r_name" === "ASIA")
          .groupBy($"n_name")
          .agg(money($"l_extendedprice" * (lit(1.0) - $"l_discount")).as("revenue"))
          .orderBy($"revenue".desc, $"n_name")
      },
      Some("""SELECT n_name,
        round(CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(25,6))) AS DOUBLE), 2) AS revenue
        FROM customer JOIN orders ON c_custkey = o_custkey
        JOIN lineitem ON o_orderkey = l_orderkey
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        WHERE r_name = 'ASIA'
        GROUP BY n_name ORDER BY revenue DESC, n_name""")),

    // ---- q6: selective filter to single-row aggregate
    "q6_revenue_delta" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        t(s, dir, "lineitem")
          .filter($"l_discount".between(0.05, 0.07) && $"l_quantity" < 24.0)
          .agg(money($"l_extendedprice" * $"l_discount").as("revenue"))
      },
      Some("""SELECT round(CAST(sum(CAST(l_extendedprice * l_discount AS DECIMAL(25,6))) AS DOUBLE), 2) AS revenue
        FROM lineitem WHERE l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24.0""")),

    // ---- q7: exact distinct aggregation per group
    "q7_distinct_parts" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        t(s, dir, "lineitem")
          .groupBy($"l_returnflag")
          .agg(
            countDistinct($"l_partkey").as("n_parts"),
            countDistinct($"l_suppkey").as("n_supps"),
            count(lit(1)).as("n_rows"))
          .orderBy($"l_returnflag")
      },
      Some("""SELECT l_returnflag, count(DISTINCT l_partkey) AS n_parts,
        count(DISTINCT l_suppkey) AS n_supps, count(*) AS n_rows
        FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")),

    // ---- q8: window function top-3 orders per customer
    "q8_window_top_orders" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        val w = Window.partitionBy($"o_custkey")
          .orderBy($"o_totalprice".desc, $"o_orderkey")
        t(s, dir, "orders")
          .withColumn("rk", row_number().over(w).cast("long"))
          .filter($"rk" <= 3)
          .select($"o_custkey", $"o_orderkey", $"o_totalprice", $"rk")
          .orderBy($"o_custkey", $"rk")
      },
      Some("""SELECT o_custkey, o_orderkey, o_totalprice, rk FROM (
        SELECT o_custkey, o_orderkey, o_totalprice,
          row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rk
        FROM orders) WHERE rk <= 3 ORDER BY o_custkey, rk""")),

    // ---- q9: semi join (EXISTS)
    "q9_customers_with_open_orders" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        val c = t(s, dir, "customer")
        val o = t(s, dir, "orders").filter($"o_orderstatus" === "O")
        c.join(o, $"c_custkey" === $"o_custkey", "left_semi")
          .select($"c_custkey", $"c_name", $"c_mktsegment")
          .orderBy($"c_custkey")
      },
      Some("""SELECT c_custkey, c_name, c_mktsegment FROM customer
        WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderstatus = 'O')
        ORDER BY c_custkey""")),

    // ---- q10: anti join (NOT EXISTS)
    "q10_customers_without_final_orders" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        val c = t(s, dir, "customer")
        val o = t(s, dir, "orders").filter($"o_orderstatus" === "F")
        c.join(o, $"c_custkey" === $"o_custkey", "left_anti")
          .select($"c_custkey", $"c_name")
          .orderBy($"c_custkey")
      },
      Some("""SELECT c_custkey, c_name FROM customer
        WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
        ORDER BY c_custkey""")),

    // ---- q11: set operations (INTERSECT of two join-derived sets)
    "q11_nations_cust_and_supp" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        val n = t(s, dir, "nation")
        val cn = t(s, dir, "customer")
          .join(n, $"c_nationkey" === $"n_nationkey").select($"n_name")
        val sn = t(s, dir, "supplier")
          .join(n, $"s_nationkey" === $"n_nationkey").select($"n_name")
        cn.intersect(sn).orderBy($"n_name")
      },
      Some("""SELECT n_name FROM customer JOIN nation ON c_nationkey = n_nationkey
        INTERSECT
        SELECT n_name FROM supplier JOIN nation ON s_nationkey = n_nationkey
        ORDER BY n_name""")),

    // ---- q12: event-time daily rollup (timestamp truncation)
    "q12_events_daily" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        t(s, dir, "events")
          .groupBy(to_date($"ts").as("day"), $"event_type")
          .agg(
            count(lit(1)).as("n_events"),
            money($"value").as("sum_value"),
            countDistinct($"user_id").as("n_users"))
          .orderBy($"day", $"event_type")
      },
      Some("""SELECT CAST(ts AS DATE) AS day, event_type, count(*) AS n_events,
        round(CAST(sum(CAST(value AS DECIMAL(25,6))) AS DOUBLE), 2) AS sum_value,
        count(DISTINCT user_id) AS n_users
        FROM events GROUP BY CAST(ts AS DATE), event_type
        ORDER BY day, event_type""")),

    // ---- q13: semi-structured extraction (regexp over JSON-ish props)
    "q13_events_props" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        t(s, dir, "events")
          .withColumn("k", regexp_extract($"props", "\"k\": (\\d+)", 1).cast("long"))
          .groupBy($"event_type")
          .agg(
            sum($"k").as("sum_k"),
            max($"k").as("max_k"),
            count(lit(1)).as("n"))
          .orderBy($"event_type")
      },
      Some("""SELECT event_type,
        CAST(sum(CAST(regexp_extract(props, '"k": (\d+)', 1) AS BIGINT)) AS BIGINT) AS sum_k,
        max(CAST(regexp_extract(props, '"k": (\d+)', 1) AS BIGINT)) AS max_k,
        count(*) AS n
        FROM events GROUP BY event_type ORDER BY event_type""")),

    // ---- q14: calendar rollup on orders
    "q14_orders_by_month" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        t(s, dir, "orders")
          .groupBy(
            year($"o_orderdate").cast("long").as("yr"),
            month($"o_orderdate").cast("long").as("mo"))
          .agg(count(lit(1)).as("n_orders"), money($"o_totalprice").as("sum_price"))
          .orderBy($"yr", $"mo")
      },
      Some("""SELECT CAST(year(o_orderdate) AS BIGINT) AS yr,
        CAST(month(o_orderdate) AS BIGINT) AS mo,
        count(*) AS n_orders,
        round(CAST(sum(CAST(o_totalprice AS DECIMAL(25,6))) AS DOUBLE), 2) AS sum_price
        FROM orders GROUP BY 1, 2 ORDER BY yr, mo""")),

    // ---- q15: grouped join against part dimension + having
    "q15_part_type_volume" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        val l = t(s, dir, "lineitem")
        val p = broadcast(t(s, dir, "part"))
        l.join(p, $"l_partkey" === $"p_partkey")
          .groupBy($"p_type", $"p_brand")
          .agg(money($"l_quantity").as("sum_qty"), count(lit(1)).as("n"))
          .filter($"n" > 10)
          .orderBy($"p_type", $"p_brand")
      },
      Some("""SELECT p_type, p_brand,
        round(CAST(sum(CAST(l_quantity AS DECIMAL(25,6))) AS DOUBLE), 2) AS sum_qty,
        count(*) AS n
        FROM lineitem JOIN part ON l_partkey = p_partkey
        GROUP BY p_type, p_brand HAVING count(*) > 10
        ORDER BY p_type, p_brand"""))
  )
}
