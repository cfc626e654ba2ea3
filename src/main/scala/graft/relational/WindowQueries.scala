package graft.relational

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType

import graft.QueryDef
import graft.sources.Tables

/** Window/time-series + advanced relational queries: lag/lead, moving
  * aggregates, EXISTS-aggregate (TPC-H Q4 shape), ROLLUP, and a
  * skew-aware salted join whose result is identical to the plain join
  * (salting is an execution detail, so the DuckDB oracle checks it). */
object WindowQueries {

  private def dsum(c: org.apache.spark.sql.Column) =
    sum(c.cast(DecimalType(25, 6)))
  private def money(c: org.apache.spark.sql.Column) =
    round(dsum(c).cast("double"), 2)

  val defs: Map[String, QueryDef] = Map(

    // ---- q16: lag/lead deltas per user over event time
    "q16_event_deltas" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
        Tables.table(s, dir, "events")
          .withColumn("prev_value", lag($"value", 1).over(w))
          .withColumn("next_type", lead($"event_type", 1).over(w))
          .filter($"prev_value".isNotNull)
          .select($"user_id", $"event_id",
            round($"value" - $"prev_value", 6).as("delta"),
            $"next_type")
          .orderBy($"user_id", $"event_id")
      },
      Some("""SELECT user_id, event_id, round(value - prev_value, 6) AS delta, next_type
        FROM (
          SELECT user_id, event_id, value,
            lag(value, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_value,
            lead(event_type, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_type
          FROM events)
        WHERE prev_value IS NOT NULL
        ORDER BY user_id, event_id""")),

    // ---- q17: 3-row moving average of order totals per customer
    "q17_moving_avg" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        val w = Window.partitionBy($"o_custkey")
          .orderBy($"o_orderdate", $"o_orderkey")
          .rowsBetween(-2, Window.currentRow)
        Tables.table(s, dir, "orders")
          .withColumn("mov_avg", round(
            sum($"o_totalprice".cast(DecimalType(25, 6))).over(w)
              .cast("double") /
              count(lit(1)).over(w), 6))
          .select($"o_custkey", $"o_orderkey", $"mov_avg")
          .orderBy($"o_custkey", $"o_orderkey")
      },
      Some("""SELECT o_custkey, o_orderkey,
          round(CAST(sum(CAST(o_totalprice AS DECIMAL(25,6))) OVER w AS DOUBLE) /
                count(*) OVER w, 6) AS mov_avg
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                     ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
        ORDER BY o_custkey, o_orderkey""")),

    // ---- q18: EXISTS + grouped count (TPC-H Q4 shape)
    "q18_priority_count" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        val o = Tables.table(s, dir, "orders")
        val late = Tables.table(s, dir, "lineitem")
          .filter($"l_quantity" >= 48.0)
        o.join(late, $"o_orderkey" === $"l_orderkey", "left_semi")
          .groupBy($"o_orderpriority")
          .agg(count(lit(1)).as("order_count"))
          .orderBy($"o_orderpriority")
      },
      Some("""SELECT o_orderpriority, count(*) AS order_count
        FROM orders WHERE EXISTS (
          SELECT 1 FROM lineitem
          WHERE l_orderkey = o_orderkey AND l_quantity >= 48.0)
        GROUP BY o_orderpriority ORDER BY o_orderpriority""")),

    // ---- q19: ROLLUP over nation/segment revenue
    "q19_rollup_revenue" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        val c = Tables.table(s, dir, "customer")
        val n = broadcast(Tables.table(s, dir, "nation"))
        c.join(n, $"c_nationkey" === $"n_nationkey")
          .rollup($"n_name", $"c_mktsegment")
          .agg(money($"c_acctbal").as("sum_bal"), count(lit(1)).as("n_cust"))
          .select(
            coalesce($"n_name", lit("ALL")).as("nation"),
            coalesce($"c_mktsegment", lit("ALL")).as("segment"),
            $"sum_bal", $"n_cust")
          .orderBy($"nation", $"segment")
      },
      Some("""SELECT coalesce(n_name, 'ALL') AS nation,
          coalesce(c_mktsegment, 'ALL') AS segment,
          round(CAST(sum(CAST(c_acctbal AS DECIMAL(25,6))) AS DOUBLE), 2) AS sum_bal,
          count(*) AS n_cust
        FROM customer JOIN nation ON c_nationkey = n_nationkey
        GROUP BY ROLLUP (n_name, c_mktsegment)
        ORDER BY nation, segment""")),

    // ---- q21: HyperLogLog approximate distinct — the 100 TB path for
    //      q7's exact countDistinct (sketch state is constant-size per
    //      group; exact distinct shuffles every distinct value). Sketch
    //      internals differ across engines, so this is rows-only; the
    //      spec bounds the error against the exact counts.
    "q21_approx_distinct" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        Tables.table(s, dir, "lineitem")
          .groupBy($"l_returnflag")
          .agg(
            approx_count_distinct($"l_partkey", 0.02).as("approx_parts"),
            approx_count_distinct($"l_suppkey", 0.02).as("approx_supps"))
          .orderBy($"l_returnflag")
      },
      None),

    // ---- q22: as-of join (beyond the reference — the time-series
    //      operator Spark lacks natively): each event matches its
    //      user's latest order on or before the event date, ties by
    //      highest order key. Implemented as the scalable union-merge
    //      pattern: tag both sides, one window per key ordered by
    //      (date, tag, key) with last(ignoreNulls) carrying the order
    //      forward — NO join operator at all, so cost is one shuffle of
    //      events+orders and a per-key ordered scan (each partition is
    //      one customer's history; no per-pair blowup at any scale).
    "q22_asof_join" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        val orders = Tables.table(s, dir, "orders")
          .select($"o_custkey".as("k"), $"o_orderdate".as("d"), lit(0).as("tag"),
            $"o_orderkey", lit(null).cast("long").as("event_id"))
        val events = Tables.table(s, dir, "events")
          .select($"user_id".as("k"), to_date($"ts").as("d"), lit(1).as("tag"),
            lit(null).cast("long").as("o_orderkey"), $"event_id")
        val w = Window.partitionBy($"k")
          .orderBy($"d", $"tag", coalesce($"o_orderkey", lit(Long.MaxValue)))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        orders.unionByName(events)
          .withColumn("carried",
            last(when($"tag" === 0, struct($"d".as("od"), $"o_orderkey")),
              ignoreNulls = true).over(w))
          .filter($"tag" === 1)
          .select($"event_id", $"k".as("user_id"),
            $"carried.o_orderkey".as("last_orderkey"),
            $"carried.od".as("last_orderdate"))
          .orderBy($"event_id")
      },
      Some("""WITH tagged AS (
          SELECT o_custkey AS k, o_orderdate AS d, 0 AS tag,
            o_orderkey, CAST(NULL AS BIGINT) AS event_id
          FROM orders
          UNION ALL
          SELECT user_id, CAST(ts AS DATE), 1,
            CAST(NULL AS BIGINT), event_id
          FROM events
        ), carried AS (
          SELECT k, tag, event_id,
            last_value(CASE WHEN tag = 0
                THEN struct_pack(od := d, ok := o_orderkey) END IGNORE NULLS)
              OVER (PARTITION BY k
                ORDER BY d, tag, coalesce(o_orderkey, 9223372036854775807)
                ROWS UNBOUNDED PRECEDING) AS c
          FROM tagged
        )
        SELECT event_id, k AS user_id,
          c.ok AS last_orderkey, c.od AS last_orderdate
        FROM carried WHERE tag = 1 ORDER BY event_id""")),

    // ---- q20: skew-aware salted aggregation — two-level aggregate over
    //      a salted key defeats single-hot-key skew; the final result is
    //      identical to the direct aggregate, which is what the oracle
    //      checks (salting is pure execution strategy)
    "q20_salted_agg" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        val Salts = 8
        // pmod: Spark % keeps the sign, which would silently double the
        // salt space to -7..7 and spread skew unevenly
        Tables.table(s, dir, "events")
          .withColumn("salt", pmod(xxhash64($"event_id"), lit(Salts)).cast("int"))
          .groupBy($"event_type", $"salt")
          .agg(
            dsum($"value").as("part_sum"),
            count(lit(1)).as("part_n"))
          .groupBy($"event_type")
          .agg(
            round(sum($"part_sum").cast("double"), 2).as("sum_value"),
            sum($"part_n").as("n"))
          .orderBy($"event_type")
      },
      Some("""SELECT event_type,
          round(CAST(sum(CAST(value AS DECIMAL(25,6))) AS DOUBLE), 2) AS sum_value,
          count(*) AS n
        FROM events GROUP BY event_type ORDER BY event_type"""))
  )
}
