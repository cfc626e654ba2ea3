package graft.relational

import graft.SparkSpec

/** q35 last-touch attribution: the daily report must equal a
  * driver-side replay of the attribution rule over the raw events —
  * for each purchase, the most recent strictly-preceding click by the
  * same user (ties broken on event_id) within 7 days gets the credit.
  * The oracle proves DuckDB parity; this pins the SEMANTICS against an
  * independent imperative implementation. */
class AttributionSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  test("q35 equals an imperative replay of the last-touch rule") {
    import org.apache.spark.sql.functions._
    val ev = graft.sources.Tables.table(spark, sf, "events")
      .select(col("event_id"), col("user_id"),
        unix_timestamp(col("ts")).as("sec"), to_date(col("ts")).as("day"),
        col("event_type"), col("value"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDate(3).toString, r.getString(4), r.getDouble(5)))
    val byUser = ev.groupBy(_._2)
    // (day -> (purchases, attributed, attrValueCents, lagSecSum))
    val acc = scala.collection.mutable.Map[String, (Long, Long, BigDecimal, Long)]()
    for ((_, rows) <- byUser) {
      val ordered = rows.sortBy(r => (r._3, r._1)) // (ts, event_id)
      var lastClick = Option.empty[Long]
      for (r <- ordered) {
        if (r._5 == "purchase") {
          val (p, a, v, l) = acc.getOrElse(r._4, (0L, 0L, BigDecimal(0), 0L))
          val lag = lastClick.map(r._3 - _)
          val hit = lag.exists(_ <= 604800L)
          acc(r._4) = (p + 1, a + (if (hit) 1L else 0L),
            v + (if (hit) BigDecimal(r._6).setScale(6, BigDecimal.RoundingMode.HALF_UP) else BigDecimal(0)),
            l + (if (hit) lag.get else 0L))
        }
        if (r._5 == "click") lastClick = Some(r._3)
      }
    }
    val got = graft.SparkEntry.queries("q35_attribution")(spark, sf)
      .collect().map(r => r.getDate(0).toString -> r).toMap
    assert(got.keySet === acc.keySet)
    for ((day, (p, a, v, l)) <- acc) {
      val r = got(day)
      assert(r.getAs[Long]("n_purchases") === p, s"$day purchases")
      assert(r.getAs[Long]("n_attributed") === a, s"$day attributed")
      assert(r.getAs[Long]("attr_share_micro") === a * 1000000L / p)
      assert(math.abs(r.getAs[Double]("attr_value") -
        v.setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9,
        s"$day value")
      if (a > 0)
        assert(r.getAs[Long]("mean_lag_sec_micro") === l * 1000000L / a)
      else assert(r.isNullAt(r.fieldIndex("mean_lag_sec_micro")))
    }
    assert(acc.values.map(_._1).sum > 0, "fixture has purchases")
    assert(acc.values.map(_._2).sum > 0, "fixture attributes something")
  }
}
