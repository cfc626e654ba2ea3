package graft.relational

import graft.SparkSpec

/** q36 SCD2 reconstruction: the intervals must PARTITION each user's
  * event history — every interval's valid_to is exactly the next
  * interval's valid_from, exactly one open (is_current) interval per
  * user, island event counts sum to the user's event count, and
  * adjacent intervals never share an event_type (else the island
  * collapse failed). */
class Scd2Spec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  test("q36 intervals partition each user's history") {
    import org.apache.spark.sql.functions._
    val rows = graft.SparkEntry.queries("q36_scd2_history")(spark, sf)
      .collect()
    val perUser = rows.groupBy(_.getLong(0))
    val evCounts = graft.sources.Tables.table(spark, sf, "events")
      .groupBy(col("user_id")).agg(count(lit(1)).as("n")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(perUser.keySet === evCounts.keySet)
    for ((u, ivs) <- perUser) {
      // output order is the chain order (valid_from, first_event_id)
      assert(ivs.count(_.getAs[Long]("is_current") == 1L) === 1,
        s"user $u: exactly one open interval")
      assert(ivs.last.getAs[Long]("is_current") === 1L &&
        ivs.last.isNullAt(3), s"user $u: the open interval is last")
      for (Array(a, b) <- ivs.sliding(2))
        assert(a.getTimestamp(3) === b.getTimestamp(2),
          s"user $u: valid_to chains to the next valid_from")
      assert(ivs.map(_.getAs[Long]("n_events")).sum === evCounts(u),
        s"user $u: island counts cover every event")
    }
    assert(rows.length > perUser.size, "fixture has multi-interval users")
  }
}
