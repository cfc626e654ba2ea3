package graft.relational

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Guards q21's pinned HLL oracle: the pin must equal the live
  * approx_count_distinct output at the driver's correctness scale
  * factor (sf0.01) — HLL++ registers are a commutative max-merge, so
  * the estimate is a partition-order-independent constant for a fixed
  * input set. Also bounds the estimates against exact distinct counts
  * (rsd 0.02 ⇒ generous 10% assertion bound). */
class ApproxDistinctPinSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.01"

  test("pinned sf0.01 approx-distinct counts match the live sketch") {
    val live = graft.SparkEntry.queries("q21_approx_distinct")(spark, sf)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    assert(live.toSeq === WindowQueries.PinnedQ21Sf001,
      "approx-distinct output drifted — refresh WindowQueries.PinnedQ21Sf001")
  }

  test("estimates stay within 10% of exact distinct counts") {
    val exact = graft.sources.Tables.table(spark, sf, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_partkey")).as("p"),
        countDistinct(col("l_suppkey")).as("s"))
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    WindowQueries.PinnedQ21Sf001.foreach { case (f, ap, as0) =>
      val (p, s0) = exact(f)
      assert(math.abs(ap - p).toDouble / p < 0.1, s"parts estimate off for $f")
      assert(math.abs(as0 - s0).toDouble / s0 < 0.1, s"supps estimate off for $f")
    }
  }
}
