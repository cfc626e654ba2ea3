package graft.profile

import graft.SparkSpec

/** p15 heavy hitters: the per-column top-5 must equal a driver-side
  * exact recount of the raw column values (count desc, value asc
  * ties), and every share must be the integer-micro truncation of
  * count over the column's non-null rows. */
class HeavyHittersSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  private val profiled: Seq[(String, String)] = Seq(
    "orders" -> "o_orderstatus", "orders" -> "o_orderpriority",
    "customer" -> "c_mktsegment", "part" -> "p_brand",
    "part" -> "p_type", "documents" -> "lang", "documents" -> "source")

  test("p15 equals an exact driver-side recount per column") {
    import org.apache.spark.sql.functions._
    val got = graft.SparkEntry.queries("p15_heavy_hitters")(spark, sf)
      .collect()
      .groupBy(r => (r.getString(0), r.getString(1)))
    assert(got.keySet === profiled.map(t => (t._1, t._2)).toSet)
    for ((tab, cn) <- profiled) {
      val vals = graft.sources.Tables.table(spark, sf, tab)
        .select(col(cn).cast("string")).collect()
        .flatMap(r => Option(r.getString(0)))
      val counts = vals.groupBy(identity).view.mapValues(_.size.toLong)
        .toSeq.sortBy { case (v, c) => (-c, v) }
      val tot = vals.length.toLong
      val rows = got((tab, cn)).sortBy(_.getAs[Long]("rnk"))
      assert(rows.length === math.min(5, counts.length), s"$tab.$cn size")
      for ((r, i) <- rows.zipWithIndex) {
        val (v, c) = counts(i)
        assert(r.getAs[String]("value") === v, s"$tab.$cn rank ${i + 1}")
        assert(r.getAs[Long]("cnt") === c)
        assert(r.getAs[Long]("rnk") === i + 1L)
        assert(r.getAs[Long]("share_micro") === c * 1000000L / tot)
      }
      // top-1 dominates or ties everything below it
      assert(rows.head.getAs[Long]("cnt") >= rows.last.getAs[Long]("cnt"))
    }
  }
}
