package graft.relational

import graft.SparkSpec

class ApproxDistinctSpec extends SparkSpec {
  test("HLL distinct counts stay within 5% of exact") {
    val sf = "/root/testdata/sf0.01"
    val approx = graft.SparkEntry.queries("q21_approx_distinct")(spark, sf)
      .collect().map(r => r.getString(0) ->
        (r.getAs[Long]("approx_parts"), r.getAs[Long]("approx_supps"))).toMap
    val exact = graft.SparkEntry.queries("q7_distinct_parts")(spark, sf)
      .collect().map(r => r.getString(0) ->
        (r.getAs[Long]("n_parts"), r.getAs[Long]("n_supps"))).toMap
    exact.foreach { case (flag, (p, s)) =>
      val (ap, as_) = approx(flag)
      assert(math.abs(ap - p).toDouble / p < 0.05, s"parts $flag: $ap vs $p")
      assert(math.abs(as_ - s).toDouble / s < 0.05, s"supps $flag: $as_ vs $s")
    }
  }

  test("registered SQL functions work end-to-end") {
    graft.functions.StringFunctions.register(spark)
    val r = spark.sql("""SELECT nw_dist('orderkey', 'order_key') AS nw,
      jaro_sim('martha', 'marhta') AS j,
      tokenize_name('customerAcctBal') AS toks,
      porter_stem('running') AS stem""").collect().head
    assert(r.getAs[Double]("nw") < 0.2)
    assert(r.getAs[Double]("j") > 0.9)
    assert(r.getAs[collection.Seq[String]]("toks") === Seq("customer", "acct", "bal"))
    assert(r.getAs[String]("stem") === "run")
  }
}
