package graft.core

import graft.SparkSpec
import graft.sources.Tables

class SsdSpec extends SparkSpec {

  test("identity SSD attributes execute as real SQL over registered views") {
    Tables.registerViews(spark, "/root/testdata/sf0.001")
    val ssd = Ssd.identity(1, "customer",
      Seq("c_custkey", "c_name", "c_mktsegment"))
    val frames = ssd.materialize(spark)
    assert(frames.keySet === Set("c_custkey", "c_name", "c_mktsegment"))
    assert(frames("c_name").columns.toSeq === Seq("c_name"))
    assert(frames("c_name").count() === 150L)
  }

  test("transformation attributes execute declared SQL") {
    Tables.registerViews(spark, "/root/testdata/sf0.001")
    val attr = SsdAttribute(0, "name_upper",
      "select upper(c_name) as name_upper from customer")
    val ssd = Ssd(2, "derived", Seq(attr))
    val vals = ssd.attributeFrame(spark, attr)
      .limit(1).collect().head.getString(0)
    assert(vals === vals.toUpperCase)
  }
}
