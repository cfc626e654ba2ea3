package graft.core

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Direct contract tests for [[Materialize]] — the parquet-backed
  * compute-once layer every shared pipeline stage (d2 pairs, matcher
  * features, k-means/PQ codebooks) runs through. */
class MaterializeSpec extends SparkSpec {

  test("computes once; later calls read the materialized parquet back") {
    var computes = 0
    val key = s"spec-once-${System.nanoTime}"
    def frame = {
      computes += 1
      spark.range(10).toDF("id").withColumn("v", col("id") * 3)
    }
    val a = Materialize(spark, key)(frame)
    val b = Materialize(spark, key)(frame)
    assert(computes === 1, "second call must not recompute")
    assert(a.collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
      === b.collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1))
    assert(b.count() === 10)
  }

  test("survives a full cache clear (the round-3 bench failure mode)") {
    val key = s"spec-cache-${System.nanoTime}"
    var computes = 0
    def frame = { computes += 1; spark.range(7).toDF("id") }
    Materialize(spark, key)(frame)
    spark.catalog.clearCache()
    assert(Materialize(spark, key)(frame).count() === 7)
    assert(computes === 1,
      "clearCache must not force recomputation — that is the point")
  }

  test("nested materialization is safe (regression: recursive update)") {
    // computeIfAbsent-based versions threw IllegalStateException when a
    // nested key hashed into the locked bin; two-phase get/putIfAbsent
    // must nest arbitrarily
    val t = System.nanoTime
    val out = Materialize(spark, s"spec-outer-$t") {
      val inner = Materialize(spark, s"spec-inner-$t") {
        spark.range(5).toDF("id")
      }
      inner.withColumn("x", col("id") * 2)
    }
    assert(out.count() === 5)
    assert(out.agg(sum(col("x"))).head().getLong(0) === 20L)
  }
}
