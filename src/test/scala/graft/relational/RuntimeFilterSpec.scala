package graft.relational

import graft.SparkSpec

/** Runtime bloom-filter join pruning — the 100-TB technique where a
  * selective dimension filter is turned into a bloom filter applied on
  * the FACT side before the shuffle, cutting shuffled rows by the
  * dimension's selectivity. Spark injects it when the creation side is
  * small and the application side is shuffle-joined; this spec pins
  * that our fact-dimension join shape is eligible — i.e. the optimizer
  * CAN protect the big side at scale (at real scale the fact table is
  * far over every threshold; here thresholds are lowered to observe
  * the injection on test data). */
class RuntimeFilterSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.01"

  test("selective dim filter injects a bloom filter on the fact side") {
    val c = spark.conf
    val saved = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
      "spark.sql.autoBroadcastJoinThreshold")
      .map(k => k -> c.getOption(k))
    try {
      c.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      c.set("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "10MB")
      // at real scale the fact scan is far beyond the 10GB default; on
      // 4MB test data the threshold must drop to observe the injection
      c.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
      // force a shuffle join: broadcast joins don't need runtime filters
      c.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val li = spark.read.parquet(s"$sf/lineitem.parquet")
      val p = spark.read.parquet(s"$sf/part.parquet")
        .filter(org.apache.spark.sql.functions.col("p_size") === 1)
      val j = li.join(p, li("l_partkey") === p("p_partkey"))
        .groupBy(p("p_type")).count()
      val plan = j.queryExecution.optimizedPlan.toString
      assert(plan.toLowerCase.contains("bloom"),
        "expected an injected bloom filter in:\n" + plan.take(2000))
    } finally saved.foreach {
      case (k, Some(v)) => c.set(k, v)
      case (k, None) => c.unset(k)
    }
  }
}
