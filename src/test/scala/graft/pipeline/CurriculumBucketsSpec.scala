package graft.pipeline

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** e9 curriculum buckets: bucket-edge exactness against a driver
  * recount plus the window identities (cumulative-from-top, share
  * truncation bounds). */
class CurriculumBucketsSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  private lazy val rows =
    PipelineQueries.defs("e9_curriculum_buckets").fn(spark, sf).collect()

  test("buckets in range; shares truncate to within 10 micro of 1") {
    assert(rows.nonEmpty)
    for (r <- rows)
      assert(r.getLong(1) >= 0L && r.getLong(1) <= 9L)
    for ((_, srcRows) <- rows.groupBy(_.getString(0))) {
      val s = srcRows.map(_.getLong(5)).sum
      assert(s <= 1000000L && s >= 1000000L - 10L,
        "per-source shares must fold to ~1 (truncating div)")
    }
  }

  test("cumulative-from-top is the exact running sum; totals match") {
    for ((_, srcRows) <- rows.groupBy(_.getString(0))) {
      val byBucketDesc = srcRows.sortBy(-_.getLong(1))
      var cum = 0L
      for (r <- byBucketDesc) {
        cum += r.getLong(3)
        assert(r.getLong(4) === cum, s"cum mismatch at ${r.getString(0)}")
      }
    }
    val slimTotal = PipelineQueries.admittedSlim(spark, sf)
      .filter(col("split") === "train")
      .agg(sum(col("n_tokens")), count(lit(1))).collect().head
    assert(rows.map(_.getLong(3)).sum === slimTotal.getLong(0))
    assert(rows.map(_.getLong(2)).sum === slimTotal.getLong(1))
  }

  test("bucket assignment matches a driver recount off the ledger") {
    val model = PipelineQueries.ledgerFrame(spark, sf)
      .filter(col("final_keep") === 1L && col("split") === "train")
      .select(col("doc_id"), col("quality_score"))
      .join(PipelineQueries.admittedSlim(spark, sf)
        .select(col("doc_id"), col("source"), col("n_tokens")), "doc_id")
      .collect()
      .groupBy(r => (r.getString(2),
        math.min(math.floor(r.getDouble(1) * 10).toLong, 9L)))
      .map { case (k, v) =>
        k -> (v.length.toLong, v.map(_.getLong(3)).sum) }
    assert(rows.length === model.size)
    for (r <- rows) {
      val (nd, nt) = model((r.getString(0), r.getLong(1)))
      assert(r.getLong(2) === nd && r.getLong(3) === nt)
    }
  }
}
