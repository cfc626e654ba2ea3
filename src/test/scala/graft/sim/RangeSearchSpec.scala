package graft.sim

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.Tables
import graft.text.Text

/** s10 range search: grid completeness, radius monotonicity,
  * nearest/max coherence, agreement with s2's top-1, and the
  * recall-vs-brute bound (LSH candidates can only undercount). */
class RangeSearchSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  private lazy val rows =
    SimilarityQueries.defs("s10_range_search").fn(spark, sf).collect()

  test("grid complete: NumQueries x radii rows, keys exhaustive") {
    val nq = Tables.table(spark, sf, "embeddings")
      .filter(col("vec_id") < SimilarityQueries.NumQueries).count().toInt
    assert(rows.length === nq * SimilarityQueries.RangeRadiiMicro.length)
    val keys = rows.map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(keys.size === rows.length)
  }

  test("n_in_range is non-increasing in the radius; nearest coheres") {
    for ((_, qr) <- rows.groupBy(_.getLong(0))) {
      val byRadius = qr.sortBy(_.getLong(1))
      assert(byRadius.map(_.getLong(2)).toSeq ===
        byRadius.map(_.getLong(2)).sortBy(-_).toSeq,
        "count must shrink as the radius tightens")
      for (r <- byRadius) {
        if (r.getLong(2) > 0L) {
          assert(!r.isNullAt(3) && r.getLong(4) >= 0L)
          assert(r.getDouble(3) >= r.getLong(1).toDouble / 1e6)
        } else {
          assert(r.isNullAt(3) && r.getLong(4) === -1L)
        }
      }
    }
    assert(rows.map(_.getLong(2)).sum > 0L, "empty report at this sf")
  }

  test("nearest/max agree with s2's rank-1 neighbor when in range") {
    val top1 = SimilarityQueries.defs("s2_ann_lsh").fn(spark, sf)
      .filter(col("rank") === 1L).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    for (r <- rows if r.getLong(2) > 0L) {
      val (nid, cos) = top1(r.getLong(0))
      assert(r.getLong(4) === nid)
      assert(r.getDouble(3) === cos)
    }
  }

  test("counts never exceed the exact brute-force in-radius counts") {
    val e = Tables.table(spark, sf, "embeddings")
      .select(col("vec_id"), Text.asDouble(col("embedding")).as("v"))
      .withColumn("nrm", Text.norm(col("v")))
    val q = broadcast(e.filter(col("vec_id") < SimilarityQueries.NumQueries)
      .select(col("vec_id").as("query_id"), col("v").as("qv"),
        col("nrm").as("qnrm")))
    val brute = q.join(e, col("query_id") =!= col("vec_id"))
      .withColumn("cos", round(Text.dot(col("qv"), col("v")) /
        (col("qnrm") * col("nrm")), 6))
      .select(col("query_id"), col("cos")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1))
    for (r <- rows) {
      val exact = brute.count { case (q2, c) =>
        q2 == r.getLong(0) && c >= r.getLong(1).toDouble / 1e6 }
      assert(r.getLong(2) <= exact.toLong,
        s"query ${r.getLong(0)} radius ${r.getLong(1)}: " +
          s"candidates exceed the exact count")
    }
  }
}
