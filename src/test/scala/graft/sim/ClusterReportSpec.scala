package graft.sim

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** s11 cluster quality report: population completeness, cohesion
  * agreement with d11's semantic-dedup arithmetic (the shared-kernel
  * contract), and centroid separation vs a driver recompute. */
class ClusterReportSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  private lazy val rows =
    SimilarityQueries.defs("s11_cluster_report").fn(spark, sf).collect()

  test("K rows, populations complete, micro bounds") {
    assert(rows.length === SimilarityQueries.KmeansK)
    val n = graft.sources.Tables.table(spark, sf, "embeddings").count()
    assert(rows.map(_.getLong(1)).sum === n)
    for (r <- rows) {
      assert(r.getLong(3) <= r.getLong(2), "min > mean")
      assert(math.abs(r.getLong(2)) <= 1000000L)
      assert(math.abs(r.getLong(5)) <= 1000000L)
      assert(r.getLong(4) !== r.getLong(0), "nearest is itself")
    }
  }

  test("cohesion equals d11's per-vector cosine-to-centroid micro") {
    val d11 = graft.dedup.DedupQueries.defs("d11_semantic_dedup")
      .fn(spark, sf).collect()
      .map(r => (r.getLong(1), math.round(r.getDouble(2) * 1e6)))
    val byCluster = d11.groupBy(_._1)
    for (r <- rows) {
      val cms = byCluster(r.getLong(0)).map(_._2)
      assert(r.getLong(1) === cms.length.toLong)
      assert(r.getLong(3) === cms.min)
      assert(r.getLong(2) === (cms.map(BigInt(_)).sum / cms.length).toLong)
    }
  }

  test("nearest other centroid matches a driver recompute") {
    val cents = SimilarityQueries.kmeansCentroids(spark, sf).collect()
      .groupBy(_.getLong(0))
      .map { case (k, rs) =>
        // `d` is IntegerType in the melt — use the numeric view
        k -> rs.sortBy(_.getAs[Number](1).longValue)
          .map(_.getLong(2).toDouble) }
    def cosMicro(a: Array[Double], b: Array[Double]): Long = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      math.floor(dot / (math.sqrt(a.map(x => x * x).sum) *
        math.sqrt(b.map(x => x * x).sum)) * 1e6 + 0.5).toLong
    }
    for (r <- rows) {
      val k = r.getLong(0)
      val best = cents.keys.filter(_ != k)
        .map(k2 => (cosMicro(cents(k).toArray, cents(k2).toArray), k2))
        .maxBy(t => (t._1, -t._2))
      assert(r.getLong(4) === best._2)
      assert(r.getLong(5) === best._1)
    }
  }
}
