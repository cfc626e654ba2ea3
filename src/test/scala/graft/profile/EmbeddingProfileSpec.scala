package graft.profile

import graft.SparkSpec

/** p14 embedding profile: the per-dimension moments must equal a
  * driver-side recomputation over the SAME micro-quantized components
  * (the oracle proves DuckDB parity; this pins the variance law and
  * that every dimension of every vector is counted exactly once). */
class EmbeddingProfileSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  test("p14 equals a driver recount; dims complete; bounds hold") {
    val vecs = graft.sources.Tables.table(spark, sf, "embeddings")
      .select("embedding").collect()
      .map(_.getAs[collection.Seq[Float]](0))
    val dims = vecs.head.length
    val rows = graft.SparkEntry.queries("p14_embedding_profile")(spark, sf)
      .collect().map(r => r.getAs[Long]("pos") -> r).toMap
    assert(rows.keySet === (0L until dims.toLong).toSet,
      "every dimension profiled exactly once")
    // half-up (away-from-zero) like both engines' round(); math.round
    // rounds ties toward +infinity and diverges on negative half-micros
    def q(x: Double): Long =
      BigDecimal(x).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    for (pos <- 0 until dims) {
      val xq = vecs.map(v => q(v(pos).toDouble * 1e6))
      val r = rows(pos.toLong)
      assert(r.getAs[Long]("n") === vecs.length.toLong)
      assert(r.getAs[Long]("min_micro") === xq.min)
      assert(r.getAs[Long]("max_micro") === xq.max)
      val meanD = xq.map(BigInt(_)).sum.toDouble / vecs.length / 1e6
      val msq = xq.map(q => BigInt(q) * BigInt(q)).sum.toDouble /
        vecs.length / 1e12
      def r6(x: Double) =
        BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(r.getAs[Double]("mean") === r6(meanD), s"mean at dim $pos")
      assert(r.getAs[Double]("var_pop") === r6(msq - meanD * meanD),
        s"variance law at dim $pos")
      assert(r.getAs[Double]("var_pop") >= -1e-9, "variance non-negative")
    }
  }
}
