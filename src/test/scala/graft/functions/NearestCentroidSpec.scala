package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.Column

/** The native nearest-centroid expression must be byte-identical to
  * the interpreted HOF formulation it replaced in st6 (quantization,
  * exact-Long distances, `ORDER BY dist, k` tie-break, double cosine)
  * and must run inside whole-stage codegen at O(K) expression size. */
class NearestCentroidSpec extends SparkSpec {

  // the pre-round-7 st6 formulation, kept here as the differential
  // reference: K² interpreted aggregate(zip_with(...)) folds
  private def hofAssign(cents: Array[Array[Long]]): (Column, Column) = {
    val k0 = cents.length
    def cLit(k: Int) = array(cents(k).toIndexedSeq.map(lit(_)): _*)
    val x6 = transform(col("embedding"),
      x => floor(x.cast("double") * 1e6 + lit(0.5)).cast("long"))
    def dist(k: Int) = aggregate(
      zip_with(x6, cLit(k), (x, c) => (x - c) * (x - c)),
      lit(0L), (a, y) => a + y)
    def sxc(k: Int) = aggregate(
      zip_with(x6, cLit(k), (x, c) => x * c),
      lit(0L), (a, y) => a + y)
    val sxx = aggregate(
      zip_with(x6, x6, (x, y) => x * y),
      lit(0L), (a, y) => a + y)
    val scc = cents.map(_.map(v => v * v).sum)
    def cosK(k: Int) = sxc(k).cast("double") /
      (sqrt(sxx.cast("double")) * sqrt(lit(scc(k).toDouble)))
    val kStar = (0 until k0 - 1)
      .foldRight(lit((k0 - 1).toLong): Column) { (k, rest) =>
        when(((k + 1) until k0).map(j => dist(k) <= dist(j))
          .reduce(_ && _), lit(k.toLong)).otherwise(rest)
      }
    val cosr = (0 until k0 - 1)
      .foldRight(cosK(k0 - 1)) { (k, rest) =>
        when(kStar === k.toLong, cosK(k)).otherwise(rest)
      }
    (kStar, cosr)
  }

  test("byte-identical to the HOF formulation on the real embeddings") {
    val cents: Array[Array[Long]] = Array(
      Array.tabulate(64)(d => (d * 13L % 7L) * 100000L - 300000L),
      Array.tabulate(64)(d => (d * 29L % 11L) * 50000L),
      Array.tabulate(64)(d => 200000L - d * 1000L),
      Array.tabulate(64)(d => if (d % 2 == 0) 400000L else -400000L))
    val emb = graft.sources.Tables
      .table(spark, "/root/testdata/sf0.001", "embeddings")
    val (kStar, cosr) = hofAssign(cents)
    val nc = NearestCentroid.assign(col("embedding"), cents)
    val both = emb.withColumn("nc", nc)
      .select(col("vec_id"), col("nc.cluster").as("nk"),
        col("nc.cos").as("ncos"), kStar.as("hk"), cosr.as("hcos"))
    val bad = both.filter(col("nk") =!= col("hk") ||
      col("ncos") =!= col("hcos")).count()
    assert(bad === 0L)
    // tie-break sanity: every cluster id in range
    val ks = both.select("nk").distinct().collect().map(_.getLong(0)).toSet
    assert(ks.subsetOf((0L until 4L).toSet) && ks.nonEmpty)
  }

  test("exact tie goes to the smaller k (the oracle's ORDER BY dist, k)") {
    import spark.implicits._
    // two identical centroids: every vector ties; cluster must be 0
    val cents = Array(
      Array.tabulate(4)(_ => 100000L), Array.tabulate(4)(_ => 100000L))
    val out = Seq(Array(0.1f, 0.2f, 0.3f, 0.4f))
      .toDF("embedding")
      .select(NearestCentroid.assign(col("embedding"), cents).as("nc"))
      .select(col("nc.cluster")).head().getLong(0)
    assert(out === 0L)
  }

  test("null array -> null struct; null element -> null struct") {
    import spark.implicits._
    val cents = Array(Array.tabulate(2)(_ => 0L))
    val df = Seq(
      (1, Some(Seq(Some(0.5f), Some(0.5f)))),
      (2, Some(Seq(Some(0.5f), None))),
      (3, Option.empty[Seq[Option[Float]]]))
      .toDF("id", "embedding")
      .select(col("id"),
        NearestCentroid.assign(col("embedding"), cents).as("nc"))
      .orderBy("id").collect()
    assert(!df(0).isNullAt(1))
    assert(df(1).isNullAt(1))
    assert(df(2).isNullAt(1))
  }

  test("stays inside whole-stage codegen with O(K) expression size") {
    val cents = Array.tabulate(4)(k =>
      Array.tabulate(64)(d => (k * 64 + d).toLong))
    val e = graft.sources.Tables
      .table(spark, "/root/testdata/sf0.001", "embeddings")
      .select(NearestCentroid.assign(col("embedding"), cents).as("nc"))
    val plan = e.queryExecution.executedPlan.toString
    val line = plan.linesIterator.find(_.contains("graft_nearest_centroid"))
    assert(line.exists(_.trim.startsWith("*(")), plan)
    assert(!plan.contains("aggregate(zip_with"), "HOF gone")
  }
}
