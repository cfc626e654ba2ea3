package graft.profile

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ProfilerEdgeSpec extends SparkSpec {

  test("all-null column profiles without errors, with sentinels") {
    import spark.implicits._
    val df = Seq[(Option[String], Int)]((None, 1), (None, 2)).toDF("s", "i")
    val out = ColumnProfiler.profile(ColumnProfiler.melt(df, Seq("s")))
      .collect().head
    assert(out.getAs[Long]("n_values") === 2L)
    assert(out.getAs[Long]("num_unique_vals") === 0L)
    assert(out.getAs[Double]("prop_missing_vals") === 1.0)
    assert(out.getAs[Double]("ratio_alpha_chars") === -1.0)
    assert(out.getAs[Double]("shannon_entropy") === -1.0)
    assert(out.getAs[Long]("median_len") === -1L)
  }

  test("empty frame profiles to zero rows") {
    import spark.implicits._
    val df = Seq.empty[(String, String)].toDF("a", "b")
    val out = ColumnProfiler.profile(ColumnProfiler.melt(df, Seq("a", "b")))
    assert(out.count() === 0L)
  }

  test("single-row column has median = mode = its own length") {
    import spark.implicits._
    val out = ColumnProfiler.profile(
      ColumnProfiler.melt(Seq(Tuple1("abc")).toDF("c"), Seq("c")))
      .collect().head
    assert(out.getAs[Long]("median_len") === 3L)
    assert(out.getAs[Long]("mode_len") === 3L)
    assert(out.getAs[Double]("prop_unique_vals") === 1.0)
  }

  test("unicode values survive char-level features") {
    import spark.implicits._
    val out = ColumnProfiler.profile(ColumnProfiler.melt(
      Seq(Tuple1("héllo wörld"), Tuple1("日本語テキスト")).toDF("c"), Seq("c")))
      .collect().head
    assert(out.getAs[Long]("n_values") === 2L)
    assert(out.getAs[Double]("shannon_entropy") > 0.0)
  }

  test("type shares handle a column with no non-empty values") {
    import spark.implicits._
    val out = ColumnProfiler.typeShares(
      ColumnProfiler.melt(Seq(Tuple1(""), Tuple1(" ")).toDF("c"), Seq("c")))
      .collect().head
    // 0/0 -> null shares rather than a crash
    assert(out.isNullAt(out.fieldIndex("share_int")))
  }

  test("p10 correlations are bounded, complete, and agree with Spark's " +
      "built-in corr() to 1e-6") {
    val rows = graft.SparkEntry.queries("p10_column_correlation")(
      spark, "/root/testdata/sf0.001").collect()
    val cols = graft.profile.ProfileQueries.CorrCols
    assert(rows.length === cols.size * (cols.size - 1) / 2)
    val m = rows.map(r =>
      (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    assert(m.values.forall(c => c >= -1.0 && c <= 1.0))
    // independent implementation of the same statistic: Spark's
    // streaming-covariance corr() aggregate (float path) must agree
    // with the exact-decimal-moments formula to rounding resolution
    val li = graft.sources.Tables.table(
      spark, "/root/testdata/sf0.001", "lineitem")
    val exprs = graft.profile.ProfileQueries.CorrPairs.map { case (i, j) =>
      org.apache.spark.sql.functions.corr(cols(i), cols(j))
        .as(s"${cols(i)}|${cols(j)}") }
    val builtin = li.agg(exprs.head, exprs.tail: _*).collect().head
    for (((x, y), c) <- m) {
      val b = builtin.getAs[Double](s"$x|$y")
      assert(math.abs(c - b) < 1e-6, s"$x~$y: p10 $c vs built-in corr $b")
    }
  }
}
