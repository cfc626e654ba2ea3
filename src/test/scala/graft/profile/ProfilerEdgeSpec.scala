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
}
