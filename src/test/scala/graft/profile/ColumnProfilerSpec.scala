package graft.profile

import graft.SparkSpec
import org.apache.spark.sql.Row

class ColumnProfilerSpec extends SparkSpec {
  import scala.jdk.CollectionConverters._

  private def profileOf(values: Seq[String]): Row = {
    import spark.implicits._
    val df = values.toDF("c")
    val out = ColumnProfiler.profile(ColumnProfiler.melt(df, Seq("c")))
    out.collect().head
  }

  test("uniqueness, missing and discreteness on a small column") {
    // 6 values, one blank; distinct(lower trim) = {a, b, ""} = 3
    val r = profileOf(Seq("a", "A", " a ", "b", "b", ""))
      .getValuesMap[Any](Seq("n_values", "num_unique_vals",
        "prop_unique_vals", "prop_missing_vals", "is_discrete"))
    assert(r("n_values") === 6L)
    assert(r("num_unique_vals") === 3L)
    assert(r("prop_unique_vals") === 0.5)
    assert(r("prop_missing_vals") === math.round(1.0 / 6 * 1e6) / 1e6)
    // nonempty distinct {a,b} / 5 nonempty = 0.4 > 0.3 -> not discrete
    assert(r("is_discrete") === 0L)
  }

  test("character-class features") {
    val r = profileOf(Seq("a@b.com", "x-y", "(z)", "1,2/3", "$5 AUD"))
      .getValuesMap[Any](Seq("prop_at_sign", "prop_hyphen", "prop_paren",
        "prop_currency", "mean_commas_per_entry", "mean_slashes_per_entry"))
    assert(r("prop_at_sign") === 0.2)
    assert(r("prop_hyphen") === 0.2)
    assert(r("prop_paren") === 0.2)
    assert(r("prop_currency") === 0.2)
    assert(r("mean_commas_per_entry") === 0.2)
    assert(r("mean_slashes_per_entry") === 0.2)
  }

  test("range format checks numeric bounds") {
    val r = profileOf(Seq("10-20", "30-20", "nope", "5-5"))
      .getValuesMap[Any](Seq("prop_range_format"))
    // 10-20 ok, 5-5 ok, 30-20 start>end, nope no match -> 2/4
    assert(r("prop_range_format") === 0.5)
  }

  test("length stats use discrete median (index ceil(n/2)-1) and min-tie mode") {
    // lengths sorted: 1,2,3,4 -> median idx ceil(4/2)-1=1 -> 2
    // all counts tie at 1 -> mode = smallest length = 1
    val r = profileOf(Seq("a", "bb", "ccc", "dddd"))
      .getValuesMap[Any](Seq("mean_len", "median_len", "mode_len",
        "min_len", "max_len"))
    assert(r("mean_len") === 2.5)
    assert(r("median_len") === 2L)
    assert(r("mode_len") === 1L)
    assert(r("min_len") === 1L)
    assert(r("max_len") === 4L)
  }

  test("entropy of a uniform discrete column is ln(k)") {
    // 2 distinct over 12 values -> discrete (2/12 <= 0.3); uniform 6/6
    val vals = Seq.fill(6)("x") ++ Seq.fill(6)("y")
    val r = profileOf(vals).getValuesMap[Any](
      Seq("is_discrete", "entropy_discrete"))
    assert(r("is_discrete") === 1L)
    assert(math.abs(r("entropy_discrete").asInstanceOf[Double] -
      math.log(2)) < 1e-5)
  }

  test("char entropy: single repeated char is zero, normalized by ln(100)") {
    val z = profileOf(Seq("aaa", "aa")).getValuesMap[Any](Seq("shannon_entropy"))
    assert(z("shannon_entropy") === 0.0)
    // "ab" repeated -> p(a)=p(b)=0.5 -> H=ln2 -> normalized ln2/ln100
    val h = profileOf(Seq.fill(4)("ab")).getValuesMap[Any](Seq("shannon_entropy"))
    assert(math.abs(h("shannon_entropy").asInstanceOf[Double] -
      math.log(2) / math.log(100)) < 1e-5)
  }

  test("profile of several columns yields one row per column") {
    import spark.implicits._
    val df = Seq((1, "a", 2.0), (2, "b", 3.0)).toDF("i", "s", "d")
    val out = ColumnProfiler.profile(ColumnProfiler.melt(df, Seq("i", "s", "d")))
    assert(out.select("col_name").as[String].collect().sorted
      === Array("d", "i", "s"))
  }
}
