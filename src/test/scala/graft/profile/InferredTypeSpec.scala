package graft.profile

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** A19 contract: per-value battery priority, year heuristic,
  * integer/long split, majority vote with deterministic tie-break,
  * 8 one-hot outputs, user type-map override, all-empty default. */
class InferredTypeSpec extends SparkSpec {
  import org.apache.spark.sql.DataFrame

  private def melted(values: (String, String)*): DataFrame = {
    import spark.implicits._
    values.toSeq.toDF("col_name", "value")
  }

  private def typeOf(v: String): String =
    melted("c" -> v).withColumn("t", ColumnProfiler.inferredValueType)
      .collect().head.getAs[String]("t")

  test("per-value battery follows the reference priority order") {
    assert(typeOf("3.14") === "float")
    assert(typeOf("-0.5") === "float")
    assert(typeOf(".5") === "float")
    assert(typeOf("T") === "boolean")
    assert(typeOf("0") === "boolean") // single 0/1 is boolean, not int
    assert(typeOf("y") === "boolean")
    assert(typeOf("123") === "integer")
    assert(typeOf("1995") === "date") // year heuristic
    assert(typeOf("2526") === "date") // currYear + 500 inclusive
    assert(typeOf("2527") === "integer")
    assert(typeOf("1499") === "integer")
    assert(typeOf("99999999999") === "long") // > Int.MaxValue
    assert(typeOf("123456789012345678901234567") === "string") // > Long
    assert(typeOf("12:30:45") === "time")
    assert(typeOf("11pm") === "time")
    assert(typeOf("2024-01-02 12:30:45.5") === "datetime")
    assert(typeOf("2024-01-02") === "date")
    assert(typeOf("3/4/2024") === "date")
    assert(typeOf("Jan 5, 2024") === "date")
    assert(typeOf("hello") === "string")
    assert(typeOf("  ") === "unknown")
  }

  test("majority vote with one-hots; ties break by priority rank") {
    val m = melted(
      "a" -> "1.5", "a" -> "2.5", "a" -> "x",
      // b: 2 integer vs 2 string -> integer wins the tie (rank 2 < 7)
      "b" -> "123", "b" -> "456", "b" -> "foo", "b" -> "bar")
    val out = ColumnProfiler.inferredTypeOneHots(m).collect()
      .map(r => r.getAs[String]("col_name") -> r).toMap
    assert(out("a").getAs[String]("inferred_type") === "float")
    assert(out("a").getAs[Long]("inferred_type_float") === 1L)
    assert(out("a").getAs[Long]("inferred_type_string") === 0L)
    assert(out("b").getAs[String]("inferred_type") === "integer")
    val hotSum = ColumnProfiler.TypeKeys
      .map(k => out("b").getAs[Long](s"inferred_type_$k")).sum
    assert(hotSum === 1L, "exactly one indicator set")
  }

  test("type-map override wins; all-empty column defaults to string") {
    import spark.implicits._
    val m = melted("a" -> "123", "a" -> "456")
      .unionByName(Seq(("b", null.asInstanceOf[String])).toDF("col_name", "value"))
    val out = ColumnProfiler
      .inferredTypeOneHots(m, typeMap = Map("a" -> "Date"))
      .collect().map(r => r.getAs[String]("col_name") -> r).toMap
    assert(out("a").getAs[String]("inferred_type") === "date")
    assert(out("a").getAs[Long]("inferred_type_date") === 1L)
    assert(out("b").getAs[String]("inferred_type") === "string")
  }

  test("vote runs on at most TypeSampleN values per column") {
    import spark.implicits._
    // 100 md5-smallest values decide; make every value distinct
    val vals = (1 to 400).map(i => ("c", s"v$i"))
    val m = vals.toDF("col_name", "value")
    val sampled = m.filter(length(col("value")) > 0)
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("col_name"))
          .orderBy(md5(col("value").cast("binary")), col("value"))))
      .filter(col("rn") <= ColumnProfiler.TypeSampleN)
    assert(sampled.count() === ColumnProfiler.TypeSampleN.toLong)
    assert(ColumnProfiler.inferredTypeOneHots(m).count() === 1L)
  }
}
