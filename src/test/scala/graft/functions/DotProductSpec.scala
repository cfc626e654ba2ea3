package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The native dot-product expression must be bit-identical to the HOF
  * fold it replaces (same multiply-add order) and must run inside
  * whole-stage codegen. */
class DotProductSpec extends SparkSpec {

  private def hofDot(x: org.apache.spark.sql.Column,
      y: org.apache.spark.sql.Column) =
    aggregate(zip_with(x, y, (p, q) => p * q), lit(0.0), (acc, v) => acc + v)

  test("matches the HOF fold bit-for-bit on random-ish vectors") {
    import spark.implicits._
    val rows = (1 to 200).map { i =>
      (Array.tabulate(64)(d => math.sin(i * 37 + d * 13) * (d + 1)),
        Array.tabulate(64)(d => math.cos(i * 53 + d * 7) / (d + 1)))
    }
    val df = rows.toDF("x", "y")
      .select(graft.text.Text.dot(col("x"), col("y")).as("native"),
        hofDot(col("x"), col("y")).as("hof"))
    assert(df.filter(col("native") =!= col("hof")).count() === 0L)
  }

  test("nulls propagate; empty arrays dot to zero") {
    import spark.implicits._
    val df = Seq(
      (Some(Array(1.0, 2.0)), Some(Array(3.0, 4.0))),
      (None, Some(Array(1.0))),
      (Some(Array.empty[Double]), Some(Array.empty[Double])))
      .toDF("x", "y")
      .select(graft.text.Text.dot(col("x"), col("y")).as("d"))
    val out = df.collect()
    assert(out(0).getDouble(0) === 11.0)
    assert(out(1).isNullAt(0))
    assert(out(2).getDouble(0) === 0.0)
  }

  test("stays inside whole-stage codegen (no interpreted HOF)") {
    // a real parquet scan (local literals constant-fold away)
    val e = graft.sources.Tables
      .table(spark, "/root/testdata/sf0.001", "embeddings")
      .select(graft.text.Text.asDouble(col("embedding")).as("v"))
      .select(graft.text.Text.dot(col("v"), col("v")).as("d"))
    val plan = e.queryExecution.executedPlan.toString
    // codegen'd operators print with a "*(stage)" prefix; the dot's
    // Project must carry one
    val dotLine = plan.linesIterator.find(_.contains("graft_dot"))
    assert(dotLine.exists(_.trim.startsWith("*(")), plan)
    assert(!plan.contains("aggregate(zip_with"), "HOF gone")
  }
}
