package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The native membership-count expression is the row-local kernel that
  * keeps the streaming contamination flags (st5/st7) stateless — it
  * must agree with the explode→join→count formulation it replaces,
  * handle nulls like an array probe should, and run inside whole-stage
  * codegen. */
class SetMembershipSpec extends SparkSpec {

  private def bc(keys: String*) =
    spark.sparkContext.broadcast(keys.toArray)

  test("counts exactly the elements present in the broadcast set") {
    import spark.implicits._
    val keys = bc("a", "b", "c")
    val out = Seq(
      Seq("a", "b", "x"),       // 2 hits
      Seq("x", "y"),            // 0 hits
      Seq("a", "a", "b"),       // duplicates each count (caller
                                // guarantees distinct arrays when the
                                // count must be a distinct-match count)
      Seq.empty[String])
      .toDF("arr")
      .select(SetMemberCount.countIn(col("arr"), keys).as("n"))
      .collect().map(_.getLong(0)).toSeq
    assert(out === Seq(2L, 0L, 3L, 0L))
  }

  test("null array -> null; null elements are skipped") {
    import spark.implicits._
    val keys = bc("a")
    val df = Seq(
      (1, Some(Seq(Some("a"), None, Some("a")))),
      (2, Option.empty[Seq[Option[String]]]))
      .toDF("id", "arr")
      .select(col("id"), SetMemberCount.countIn(col("arr"), keys).as("n"))
      .orderBy("id").collect()
    assert(df(0).getLong(1) === 2L)
    assert(df(1).isNullAt(1))
  }

  test("agrees with the explode+join count on real document shingles") {
    import graft.text.Text
    val docs = graft.sources.Tables
      .table(spark, "/root/testdata/sf0.001", "documents")
      .select(col("doc_id"),
        Text.wordShingles(Text.words(col("text")), 3).as("sh"))
    val evalKeys = docs.filter(col("doc_id") % 10 === 0)
      .select(explode(col("sh")).as("g")).distinct()
      .collect().map(_.getString(0))
    val keys = spark.sparkContext.broadcast(evalKeys)
    val inRow = docs.filter(col("doc_id") % 10 =!= 0)
      .select(col("doc_id"),
        SetMemberCount.countIn(col("sh"), keys).as("n"))
      .filter(col("n") > 0)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val joined = docs.filter(col("doc_id") % 10 =!= 0)
      .select(col("doc_id"), explode(col("sh")).as("g"))
      .join(docs.filter(col("doc_id") % 10 === 0)
        .select(explode(col("sh")).as("g")).distinct(), "g")
      .groupBy("doc_id").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(inRow === joined)
    assert(inRow.nonEmpty, "no contamination hits at this sf")
  }

  test("stays inside whole-stage codegen") {
    val keys = bc("x")
    val e = graft.sources.Tables
      .table(spark, "/root/testdata/sf0.001", "documents")
      .select(SetMemberCount.countIn(
        graft.text.Text.words(col("text")), keys).as("n"))
    val plan = e.queryExecution.executedPlan.toString
    val line = plan.linesIterator.find(_.contains("graft_set_member_count"))
    assert(line.exists(_.trim.startsWith("*(")), plan)
  }
}
