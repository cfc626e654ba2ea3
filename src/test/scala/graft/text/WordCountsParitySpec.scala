package graft.text

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.sources.Tables

/** r16: t14/t16/t20/t21 and oovVocab now derive their word-frequency
  * frames from the shared materialized [[TextQueries.wordCounts]]
  * checkpoint instead of each re-running the corpus tokenize pass.
  * This pins the rollup equivalences the rewrite relies on: the
  * checkpoint's per-(source, word) longs must reproduce every coarser
  * grouping EXACTLY (values and row sets, not just statistically). */
class WordCountsParitySpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  private def directGlobal = Tables.table(spark, sf, "documents")
    .select(explode(Text.words(col("text"))).as("w"))
    .groupBy(col("w")).agg(count(lit(1)).as("freq"))

  test("global rollup of wordCounts equals the direct word-count scan") {
    val viaCheckpoint = TextQueries.wordCounts(spark, sf)
      .groupBy(col("w")).agg(sum(col("n")).as("freq"))
    assert(viaCheckpoint.exceptAll(directGlobal).isEmpty &&
      directGlobal.exceptAll(viaCheckpoint).isEmpty)
  }

  test("per-source rows of wordCounts equal the direct (source, w) scan") {
    val direct = Tables.table(spark, sf, "documents")
      .select(col("source"), explode(Text.words(col("text"))).as("w"))
      .groupBy(col("source"), col("w")).agg(count(lit(1)).as("n"))
    val cp = TextQueries.wordCounts(spark, sf)
    assert(cp.exceptAll(direct).isEmpty && direct.exceptAll(cp).isEmpty)
  }

  test("oovVocab cut equals the direct global top-K under (gn desc, w)") {
    val direct = directGlobal
      .orderBy(col("freq").desc, col("w"))
      .limit(TextQueries.OovVocabSize)
      .select(col("w"))
    val viaCheckpoint = TextQueries.oovVocab(spark, sf)
    // the cut is a total order, so set equality pins it
    assert(viaCheckpoint.exceptAll(direct).isEmpty &&
      direct.exceptAll(viaCheckpoint).isEmpty)
  }
}
