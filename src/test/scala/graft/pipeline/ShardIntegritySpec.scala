package graft.pipeline

import graft.SparkSpec

/** e11 shard integrity: on a healthy layout every reconciliation flag
  * must be green (e3's shard map covers the admitted pool exactly
  * once, ranges disjoint), over-budget shards must match a recount
  * from e3's own manifest, and the audit's window detector must fire
  * on a deliberately corrupted manifest. */
class ShardIntegritySpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  test("e11 is all-green on e3's real layout and reconciles exactly") {
    val e3 = graft.SparkEntry.queries("e3_shard_manifest")(spark, sf)
      .collect()
    val rows = graft.SparkEntry.queries("e11_shard_integrity")(spark, sf)
      .collect().map(r => r.getAs[String]("split") -> r).toMap
    assert(rows.nonEmpty)
    val bySplit = e3.groupBy(_.getAs[String]("split"))
    assert(rows.keySet === bySplit.keySet)
    for ((split, shards) <- bySplit) {
      val r = rows(split)
      assert(r.getAs[Long]("n_shards") === shards.length.toLong)
      assert(r.getAs[Long]("n_docs") ===
        shards.map(_.getAs[Long]("n_docs")).sum)
      assert(r.getAs[Long]("n_tokens") ===
        shards.map(_.getAs[Long]("n_tokens")).sum)
      assert(r.getAs[Long]("docs_ok") === 1L, s"$split docs reconcile")
      assert(r.getAs[Long]("tokens_ok") === 1L, s"$split tokens reconcile")
      assert(r.getAs[Long]("n_range_overlaps") === 0L, s"$split disjoint")
      assert(r.getAs[Long]("n_over_budget") === shards.count(
        _.getAs[Long]("n_tokens") > PipelineQueries.ShardTokenBudget).toLong)
      assert(r.getAs[Long]("max_shard_tokens") ===
        shards.map(_.getAs[Long]("n_tokens")).max)
    }
  }

  test("the overlap detector fires on a corrupted manifest") {
    // replicate e11's audit window over a hand-corrupted 3-shard
    // manifest: shard 1's range dips below shard 0's max
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    import spark.implicits._
    val m = Seq(
      ("train", 0L, 0L, 10L, 100L, 0L, 9L),
      ("train", 0L, 1L, 10L, 100L, 5L, 19L), // overlaps shard 0
      ("train", 0L, 2L, 10L, 100L, 20L, 29L))
      .toDF("split", "macro_shard", "shard_seq", "n_docs", "n_tokens",
        "min_doc_id", "max_doc_id")
    val wm = Window.partitionBy(col("split"), col("macro_shard"))
      .orderBy(col("shard_seq"))
    val overlaps = m
      .withColumn("prev_max", lag(col("max_doc_id"), 1).over(wm))
      .withColumn("overlap", when(col("prev_max").isNotNull &&
        col("min_doc_id") <= col("prev_max"), 1L).otherwise(0L))
      .agg(sum(col("overlap"))).collect()(0).getLong(0)
    assert(overlaps === 1L)
  }
}
