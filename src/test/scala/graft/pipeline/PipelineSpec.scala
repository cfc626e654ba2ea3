package graft.pipeline

import graft.SparkSpec

/** e1's ledger must agree with the standalone operators it composes. */
class PipelineSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  test("e1 stage flags are consistent with t2/d1/d7 and each other") {
    val rows = graft.SparkEntry.queries("e1_training_pipeline")(spark, sf)
      .collect()
    assert(rows.nonEmpty)
    // eval docs never appear
    assert(rows.forall(_.getAs[Long]("doc_id") %
      graft.dedup.DedupQueries.DecontamEvalMod != 0))
    // flag implications
    rows.foreach { r =>
      val (pq, can, cont, keep) = (r.getAs[Long]("passed_quality"),
        r.getAs[Long]("is_canonical"), r.getAs[Long]("contaminated"),
        r.getAs[Long]("final_keep"))
      assert(Set(0L, 1L)(pq) && Set(0L, 1L)(can) && Set(0L, 1L)(cont))
      if (can == 1L) assert(pq === 1L, "canonicals passed quality")
      if (cont == 1L) assert(can === 1L,
        "decontam only runs on surviving canonicals (stage order)")
      assert(keep === (if (can == 1L && cont == 0L) 1L else 0L))
      assert(Set("train", "val", "test")(r.getAs[String]("split")))
    }
    // quality agrees with t2's shared scorer
    val t2 = graft.SparkEntry.queries("t2_quality_scores")(spark, sf)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        r.getAs[Double]("quality_score")).toMap
    rows.foreach { r =>
      val expected =
        if (t2(r.getAs[Long]("doc_id")) >= PipelineQueries.PipelineMinQuality)
          1L else 0L
      assert(r.getAs[Long]("passed_quality") === expected)
    }
    // any doc e1 marks contaminated is contaminated per standalone d7
    val d7 = graft.SparkEntry.queries("d7_decontamination")(spark, sf)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        r.getAs[Long]("contaminated")).toMap
    rows.filter(_.getAs[Long]("contaminated") == 1L).foreach { r =>
      assert(d7(r.getAs[Long]("doc_id")) === 1L)
    }
    // the gate filters something and keeps something at sf0.001
    val kept = rows.count(_.getAs[Long]("final_keep") == 1L)
    assert(kept > 0 && kept < rows.length)
  }

  test("e3 manifest matches a driver-side re-shard; overshoot is bounded") {
    import org.apache.spark.sql.functions.{coalesce, col, lit}
    val admitted = PipelineQueries.ledgerFrame(spark, sf)
      .filter(col("final_keep") === 1L)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        r.getAs[String]("split")).toMap
    val toks = graft.sources.Tables.table(spark, sf, "documents")
      .select(col("doc_id"), coalesce(
        graft.text.Text.bpeTokenCount(col("text")).cast("long"),
        lit(0L)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // independent model of the cut rule: within (split, macro_shard)
    // by doc_id, a doc joins shard floor(prefix_before / budget)
    val model = scala.collection.mutable.Map
      .empty[(String, Long, Long), (Long, Long, Long, Long)]
    for ((split, docs) <- admitted.groupBy(_._2);
         (macroId, ids) <- docs.keys.toSeq
           .groupBy(_ / PipelineQueries.ShardMacroDocs)) {
      var cum = 0L
      for (id <- ids.sorted) {
        val seq = cum / PipelineQueries.ShardTokenBudget
        cum += toks(id)
        val k = (split, macroId, seq)
        model(k) = model.get(k) match {
          case None => (1L, toks(id), id, id)
          case Some((nd, nt, lo, hi)) =>
            (nd + 1L, nt + toks(id), math.min(lo, id), math.max(hi, id))
        }
      }
    }
    val got = graft.SparkEntry.queries("e3_shard_manifest")(spark, sf)
      .collect().map(r => (r.getAs[String]("split"),
        r.getAs[Long]("macro_shard"), r.getAs[Long]("shard_seq")) ->
        (r.getAs[Long]("n_docs"), r.getAs[Long]("n_tokens"),
          r.getAs[Long]("min_doc_id"), r.getAs[Long]("max_doc_id"))).toMap
    assert(got === model.toMap)
    assert(got.size > 1, "budget small enough to produce multiple shards")
    // bounded overshoot: a shard exceeds the budget by at most its
    // final doc, so n_tokens < budget + the corpus's largest doc
    val maxDoc = toks.values.max
    got.values.foreach { case (_, nt, _, _) =>
      assert(nt < PipelineQueries.ShardTokenBudget + maxDoc)
    }
  }

  test("e3 macro-shard boundary: shards never span it, seq resets per macro") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    // doc_ids straddle the (test-scoped) macro width of 10; every doc
    // is 4 tokens with budget 10, so each full shard holds 2-3 docs
    // and a shard would cross id 9|10 or 19|20 if the bound leaked
    val docs = (0L to 24L).map(id => (id, "train", 4L))
      .toDF("doc_id", "split", "n_tokens")
    val m = PipelineQueries.shardManifest(docs, budget = 10L,
        macroDocs = 10L)
      .collect().map(r => (r.getAs[Long]("macro_shard"),
        r.getAs[Long]("shard_seq")) ->
        (r.getAs[Long]("min_doc_id"), r.getAs[Long]("max_doc_id"),
          r.getAs[Long]("n_docs"))).toMap
    // no shard's id range crosses a macro boundary
    m.foreach { case ((mac, _), (lo, hi, _)) =>
      assert(lo / 10L === mac && hi / 10L === mac)
    }
    // shard_seq restarts at 0 inside each macro shard (the prefix sum
    // is per-partition, not global)
    for (mac <- 0L to 2L)
      assert(m.contains((mac, 0L)), s"macro $mac restarts at seq 0")
    // 10 docs x 4 tokens per full macro: prefix-before hits seq
    // boundaries at docs {3,5,8} -> shards of 3/2/3/2 docs; 25 docs
    // total accounted for
    assert(m.values.map(_._3).sum === 25L)
    assert(m((0L, 0L)) === ((0L, 2L, 3L)))
    assert(m((0L, 1L)) === ((3L, 4L, 2L)))
    assert(m((0L, 3L)) === ((8L, 9L, 2L)))
  }
}
