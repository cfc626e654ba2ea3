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
}
