package graft.relational

import graft.SparkSpec

/** Plan-shape regression tests: the physical plans that make these
  * queries scale must keep their structure — filters pushed to the
  * parquet scan, pruned read schemas, broadcast joins for dimension
  * tables, no cartesian products on the LSH path. */
class PlanShapeSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  private def plan(name: String): String = {
    val df = graft.SparkEntry.queries(name)(spark, sf)
    df.queryExecution.executedPlan.toString
  }

  test("q2 pushes both filters into the parquet scan") {
    val p = plan("q2_filter_project")
    assert(p.contains("PushedFilters"), p.take(400))
    assert(p.contains("GreaterThan(l_quantity,45.0)"))
    // the PushedFilters list is truncated in toString; the DataFilters
    // echo carries the discount predicate
    assert(p.contains("(l_discount#") && p.contains(">= 0.08)"), p.take(600))
  }

  test("q2 prunes the read schema to the needed columns") {
    val p = plan("q2_filter_project")
    val read = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(!read.contains("l_shipdate") && !read.contains("l_tax"), read)
  }

  test("q5 broadcasts the dimension tables") {
    val p = plan("q5_nation_revenue")
    assert(p.contains("BroadcastHashJoin"), p.take(400))
    assert(!p.contains("CartesianProduct"))
  }

  test("q5 pushes the region filter to the scan") {
    assert(plan("q5_nation_revenue").contains("EqualTo(r_name,ASIA)"))
  }

  test("minhash LSH candidate generation has no cartesian product") {
    val p = plan("d2_minhash_lsh")
    assert(!p.contains("CartesianProduct"), "LSH must bucket-join")
  }

  test("as-of join is a union-merge window — no join operator at all") {
    val p = plan("q22_asof_join")
    assert(!p.contains("Join"), "as-of must not materialize a pair join")
    assert(p.contains("Window"), p.take(400))
  }

  test("range join buckets the interval onto the join key — no nested loop") {
    val p = plan("q23_range_join")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      "interval predicate must ride a key-equality join")
  }

  test("ngram jaccard blocks on (source, length bucket) — no nested loop") {
    val p = plan("d4_ngram_jaccard")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      "d4 candidates must come from a key-equality blocking join")
  }

  test("kNN features broadcast the labelled pool") {
    val p = plan("m1_knn_name_features")
    assert(p.contains("Broadcast"), p.take(400))
  }

  test("matcher sample bounds every table scan before the window (S9)") {
    // The sample window must never sort a full column in one task: each
    // source scan is capped at 4*SampleN rows FIRST, so the per-column
    // window partitions are bounded at any data scale.
    // a table set no other suite persists, so cached InMemoryRelations
    // can't be substituted for the parquet scans under test
    val tables = Seq("orders" -> Seq("o_orderkey", "o_orderpriority"),
      "region" -> Seq("r_name"))
    val df = graft.matcher.FeatureMatrix.sampledMeltCompute(spark, sf, tables)
    val p = df.queryExecution.executedPlan.toString
    val scans = "Scan parquet".r.findAllIn(p).size
    val limits = "GlobalLimit".r.findAllIn(p).size
    assert(scans == tables.size, p.take(600))
    assert(limits >= scans,
      s"every scan needs a row bound before the sample window ($limits limits / $scans scans)")
  }

  test("decontamination broadcasts the eval n-gram set, no cartesian") {
    val p = plan("d7_decontamination")
    assert(p.contains("Broadcast"), p.take(400))
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      "eval-gram candidates must come from a key-equality join")
  }

  test("learned-IVF ANN probes cells via key-equality joins only") {
    val p = plan("s5_ann_ivf_kmeans")
    assert(!p.contains("CartesianProduct"),
      "cell probe and rerank must ride key-equality joins")
  }

  test("incremental dedup joins delta vs index by band key — no corpus products") {
    val p = plan("d14_incremental_dedup")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      "delta admission must be a key-equality join against the band index")
  }

  test("sequence packing never runs a global single-partition prefix sum") {
    val p = plan("t8_sequence_pack")
    // the running sum must stay partitioned by source; a missing
    // partitionBy shows up as Exchange SinglePartition under the Window
    val windowIdx = p.indexOf("Window")
    assert(windowIdx >= 0, p.take(400))
    assert(!p.contains("SinglePartition"),
      "prefix sum collapsed to one partition:\n" + p.take(800))
  }

  test("bucketed join is exchange-free (layout prepays the shuffle)") {
    // disable broadcast so the assert proves the bucketed sort-merge
    // path (at real scale neither fact side is broadcastable anyway)
    val thr = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val (ot, lt) = LayoutQueries.bucketedTables(spark, sf)
      val joined = spark.table(ot).join(spark.table(lt),
        org.apache.spark.sql.functions.col("o_orderkey") ===
          org.apache.spark.sql.functions.col("l_orderkey"))
      val p = joined.queryExecution.executedPlan.toString
      assert(p.contains("SortMergeJoin"), p.take(500))
      assert(!p.contains("Exchange"),
        "bucketed co-located join must not shuffle either side:\n" + p.take(800))
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thr)
  }

  test("partitioned layout prunes to the filtered month at the scan") {
    val path = LayoutQueries.partitionedOrders(spark, sf)
    val df = spark.read.parquet(path)
      .filter(org.apache.spark.sql.functions.col("o_month") ===
        LayoutQueries.PruneMonth)
    val p = df.queryExecution.executedPlan.toString
    val scanLine = p.linesIterator.find(_.contains("PartitionFilters"))
      .getOrElse("")
    assert(scanLine.contains("o_month"),
      "month filter must become a PartitionFilter, not a data filter:\n" +
        p.take(800))
    // and the partition count actually read is 1
    val parts = df.queryExecution.executedPlan.collectLeaves()
      .collect { case f: org.apache.spark.sql.execution.FileSourceScanExec =>
        f.selectedPartitions.partitionCount }
    assert(parts.forall(_ == 1), s"expected exactly one partition read: $parts")
  }

  test("p10 is one pruned scan + one single-row exchange, nothing else") {
    val p = plan("p10_column_correlation")
    val read = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(!read.contains("l_shipdate") && !read.contains("l_orderkey"),
      s"moment scan must prune to the measure columns: $read")
    assert(!p.contains("Join"), "the pair matrix assembles row-locally")
    // the only data exchange is the partial->final single-row agg (the
    // 6-row result sort's range exchange is not a data-sized shuffle)
    val dataExchanges = p.linesIterator.filter(l =>
      l.contains("Exchange") && !l.contains("BroadcastExchange") &&
        !l.contains("rangepartitioning")).toSeq
    assert(dataExchanges.size == 1 &&
      dataExchanges.head.contains("SinglePartition"),
      s"expected one SinglePartition agg exchange, got: $dataExchanges")
  }

  test("t11's bucket model rides back as a broadcast join") {
    val p = plan("t11_importance_weights")
    assert(p.contains("BroadcastHashJoin"), p.take(600))
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"))
    // the per-doc weight join must key on the hash bucket, not
    // shuffle the corpus against the model
    assert(!p.contains("SortMergeJoin"),
      "the O(buckets) model side must broadcast, never sort-merge:\n" +
        p.take(800))
  }

  test("d15's bloom probe gates the explode and probes a plain " +
      "attribute, not an inlined shingle expression") {
    val p = plan("d15_bloom_decontamination")
    // the native probe runs as a row-local filter over the
    // MATERIALIZED shingle attribute — before decontamShingled, the
    // shingle HOF chain was CollapseProject-inlined into this filter
    // and the confirm Generate, re-tokenizing every doc 3-4x per row
    val probeLine = p.linesIterator
      .find(_.contains("graft_bloom_member_count")).getOrElse("")
    assert(probeLine.nonEmpty, p.take(800))
    assert(!probeLine.contains("regexp_extract_all"),
      "probe must reference the checkpoint attribute, not recompute " +
        s"the tokenize chain inline:\n$probeLine")
    assert(p.contains("Generate explode"),
      "confirm path explodes the survivors")
  }

  test("q32 has no dominance self-join") {
    val p = plan("q32_skyline")
    // the two-level sweep replaces the O(n²) dominance join entirely:
    // windows + key-equality joins only
    assert(p.contains("Window"), p.take(400))
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), "no dominance self-join")
  }
}
