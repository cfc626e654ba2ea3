package graft

/** Global plan invariant over EVERY harness query: no cartesian product
  * or broadcast-nested-loop join reaches a physical plan unless the
  * query is on the explicit whitelist of deliberate small-side scans.
  * This is the "would it survive 100×?" guard in executable form — a
  * new operator that accidentally plans an all-pairs join fails here
  * before any bench or driver run sees it. */
class GlobalPlanSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  /** Queries allowed an all-pairs operator, each with a reason. */
  private val whitelist: Map[String, String] = Map(
    "s1_ann_bruteforce" -> ("exact brute-force baseline by contract; " +
      "query side is NumQueries rows, broadcast"),
    "d5_embedding_neardup" -> ("brute-force pair scan below " +
      "NearDupBruteMax=1000 vectors only; LSH key-equality above"),
    "d9_embedding_clusters" -> ("same gate as d5: brute pair edges " +
      "below NearDupBruteMax, LSH band-key candidates above"),
    "m1_knn_name_features" -> ("kNN over COLUMN NAMES — the pool is " +
      "O(#labelled columns), broadcast crossJoin by design"),
    "m2_min_class_distance" -> "same column-name pool as m1",
    "m10_lexical_features" -> ("lexical distances over COLUMN NAMES — " +
      "same broadcast O(#labelled columns) pool as m1/m2"),
    "m3_char_cosine_features" -> "class-example histogram pairs, O(#columns)",
    "m7_pairwise_features" -> "all-pairs of holdout COLUMNS, O(#columns^2)",
    "q25_bucketed_join" -> ("no all-pairs operator; listed because the " +
      "bucketed-table build at this tiny sf may broadcast"),
    "s3_ann_ivf" -> ("query set x centroid table probe scoring — " +
      "NumQueries x #cells rows, both config-bounded, broadcast"),
    "m8_bagged_predictions" -> ("name-feature pool crossJoin over BAG " +
      "column names — O(numBags x #columns x #labels), config-bounded, " +
      "never data-proportional"))

  test("no query plans an unlisted cartesian or nested-loop join") {
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val plan = fn(spark, sf).queryExecution.executedPlan.toString
        val bad = plan.contains("CartesianProduct") ||
          plan.contains("BroadcastNestedLoopJoin")
        if (bad && !whitelist.contains(name)) Some(name) else None
    }
    assert(offenders.isEmpty,
      s"unlisted all-pairs joins in: ${offenders.mkString(", ")} — " +
        "either fix the plan or whitelist with a written reason")
  }
}
