package graft.dedup

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [[EvalGrams]] gate contract — the "no eval-side executor artifact is
  * corpus-proportional" invariant in executable form:
  *
  *  1. the gate boundary itself;
  *  2. the bloom path (forced via `exactMax = -1`) returns the SAME
  *     rows as the exact path on real corpus data — the scale plan is
  *     not a different answer, just a different plan;
  *  3. the forced-bloom plan actually contains the row-local bloom
  *     prefilter (so the exact-string broadcast cannot be hiding
  *     under the gate) and the exact plan does not;
  *  4. the stream-side bloom probe never UNDERcounts the exact probe
  *     (no false negatives — contamination flags are conservative);
  *  5. [[EvalGrams.bloomOf]]'s tree-merged filter agrees with a
  *     sequentially-built reference filter on every inserted gram.
  */
class EvalGateSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  private def trainSh = {
    val isEval = col("doc_id") % DedupQueries.DecontamEvalMod === 0
    DedupQueries.decontamShingled(spark, sf).filter(!isEval)
  }
  private def evalG = DedupQueries.evalGramSet(spark, sf)

  test("gate boundary: exact at ExactMax, bloom above") {
    assert(EvalGrams.useExact(EvalGrams.ExactMax))
    assert(!EvalGrams.useExact(EvalGrams.ExactMax + 1))
    assert(EvalGrams.useExact(0L))
  }

  test("bloom path returns exactly the exact path's rows") {
    val exact = EvalGrams.sharedCounts(trainSh, evalG,
      exactMax = Long.MaxValue).orderBy("doc_id").collect()
    val bloom = EvalGrams.sharedCounts(trainSh, evalG, exactMax = -1L)
      .orderBy("doc_id").collect()
    assert(exact.nonEmpty, "fixture must produce shared grams")
    assert(bloom.toSeq == exact.toSeq)
  }

  test("forced-bloom plan carries the bloom prefilter; exact does not") {
    val bloomPlan = EvalGrams.sharedCounts(trainSh, evalG, exactMax = -1L)
      .queryExecution.executedPlan.toString
    val exactPlan = EvalGrams.sharedCounts(trainSh, evalG,
      exactMax = Long.MaxValue).queryExecution.executedPlan.toString
    assert(bloomPlan.contains("graft_bloom_member_count"),
      "bloom path must pre-filter row-locally before the confirm join")
    assert(!exactPlan.contains("graft_bloom_member_count"))
    assert(exactPlan.contains("BroadcastExchange") ||
      exactPlan.contains("BroadcastQueryStage"),
      "exact path must broadcast the (gate-bounded) gram set")
  }

  test("stream probe: bloom counts never undercount exact counts") {
    val sh = trainSh
    val exactProbe = EvalGrams.rowProbe(evalG, exactMax = Long.MaxValue)
    val bloomProbe = EvalGrams.rowProbe(evalG, exactMax = -1L)
    val both = sh.select(col("doc_id"),
      exactProbe(col("sh")).as("exact_n"),
      bloomProbe(col("sh")).as("bloom_n"))
    assert(both.filter(col("bloom_n") < col("exact_n")).count() == 0L,
      "bloom probe produced a false negative")
    // and on this fixture the probe is not trivially zero everywhere
    assert(both.filter(col("exact_n") > 0L).count() > 0L)
  }

  test("tree-merged filter matches a sequentially-built reference") {
    import java.nio.charset.StandardCharsets.UTF_8
    val grams = evalG.collect().map(_.getString(0))
    val bloom = EvalGrams.bloomOf(evalG, grams.length.toLong).value
    val ref = org.apache.spark.util.sketch.BloomFilter
      .create(math.max(1000L, grams.length.toLong), EvalGrams.BloomFpp)
    grams.foreach(g => ref.putBinary(g.getBytes(UTF_8)))
    // identical sizing + identical inserted set => identical bit array,
    // observable as agreement on every inserted gram and on the fpp
    // class of a disjoint probe set
    grams.foreach { g =>
      assert(bloom.mightContainBinary(g.getBytes(UTF_8)),
        s"tree-merged filter lost gram '$g'")
    }
    val probes = (1 to 2000).map(i => s"graft-absent-probe-$i")
    val fp = probes.count(p => bloom.mightContainBinary(p.getBytes(UTF_8)))
    val fpRef = probes.count(p => ref.mightContainBinary(p.getBytes(UTF_8)))
    assert(fp == fpRef,
      "tree-merged and reference filters disagree on absent probes — " +
        "the merged bit array drifted from the sequential build")
  }

  test("gate decisions are observable (rehearsal-divergence diagnosis)") {
    EvalGrams.lastDecision = None
    EvalGrams.rowProbe(evalG, exactMax = Long.MaxValue)
    assert(EvalGrams.lastDecision.exists {
      case (site, path, n) => site == "rowProbe" && path == "exact" && n > 0
    })
    EvalGrams.rowProbe(evalG, exactMax = -1L)
    assert(EvalGrams.lastDecision.exists(_._2 == "bloom"))
    EvalGrams.sharedCounts(trainSh, evalG, exactMax = Long.MaxValue)
    assert(EvalGrams.lastDecision.exists {
      case (site, path, _) => site == "sharedCounts" && path == "exact"
    })
  }

  test("empty eval set: bloom path yields no hits, no NPE") {
    val empty = evalG.filter(lit(false))
    val out = EvalGrams.sharedCounts(trainSh, empty, exactMax = -1L)
    assert(out.count() == 0L)
  }
}
