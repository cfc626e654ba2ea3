package graft.pipeline

import graft.SparkSpec

/** Randomized battery for [[PipelineQueries.mixtureManifest]] — the
  * sampling plan must be bit-identical to the spec'd rule on ARBITRARY
  * pools, because a divergent frac_micro silently changes which docs a
  * training run sees. Each trial draws a random slim pool
  * (duplicate (source, h) collisions, zero-token docs, empty-string
  * and unicode sources, one near-Long-bound token count to exercise
  * the isqrt adjustment and the DECIMAL(38,0) div path) and compares
  * the full manifest against an independent BigInt model:
  * w = isqrt(T), target = floor(B·w/Σw), frac = min(1e6,
  * floor(target·1e6/T)), selected iff h < frac. Also pins the
  * empty-pool case (empty manifest, no throw).
  */
class MixtureManifestPropSpec extends SparkSpec {

  /** True integer sqrt via BigInt descent — the independent check of
    * the engine's floor(sqrt(double)) ± 1 formulation. */
  private def isqrt(t: Long): Long =
    if (t <= 0L) 0L
    else {
      var s = BigInt(math.sqrt(t.toDouble).toLong)
      while (s * s > t) s -= 1
      while ((s + 1) * (s + 1) <= t) s += 1
      s.toLong
    }

  private def model(slim: Seq[(String, Long, Long)], denom: Long)
      : Map[String, (Long, Long, Long, Long, Long, Long, Long)] = {
    val bySrc = slim.groupBy(_._1)
    val totals = bySrc.map { case (s, rows) =>
      s -> (rows.size.toLong, rows.map(r => BigInt(r._2)).sum) }
    val sumW = totals.values.map { case (_, t) => BigInt(isqrt(t.toLong)) }.sum
    val budget = totals.values.map(_._2).sum / denom
    totals.map { case (s, (nDocs, tBig)) =>
      val t = tBig.toLong
      val w = isqrt(t)
      val target =
        if (sumW <= 0) 0L else (budget * w / sumW).toLong
      val frac =
        if (t <= 0L) 0L
        else (BigInt(target) * 1000000 / t).min(BigInt(1000000)).toLong
      val selRows = bySrc(s).filter(_._3 < frac)
      s -> (nDocs, t, w, target, frac,
        selRows.size.toLong, selRows.map(_._2).sum)
    }
  }

  /** Fold slim (source, n_tokens, h) rows into the (source, h, c, t)
    * histogram [[PipelineQueries.mixtureManifest]] consumes. */
  private def hist(slim: Seq[(String, Long, Long)])
      : Seq[(String, Long, Long, Long)] =
    slim.groupBy(r => (r._1, r._3)).toSeq.map { case ((s, h), rows) =>
      (s, h, rows.size.toLong, rows.map(_._2).sum) }

  private def collect(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => r.getAs[String]("source") ->
      (r.getAs[Long]("n_docs"), r.getAs[Long]("n_tokens"),
        r.getAs[Long]("weight"), r.getAs[Long]("target_tokens"),
        r.getAs[Long]("frac_micro"),
        r.getAs[Long]("sel_docs"), r.getAs[Long]("sel_tokens"))).toMap

  test("random pools: manifest equals the BigInt model of the rule") {
    import spark.implicits._
    val rnd = new scala.util.Random(20260815L)
    val sources = Array("", "web", "books", "código", "维基", "s6")
    for (trial <- 1 to 8) {
      val denom = 2L + rnd.nextInt(9)
      val nRows = rnd.nextInt(80)
      val rows = (0 until nRows).map { _ =>
        val tok = rnd.nextInt(4) match {
          case 0 => 0L
          case 1 => rnd.nextInt(100).toLong
          case _ => math.abs(rnd.nextLong()) % 1000000000000L
        }
        // every third trial draws h from a 50-value range so the
        // (source, h) histogram actually collides rows
        (sources(rnd.nextInt(sources.length)), tok,
          math.abs(rnd.nextLong()) %
            (if (trial % 3 == 0) 50L else 1000000L))
      } ++ (if (trial % 2 == 0)
        // lone near-bound source: raw floor(sqrt(double)) is off-by-one
        // territory and target·1e6 overflows anything but DECIMAL
        Seq(("xxl", 4000000000000000000L - rnd.nextInt(1000),
          rnd.nextInt(1000000).toLong))
      else Nil)
      val got = collect(PipelineQueries.mixtureManifest(
        hist(rows).toDF("source", "h", "c", "t"), denom))
      assert(got === model(rows, denom),
        s"trial $trial (denom=$denom n=$nRows)")
      // plan invariants: weight is the true isqrt; Σ target ≤ budget;
      // frac saturates exactly when target covers the source
      got.foreach { case (_, (_, t, w, target, frac, _, _)) =>
        if (t > 0L) assert(w * w <= t && (w + 1) * (w + 1) > t)
        assert(frac <= 1000000L)
        if (frac == 1000000L) assert(target >= t || t == 0L)
      }
      if (rows.nonEmpty) {
        val budget = rows.map(r => BigInt(r._2)).sum / denom
        assert(got.values.map(v => BigInt(v._4)).sum <= budget)
      }
    }
  }

  test("empty pool yields an empty manifest") {
    import spark.implicits._
    val empty = Seq.empty[(String, Long, Long, Long)]
      .toDF("source", "h", "c", "t")
    assert(PipelineQueries.mixtureManifest(empty, 5L).count() === 0L)
  }

  /** e5 over random (pool, target) rows vs the BigInt model of
    * min-cap epochs / planned / shortfall — including a near-Long
    * pool×cap and a target·1e6 that only DECIMAL(38,0) survives. */
  test("epoch plan equals the BigInt model, never over-plans") {
    import spark.implicits._
    val rnd = new scala.util.Random(20260815L)
    val cap = PipelineQueries.EpochCap
    val rows = (0 until 60).map { i =>
      val t = rnd.nextInt(4) match {
        case 0 => 0L
        case 1 => rnd.nextInt(50).toLong
        case _ => math.abs(rnd.nextLong()) % 1000000000000L
      }
      val target = rnd.nextInt(3) match {
        case 0 => 0L
        case _ => math.abs(rnd.nextLong()) % 4000000000000L
      }
      (s"s$i", t, target)
    } :+ (("xxl", 4000000000000000000L, 4100000000000000000L))
    val got = PipelineQueries.epochPlan(
        rows.toDF("source", "n_tokens", "target_tokens")).collect()
      .map(r => r.getString(0) ->
        (r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))).toMap
    for ((s, t, g) <- rows) {
      val epochs =
        if (t <= 0L) 0L
        else (BigInt(g) * 1000000 / t).min(BigInt(cap) * 1000000).toLong
      val planned = BigInt(g).min(BigInt(t) * cap).toLong
      val exp = (epochs, planned, g - planned,
        if (g - planned > 0L) 1L else 0L)
      assert(got(s) === exp, s"source $s (pool=$t target=$g)")
      assert(planned <= g, "never over-plans the target")
    }
  }
}
