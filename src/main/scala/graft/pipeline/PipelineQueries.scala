package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.QueryDef
import graft.sources.Tables
import graft.text.{Text, TextQueries}

/** The composed training-data pipeline — the "a user could switch and
  * run their pipeline" proof: quality gate → exact dedup → benchmark
  * decontamination → leakage-safe split, emitted as a per-document
  * LEDGER (every stage's verdict as a column) rather than a filtered
  * corpus, because at 100 TB the audit trail is the product a data
  * team actually ships alongside the kept set (`final_keep = 1` rows
  * ARE the corpus; the rest say exactly why a doc fell out).
  *
  * Every stage reuses the standalone operator's shared kernel — t2's
  * [[graft.text.TextQueries.qualityFrame]], d1's normalized
  * fingerprint, d7's eval n-gram containment, d8's hash-split — so the
  * composition can't drift from the operators it composes (and the
  * oracle composes the same shared SQL CTEs).
  *
  * Scale shape: one narrow quality projection (row-local), one
  * fingerprint window (key-equality on fp), one broadcast-able eval
  * gram join gated BEHIND the quality+dedup filters (the decontam
  * explode runs only on surviving canonicals — stage order is the
  * optimization: each stage shrinks the next stage's input, exactly
  * how production pipelines sequence cheap-to-expensive), and a
  * row-local split hash. No all-pairs anything.
  */
object PipelineQueries {

  /** Quality gate: ~p10 of the synthetic corpus's t2 score at every
    * test sf (measured 0.455 at sf0.01) — drops the worst decile. */
  val PipelineMinQuality = 0.45

  /** e3 shard cut: cumulative BPE-token budget per training shard
    * (small at test scale so the manifest has structure; production
    * sets this to the file-size target, e.g. ~100M tokens). */
  val ShardTokenBudget = 2048L

  /** e3 macro-shard width (t8's PackShardDocs rationale): the window
    * partition holding the prefix sum is hard-bounded at this many
    * slim rows, so no split can collapse sharding into one task. */
  val ShardMacroDocs = 1000000L

  /** e10: the checkpoint grid, as percentages of the train pool's
    * token volume. Interpolated into the oracle SQL so the two can't
    * drift. */
  val ResumeGridPct: Seq[Long] = Seq(10L, 25L, 50L, 75L, 90L)

  /** e1's per-doc ledger (unordered) — shared with e3 (which shards
    * the `final_keep = 1` survivors), admittedSlim, and e9.
    * MATERIALIZED once per corpus: the ledger is the pipeline's
    * central verdict table and its build (quality regex pass + the
    * fingerprint window + the gated contamination join) was being
    * re-paid by every consumer — measured 47-130 s each at sf10 for
    * e2/e3/e9 while e1's own `.count()` read 1.15 s because count
    * prunes the verdict columns. One parquet-backed build, every
    * consumer scans seven narrow columns. */
  def ledgerFrame(s: SparkSession, dir: String): DataFrame =
    graft.core.Materialize(s, s"pipe-ledger|$dir") {
      ledgerCompute(s, dir)
    }

  private def ledgerCompute(s: SparkSession, dir: String): DataFrame = {
    import graft.dedup.DedupQueries.{DecontamEvalMod,
      SplitTrainFrac, SplitValFrac}
    val docs = Tables.table(s, dir, "documents")
    val isEval = col("doc_id") % DecontamEvalMod === 0
    // stage 1: quality (t2's shared scorer), eval docs excluded
    val q = TextQueries.qualityFrame(s, dir)
      .filter(!isEval)
      .select(col("doc_id"), col("quality_score"),
        (col("quality_score") >= PipelineMinQuality).cast("long")
          .as("passed_quality"))
    // stage 2: exact dedup among quality survivors only (d1's
    // normalized fingerprint; failed docs don't compete)
    val fp = docs.select(col("doc_id"),
      md5(Text.normText(col("text"))).as("fp"))
    val staged = q.join(fp, "doc_id")
    val w = Window.partitionBy(col("passed_quality"), col("fp"))
    val deduped = staged.withColumn("is_canonical",
      (col("passed_quality") === 1L &&
        col("doc_id") === min(col("doc_id")).over(w)).cast("long"))
    // stage 3: decontamination (d7's exact containment) off the
    // shared materialized shingle checkpoint, computed ONLY for
    // surviving canonicals — the stage-order optimization. The probe
    // is EvalGrams-gated: exact broadcast below the gate, bloom
    // prefilter + confirm join (same exact result) above it.
    val canonSh = graft.dedup.DedupQueries.decontamShingled(s, dir)
      .join(deduped.filter(col("is_canonical") === 1L)
        .select(col("doc_id")), "doc_id")
    val contaminatedIds = graft.dedup.EvalGrams.sharedCounts(
        canonSh, graft.dedup.DedupQueries.evalGramSet(s, dir))
      .select(col("doc_id"))
      .withColumn("contaminated", lit(1L))
    // stage 4: leakage-safe split — d8's hash, keyed on the exact-
    // cluster fingerprint so exact dups always share a split
    val u = (conv(substring(md5(col("fp").cast("binary")), 1, 15),
      16, 10).cast("long") % 1000L).cast("double") / 1000.0
    deduped
      .join(contaminatedIds, Seq("doc_id"), "left")
      .withColumn("contaminated",
        coalesce(col("contaminated"), lit(0L)))
      .withColumn("split",
        when(u < SplitTrainFrac, "train")
          .when(u < SplitTrainFrac + SplitValFrac, "val")
          .otherwise("test"))
      .withColumn("final_keep",
        (col("is_canonical") === 1L && col("contaminated") === 0L)
          .cast("long"))
      .select(col("doc_id"), col("quality_score"),
        col("passed_quality"), col("is_canonical"),
        col("contaminated"), col("split"), col("final_keep"))
  }

  /** DuckDB CTE chain reproducing [[ledgerFrame]]'s stages — shared by
    * e1's oracle and e3's (which wraps [[ledgerSqlSelect]] as a CTE). */
  private[graft] val ledgerSqlCtes: String = {
    import graft.dedup.DedupQueries.{DecontamEvalMod, DecontamN}
    val wordsSqlDuck = "regexp_extract_all(lower(text), '[a-z0-9]+')"
    val shingles =
      s"""CASE WHEN len($wordsSqlDuck) >= $DecontamN THEN
        list_distinct(list_transform(range(0, len($wordsSqlDuck) - ${DecontamN - 1}),
          j -> array_to_string(list_slice($wordsSqlDuck, j+1, j+$DecontamN), ' ')))
      ELSE [] END"""
    s"""${TextQueries.qualitySqlCte},
    st AS (
      SELECT q.doc_id, q.quality_score,
        CAST(q.quality_score >= $PipelineMinQuality AS BIGINT)
          AS passed_quality,
        md5(trim(regexp_replace(regexp_replace(lower(d.text),
          '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g'))) AS fp
      FROM q JOIN documents d USING (doc_id)
      WHERE q.doc_id % $DecontamEvalMod <> 0
    ), dd AS (
      SELECT *, CAST(passed_quality = 1 AND doc_id =
        min(doc_id) OVER (PARTITION BY passed_quality, fp)
        AS BIGINT) AS is_canonical
      FROM st
    ), g AS (
      SELECT doc_id, unnest($shingles) AS g FROM documents
    ), e AS (
      SELECT DISTINCT g FROM g WHERE doc_id % $DecontamEvalMod = 0
    ), cont AS (
      SELECT DISTINCT g.doc_id FROM g
      JOIN (SELECT doc_id FROM dd WHERE is_canonical = 1) k
        USING (doc_id)
      JOIN e USING (g)
    )"""
  }

  /** The ledger SELECT over [[ledgerSqlCtes]] (no ORDER BY). */
  private[graft] val ledgerSqlSelect: String = {
    import graft.dedup.DedupQueries.{SplitTrainFrac, SplitValFrac}
    s"""SELECT dd.doc_id, dd.quality_score, dd.passed_quality,
      dd.is_canonical,
      CAST(cont.doc_id IS NOT NULL AS BIGINT) AS contaminated,
      CASE WHEN (CAST(('0x' || substr(md5(fp), 1, 15)) AS BIGINT)
          % 1000) / 1000.0 < $SplitTrainFrac THEN 'train'
        WHEN (CAST(('0x' || substr(md5(fp), 1, 15)) AS BIGINT)
          % 1000) / 1000.0 < ${SplitTrainFrac + SplitValFrac}
          THEN 'val'
        ELSE 'test' END AS split,
      CAST(dd.is_canonical = 1 AND cont.doc_id IS NULL AS BIGINT)
        AS final_keep
    FROM dd LEFT JOIN cont ON dd.doc_id = cont.doc_id"""
  }

  /** e4: take this 1/denom of the admitted train pool's tokens as the
    * mixture budget (scale-free — a constant token budget would make
    * the plan degenerate at small sf and trivial at large sf). */
  val MixtureBudgetDenom = 5L

  /** e4's deterministic per-doc selection hash in [0, 1e6): d8's
    * cross-engine md5 idiom, salted with "mix|" so it is independent
    * of the ledger's split hash (which keys on the content fp) and of
    * t7's language-sample hash — composing the samplers never
    * correlates them. Shared by e4 (plan + realized counts) and st11
    * (the streaming sampler front), which MUST agree bit-for-bit on
    * which docs a frac_micro admits. */
  def mixHash(docId: Column): Column =
    conv(substring(md5(concat(lit("mix|"), docId.cast("string"))
      .cast("binary")), 1, 15), 16, 10).cast("long") % 1000000L

  /** DuckDB twin of [[mixHash]] over a doc_id SQL expression. */
  private[graft] def mixHashSqlDuck(docIdExpr: String): String =
    s"""CAST(('0x' || substr(md5('mix|' || CAST($docIdExpr AS VARCHAR)),
      1, 15)) AS BIGINT) % 1000000"""

  /** e5: repetition cap — a source is repeated at most this many
    * epochs to fill its mixture target (the data-constrained-scaling
    * practice: repeating data is near-free up to ~4 epochs and
    * rapidly decays after — Muennighoff et al. 2023,
    * arXiv:2305.16264). */
  val EpochCap = 4L

  /** e5's plan math over e4's manifest (any frame carrying `source`,
    * `n_tokens`, `target_tokens`) — parameterized so the property
    * battery can drive it against a BigInt model. Row-local and
    * integer-exact: epochs_micro = min(cap·1e6, target·1e6 / pool)
    * (DECIMAL(38,0) intermediates — target·1e6 overflows BIGINT at
    * real corpus scale), planned = min(target, pool·cap), shortfall =
    * target − planned, capped = shortfall > 0. */
  def epochPlan(plan: DataFrame, cap: Long = EpochCap): DataFrame =
    plan.select(col("source"), col("n_tokens"), col("target_tokens"))
      .withColumn("epochs_micro",
        when(col("n_tokens") <= 0L, lit(0L)).otherwise(expr(
          s"""CAST(least(CAST(${cap * 1000000L} AS DECIMAL(38,0)),
            CAST(target_tokens AS DECIMAL(38,0)) * 1000000 div
            CAST(n_tokens AS DECIMAL(38,0))) AS BIGINT)""")))
      .withColumn("planned_tokens", expr(
        s"""CAST(least(CAST(target_tokens AS DECIMAL(38,0)),
          CAST(n_tokens AS DECIMAL(38,0)) * $cap) AS BIGINT)"""))
      .withColumn("shortfall_tokens",
        col("target_tokens") - col("planned_tokens"))
      .withColumn("capped",
        (col("shortfall_tokens") > 0L).cast("long"))
      .orderBy(col("source"))

  /** DuckDB CTE chain computing e4's plan (`slim` → `hist` → `src` →
    * `wtd` → `tot` → `plan2`) from the `ledger` + `documents` CTEs —
    * the exact SQL twin of [[e4Hist]] piped through
    * [[mixtureManifest]]'s math (HUGEINT where Spark uses
    * DECIMAL(38,0)). Shared by e4's oracle and st11's (the streaming
    * sampler must sample under the SAME plan the batch manifest
    * publishes). */
  private[graft] val mixturePlanSqlCtes: String =
    s"""slim AS (
        SELECT coalesce(d.source, '') AS source,
          coalesce(CAST(len(regexp_extract_all(d.text,
            '[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]')) AS BIGINT), 0) AS n_tokens,
          ${mixHashSqlDuck("l.doc_id")} AS h
        FROM ledger l JOIN documents d USING (doc_id)
        WHERE l.final_keep = 1 AND l.split = 'train'
      ), hist AS (
        SELECT source, h, count(*) AS c,
          CAST(sum(n_tokens) AS BIGINT) AS t
        FROM slim GROUP BY 1, 2
      ), src AS (
        SELECT source, CAST(sum(c) AS BIGINT) AS n_docs,
          CAST(sum(t) AS BIGINT) AS n_tokens
        FROM hist GROUP BY 1
      ), wtd AS (
        SELECT source, n_docs, n_tokens,
          CASE WHEN n_tokens <= 0 THEN 0
            WHEN s0*s0 > n_tokens THEN s0 - 1
            WHEN (s0+1)*(s0+1) <= n_tokens THEN s0 + 1
            ELSE s0 END AS weight
        FROM (SELECT *, CAST(floor(sqrt(CAST(n_tokens AS DOUBLE)))
          AS BIGINT) AS s0 FROM src)
      ), tot AS (
        SELECT *, CAST(sum(weight) OVER () AS BIGINT) AS sum_w,
          CAST(CAST(sum(n_tokens) OVER () AS BIGINT)
            // $MixtureBudgetDenom AS BIGINT) AS budget
        FROM wtd
      ), plan2 AS (
        SELECT *,
          CASE WHEN n_tokens <= 0 THEN 0
            ELSE least(1000000, CAST(CAST(target_tokens AS HUGEINT)
              * 1000000 // n_tokens AS BIGINT)) END AS frac_micro
        FROM (
          SELECT *, CASE WHEN sum_w <= 0 THEN 0
            ELSE CAST(CAST(budget AS HUGEINT) * weight // sum_w
              AS BIGINT) END AS target_tokens
          FROM tot)
      )"""

  /** Materialized slim frame of the ADMITTED corpus —
    * `(doc_id, split, source, n_tokens)` for every final_keep = 1 doc.
    * The ONE tokenize pass of the export family: e3's shard layout and
    * e4's histogram both consumed (ledger ⨝ documents → bpeTokenCount)
    * frames that re-ran the token regex over the full admitted corpus
    * independently; at sf100 that regex scan dominates both (e3 629 s,
    * e4 1244 s measured paying it twice). Now the first consumer
    * builds this artifact and the rest read four narrow columns.
    * null-text docs are zero-token entries, not NULLs that poison
    * prefix sums (e3's documented coalesce). */
  def admittedSlim(s: SparkSession, dir: String): DataFrame =
    graft.core.Materialize(s, s"pipe-admitted-slim|$dir") {
      val admitted = ledgerFrame(s, dir)
        .filter(col("final_keep") === 1L)
        .select(col("doc_id"), col("split"))
      Tables.table(s, dir, "documents")
        .join(admitted, "doc_id")
        .select(col("doc_id"), col("split"),
          coalesce(col("source"), lit("")).as("source"),
          coalesce(Text.bpeTokenCount(col("text")).cast("long"),
            lit(0L)).as("n_tokens"))
    }

  /** The bounded `(source, h, c, t)` histogram of the admitted train
    * pool (e1's final_keep = 1, split = 'train'), materialized off the
    * shared [[admittedSlim]] artifact — e4's plan, e4's selection
    * re-aggregation, and st11's streaming sampler all scan it. At most
    * 1e6 rows per source regardless of corpus size. */
  def e4Hist(s: SparkSession, dir: String): DataFrame =
    graft.core.Materialize(s, s"e4-hist|$dir") {
      admittedSlim(s, dir)
        .filter(col("split") === "train")
        .select(col("source"), col("n_tokens"),
          mixHash(col("doc_id")).as("h"))
        .groupBy(col("source"), col("h"))
        .agg(count(lit(1)).as("c"), sum(col("n_tokens")).as("t"))
    }

  /** e4's plan math over a slim frame of `(source, n_tokens, h)` where
    * `h` is the doc's deterministic selection hash in [0, 1e6).
    * Parameterized (e3's pattern) so the property battery can drive it
    * with random frames against a BigInt model.
    *
    * Semantics — temperature-smoothed source mixture (τ=2, i.e.
    * weight ∝ √tokens, the multilingual-LM sampling practice of
    * XLM-R/mT5): per source s with T_s admitted tokens,
    * w_s = isqrt(T_s), target_s = floor(B·w_s / Σw),
    * frac_s = min(1, target_s / T_s) in micro-units, and a doc is
    * selected iff h < frac_micro — deterministic, row-local,
    * re-runnable on any engine.
    *
    * Exactness: isqrt via floor(sqrt(double)) with a ±1 integer
    * adjustment (sqrt is correctly rounded and the double conversion
    * error of T ≤ 4e18 keeps the raw root within 1 of exact, and the
    * adjustment squares stay inside Long for T ≤ 4e18 — ~160× the
    * token count of a 100-TB corpus; t10's documented-bound idiom).
    * target and frac use DECIMAL(38,0) multiplies with integral `div`
    * so no intermediate can overflow and no engine float semantics
    * leak in. τ and the budget are the only knobs.
    *
    * Scale shape: takes the (source, h) HISTOGRAM `(source, h, c, t)`
    * — at most 1e6 rows per source no matter the corpus size (the
    * QueryDef materializes it off ONE corpus pass) — and every step
    * (per-source totals, the single-partition totals window, the
    * broadcast frac join and the selection re-aggregation) runs on
    * that bounded frame. The corpus is never rescanned to realize the
    * selection counts, and the two hist consumers scan the persisted
    * histogram, not the ledger lineage.
    */
  def mixtureManifest(hist: DataFrame, denom: Long): DataFrame = {
    val src = hist.groupBy(col("source"))
      .agg(sum(col("c")).as("n_docs"), sum(col("t")).as("n_tokens"))
    val planned = src
      .withColumn("s0",
        floor(sqrt(col("n_tokens").cast("double"))).cast("long"))
      .withColumn("weight",
        when(col("n_tokens") <= 0L, lit(0L))
          .when(col("s0") * col("s0") > col("n_tokens"), col("s0") - 1L)
          .when((col("s0") + 1L) * (col("s0") + 1L) <= col("n_tokens"),
            col("s0") + 1L)
          .otherwise(col("s0")))
      // both totals in ONE single-partition window over the bounded
      // per-source frame (S rows) — no driver collect
      .withColumn("sum_w", expr("sum(weight) OVER ()"))
      .withColumn("budget", expr(s"(sum(n_tokens) OVER ()) div $denom"))
      .withColumn("target_tokens",
        when(col("sum_w") <= 0L, lit(0L)).otherwise(expr(
          """CAST(CAST(budget AS DECIMAL(38,0)) *
            CAST(weight AS DECIMAL(38,0)) div
            CAST(sum_w AS DECIMAL(38,0)) AS BIGINT)""")))
      .withColumn("frac_micro",
        when(col("n_tokens") <= 0L, lit(0L)).otherwise(
          least(lit(1000000L), expr(
            """CAST(CAST(target_tokens AS DECIMAL(38,0)) * 1000000 div
              CAST(n_tokens AS DECIMAL(38,0)) AS BIGINT)"""))))
    val sel = hist
      .join(broadcast(planned.select(col("source"), col("frac_micro"))),
        "source")
      .filter(col("h") < col("frac_micro"))
      .groupBy(col("source"))
      .agg(sum(col("c")).as("sel_docs"), sum(col("t")).as("sel_tokens"))
    planned.join(sel, Seq("source"), "left")
      .select(col("source"), col("n_docs"), col("n_tokens"),
        col("weight"), col("target_tokens"), col("frac_micro"),
        coalesce(col("sel_docs"), lit(0L)).as("sel_docs"),
        coalesce(col("sel_tokens"), lit(0L)).as("sel_tokens"))
      .orderBy(col("source"))
  }

  /** e6: hash-range buckets for the two-pass global rank. PHYSICAL
    * knob only — [[orderPositions]]' output is invariant to it (the
    * spec proves B=4 ≡ B=64), because position is the rank in the
    * total order (h, doc_id) and buckets are contiguous h-ranges.
    * Production sets B ≈ n/1M so each intra-bucket sort fits a task;
    * the order hash is uniform by construction, so buckets are
    * BALANCED at any corpus size — no value-range skew is possible,
    * which is exactly what a range-partitioned sort on a data column
    * cannot promise. Must be a power of two (divides 16^15 = 2^60). */
  val OrderBuckets = 64

  /** e6: docs per output chunk — the unit a training loader streams
    * (production: one shuffled output file per chunk). */
  val OrderChunkDocs = 100L

  /** e6's deterministic order hash in [0, 2^60): d8/e4's cross-engine
    * md5 idiom under its own salt ("ord|"), so the training order is
    * independent of the split hash (content fp) and the mixture hash
    * — shuffling never correlates with admission or sampling. */
  def ordHash(docId: Column): Column =
    conv(substring(md5(concat(lit("ord|"), docId.cast("string"))
      .cast("binary")), 1, 15), 16, 10).cast("long")

  /** e6: deterministic GLOBAL shuffle order without a global sort.
    *
    * A training run wants every epoch's document order pseudo-random,
    * reproducible from a seed, and computable at 100 TB — but
    * `row_number() OVER (ORDER BY h)` funnels the whole corpus through
    * one reducer's window. Two passes over bucketed hash ranges give
    * the identical ranks with no single-task bottleneck:
    *
    *  1. bucket = h div (2^60/B) — contiguous hash ranges, balanced
    *     by hash uniformity; per-bucket COUNTS roll up map-side and
    *     an exclusive prefix sum over the ≤B-row count frame (one
    *     bounded single-partition window, e4's totals idiom) yields
    *     each bucket's global offset;
    *  2. rank within bucket ordered by (h, doc_id) — B independent
    *     window partitions — plus the broadcast offset.
    *
    * position = offset + intra_rank − 1 equals the global rank in the
    * (h, doc_id) total order for ANY B, so the bucket count is purely
    * physical tuning (doc_id breaks the h total order's ties, so the
    * result is deterministic even under a 60-bit hash collision). */
  def orderPositions(docs: DataFrame, buckets: Int = OrderBuckets,
      chunkDocs: Long = OrderChunkDocs): DataFrame = {
    require(buckets > 0 && (buckets & (buckets - 1)) == 0,
      s"OrderBuckets must be a power of two, got $buckets")
    val width = (1L << 60) / buckets
    val hashed = docs.withColumn("h", ordHash(col("doc_id")))
      .withColumn("bucket", expr(s"h div $width"))
    val offsets = hashed.groupBy(col("bucket"))
      .agg(count(lit(1)).as("bc"))
      .withColumn("offset", coalesce(
        sum(col("bc")).over(Window.orderBy(col("bucket"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("bucket"), col("offset"))
    val wIntra = Window.partitionBy(col("bucket"))
      .orderBy(col("h"), col("doc_id"))
    hashed.join(broadcast(offsets), "bucket")
      .withColumn("position",
        col("offset") + row_number().over(wIntra) - 1L)
      .withColumn("chunk", expr(s"position div $chunkDocs"))
      .drop("bucket", "offset")
  }

  /** e3's shard layout over a frame of (doc_id, split, n_tokens):
    * within (split, doc_id div macroDocs) ordered by doc_id, a doc
    * joins shard floor(prefix_before / budget). Exact ROWS frame and
    * integer `div` so the map is bit-identical to the DuckDB twin
    * regardless of engine float semantics or (hypothetical) doc_id
    * ties. Parameterized so the macro boundary is testable below the
    * production [[ShardMacroDocs]] width. */
  def shardManifest(docs: DataFrame, budget: Long,
      macroDocs: Long): DataFrame = {
    val w = Window
      .partitionBy(col("split"), col("macro_shard"))
      .orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs
      .withColumn("macro_shard", expr(s"doc_id div $macroDocs"))
      .withColumn("cum", sum(col("n_tokens")).over(w))
      .withColumn("shard_seq",
        expr(s"(cum - n_tokens) div $budget"))
      .groupBy(col("split"), col("macro_shard"), col("shard_seq"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("n_tokens"),
        min(col("doc_id")).as("min_doc_id"),
        max(col("doc_id")).as("max_doc_id"))
      .orderBy(col("split"), col("macro_shard"), col("shard_seq"))
  }

  val defs: Map[String, QueryDef] = Map(
    "e1_training_pipeline" -> QueryDef(
      (s, dir) => ledgerFrame(s, dir).orderBy(col("doc_id")),
      Some(s"WITH $ledgerSqlCtes\n$ledgerSqlSelect\nORDER BY dd.doc_id")),

    // ---- e2: corpus card — the DATASHEET a corpus release ships with
    //      (Gebru et al.'s "Datasheets for Datasets", reduced to the
    //      measurable corpus-level facts): composition counts, token
    //      volume, the quality-score distribution, exact-dup rate and
    //      benchmark-contamination rate. Long (metric, value) rows so
    //      the schema never changes when metrics are added.
    //
    //      Every number reuses a standalone operator's shared kernel
    //      (t2's scorer, d1/e1's normalized fingerprint, d7's eval
    //      n-gram containment) — the card cannot drift from the
    //      operators it summarizes. Scale shape: three aggregation
    //      passes (one over the quality projection, one over distinct
    //      fingerprints, one over the gated contamination join), each
    //      a map-side-combined groupBy-less agg; the single-row frames
    //      cross-join (1×1×1) and melt with stack. No driver loops,
    //      no all-pairs anything.
    "e2_corpus_card" -> QueryDef(
      (s, dir) => {
        import graft.dedup.DedupQueries.DecontamEvalMod
        val docs = Tables.table(s, dir, "documents")
        val isEval = col("doc_id") % DecontamEvalMod === 0
        // floor(x*1e6+0.5)/1e6, NOT round(): the qualityFrame idiom —
        // pure IEEE ops, bit-identical across engines at exact .5e-6
        // boundaries where round() implementations differ
        def r6(c: org.apache.spark.sql.Column) =
          floor(c * 1e6 + 0.5) / 1e6
        val q = TextQueries.qualityOf(docs)
        val base = q.agg(
          count(lit(1)).cast("double").as("n_docs"),
          countDistinct(col("source")).cast("double").as("n_sources"),
          countDistinct(col("lang")).cast("double").as("n_langs"),
          sum(col("n_words")).cast("double").as("total_words"),
          r6(avg(col("n_words"))).as("mean_words_per_doc"),
          r6(avg(col("quality_score"))).as("mean_quality"),
          r6(avg((col("quality_score") >= PipelineMinQuality)
            .cast("double"))).as("quality_pass_rate"))
        val fps = docs.select(md5(Text.normText(col("text"))).as("fp"))
          .filter(col("fp").isNotNull)
        val dup = fps.agg(
          count(lit(1)).cast("double").as("n_fp_docs"),
          countDistinct(col("fp")).cast("double").as("n_distinct_fp"))
        // d7's containment, reduced to the contaminated-doc count over
        // the shared materialized shingle checkpoint — EvalGrams-gated
        // like d7/e1 (exact broadcast below the gate, bloom + confirm
        // above; same exact count either way)
        val hitIds = graft.dedup.EvalGrams.sharedCounts(
            graft.dedup.DedupQueries.decontamShingled(s, dir)
              .filter(!isEval),
            graft.dedup.DedupQueries.evalGramSet(s, dir))
          .select(col("doc_id"))
          .withColumn("hit", lit(1))
        val cont = docs.filter(!isEval).select(col("doc_id"))
          .join(hitIds, Seq("doc_id"), "left")
          .agg(
            count(lit(1)).cast("double").as("n_train_docs"),
            sum(coalesce(col("hit"), lit(0)).cast("double"))
              .as("n_contaminated"))
        base.crossJoin(dup).crossJoin(cont)
          .select(expr(s"""stack(9,
            'n_docs', n_docs,
            'n_sources', n_sources,
            'n_langs', n_langs,
            'total_words', total_words,
            'mean_words_per_doc', mean_words_per_doc,
            'mean_quality', mean_quality,
            'quality_pass_rate', quality_pass_rate,
            'exact_dup_rate',
              floor((n_fp_docs - n_distinct_fp) / nullif(n_fp_docs, 0)
                * 1e6 + 0.5) / 1e6,
            'contamination_rate',
              floor(n_contaminated / nullif(n_train_docs, 0)
                * 1e6 + 0.5) / 1e6)
            AS (metric, value)"""))
          .orderBy(col("metric"))
      },
      Some {
        import graft.dedup.DedupQueries.{DecontamEvalMod, DecontamN}
        val wordsSqlDuck = "regexp_extract_all(lower(text), '[a-z0-9]+')"
        val shingles =
          s"""CASE WHEN len($wordsSqlDuck) >= $DecontamN THEN
            list_distinct(list_transform(range(0, len($wordsSqlDuck) - ${DecontamN - 1}),
              j -> array_to_string(list_slice($wordsSqlDuck, j+1, j+$DecontamN), ' ')))
          ELSE [] END"""
        s"""WITH ${TextQueries.qualitySqlCte},
        qd2 AS (
          SELECT q.doc_id, q.n_words, q.quality_score, d.source, d.lang
          FROM q JOIN documents d USING (doc_id)
        ), base AS (
          SELECT CAST(count(*) AS DOUBLE) AS n_docs,
            CAST(count(DISTINCT source) AS DOUBLE) AS n_sources,
            CAST(count(DISTINCT lang) AS DOUBLE) AS n_langs,
            CAST(sum(n_words) AS DOUBLE) AS total_words,
            floor(avg(CAST(n_words AS DOUBLE)) * 1e6 + 0.5) / 1e6
              AS mean_words_per_doc,
            floor(avg(quality_score) * 1e6 + 0.5) / 1e6 AS mean_quality,
            floor(avg(CAST(quality_score >= $PipelineMinQuality AS DOUBLE))
              * 1e6 + 0.5) / 1e6 AS quality_pass_rate
          FROM qd2
        ), fps AS (
          SELECT md5(trim(regexp_replace(regexp_replace(lower(text),
            '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g'))) AS fp
          FROM documents
          WHERE text IS NOT NULL
        ), dup AS (
          SELECT CAST(count(*) AS DOUBLE) AS n_fp_docs,
            CAST(count(DISTINCT fp) AS DOUBLE) AS n_distinct_fp
          FROM fps
        ), gg AS (
          SELECT doc_id, unnest($shingles) AS g FROM documents
        ), ev AS (
          SELECT DISTINCT g FROM gg WHERE doc_id % $DecontamEvalMod = 0
        ), contdocs AS (
          SELECT DISTINCT gg.doc_id FROM gg JOIN ev USING (g)
          WHERE gg.doc_id % $DecontamEvalMod <> 0
        ), cont AS (
          SELECT CAST(count(*) AS DOUBLE) AS n_train_docs,
            CAST(sum(CASE WHEN c.doc_id IS NOT NULL THEN 1 ELSE 0 END)
              AS DOUBLE) AS n_contaminated
          FROM documents d LEFT JOIN contdocs c USING (doc_id)
          WHERE d.doc_id % $DecontamEvalMod <> 0
        ), card AS (
          SELECT * FROM base, dup, cont
        )
        SELECT metric, value FROM (
          SELECT 'n_docs' AS metric, n_docs AS value FROM card
          UNION ALL SELECT 'n_sources', n_sources FROM card
          UNION ALL SELECT 'n_langs', n_langs FROM card
          UNION ALL SELECT 'total_words', total_words FROM card
          UNION ALL SELECT 'mean_words_per_doc', mean_words_per_doc FROM card
          UNION ALL SELECT 'mean_quality', mean_quality FROM card
          UNION ALL SELECT 'quality_pass_rate', quality_pass_rate FROM card
          UNION ALL SELECT 'exact_dup_rate',
            floor((n_fp_docs - n_distinct_fp) / nullif(n_fp_docs, 0)
              * 1e6 + 0.5) / 1e6
            FROM card
          UNION ALL SELECT 'contamination_rate',
            floor(n_contaminated / nullif(n_train_docs, 0) * 1e6 + 0.5) / 1e6
            FROM card
        ) ORDER BY metric"""
      }),

    // ---- e3: shard manifest — the pipeline's LAST MILE: the e1
    //      survivors (final_keep = 1) assigned to token-budgeted
    //      training shards per split, emitted as the manifest a
    //      training job consumes (shard → doc count, token count, id
    //      range). Deterministic: docs are laid out by doc_id within
    //      (split, macro_shard) and cut every [[ShardTokenBudget]]
    //      cumulative tokens, so any engine/partitioning produces the
    //      identical shard map.
    //
    //      Scale shape (t8's lesson applied): the prefix-sum window is
    //      partitioned by (split, doc_id div [[ShardMacroDocs]]), so
    //      ONE window partition never holds more than ShardMacroDocs
    //      slim (doc_id, n_tokens) rows no matter how large the
    //      corpus — a 50-TB split shards as parallel macro tasks, and
    //      a shard never spans a macro boundary (bounded padding waste
    //      per 1M docs). The manifest agg is a map-side-combined
    //      groupBy over the same keys.
    "e3_shard_manifest" -> QueryDef(
      (s, dir) => shardManifest(
        admittedSlim(s, dir)
          .select(col("doc_id"), col("split"), col("n_tokens")),
        ShardTokenBudget, ShardMacroDocs),
      Some(s"""WITH $ledgerSqlCtes,
      ledger AS ($ledgerSqlSelect),
      adm AS (
        SELECT l.doc_id, l.split,
          coalesce(CAST(len(regexp_extract_all(d.text,
            '[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]')) AS BIGINT), 0) AS n_tokens,
          l.doc_id // $ShardMacroDocs AS macro_shard
        FROM ledger l JOIN documents d USING (doc_id)
        WHERE l.final_keep = 1
      ), c AS (
        SELECT doc_id, split, macro_shard, n_tokens,
          sum(n_tokens) OVER (PARTITION BY split, macro_shard
            ORDER BY doc_id ROWS UNBOUNDED PRECEDING) AS cum
        FROM adm
      )
      SELECT split, CAST(macro_shard AS BIGINT) AS macro_shard,
        CAST((cum - n_tokens) // $ShardTokenBudget AS BIGINT) AS shard_seq,
        count(*) AS n_docs,
        CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
        min(doc_id) AS min_doc_id,
        max(doc_id) AS max_doc_id
      FROM c
      GROUP BY 1, 2, 3
      ORDER BY split, macro_shard, shard_seq""")),

    // ---- e4: mixture manifest — the SAMPLING PLAN a training run
    //      consumes: the admitted train pool (e1's final_keep = 1,
    //      split = 'train') re-balanced across sources by
    //      temperature-smoothed sampling (τ=2 → weight ∝ √tokens, the
    //      published multilingual-LM practice: heads damped, tails
    //      boosted) under a scale-free token budget
    //      (pool div [[MixtureBudgetDenom]]). Output: one row per
    //      source with the pool stats, the integer-exact plan
    //      (weight, target_tokens, frac_micro) and the REALIZED
    //      selection (sel_docs, sel_tokens) under the deterministic
    //      per-doc hash threshold — any engine reproduces the same
    //      selected set from (doc_id, frac_micro) alone, so the plan
    //      row is the artifact a fleet ships, not a doc list.
    //
    //      Scale shape: ledger + one slim projection; then everything
    //      runs on the bounded (source, h) histogram — see
    //      [[mixtureManifest]]. No second corpus scan, no collect.
    //      Complement of t7_mixture_sample: t7 APPLIES fixed config
    //      rates per language; e4 DERIVES the per-source plan from the
    //      corpus itself (its salted hash is independent of t7's, so
    //      composing them never correlates the two samples).
    "e4_mixture_manifest" -> QueryDef(
      (s, dir) => mixtureManifest(e4Hist(s, dir), MixtureBudgetDenom),
      Some(s"""WITH $ledgerSqlCtes,
      ledger AS ($ledgerSqlSelect),
      $mixturePlanSqlCtes,
      sel AS (
        SELECT hist.source, CAST(sum(c) AS BIGINT) AS sel_docs,
          CAST(sum(t) AS BIGINT) AS sel_tokens
        FROM hist JOIN plan2 USING (source)
        WHERE h < frac_micro
        GROUP BY 1
      )
      SELECT p.source, p.n_docs, p.n_tokens, p.weight, p.target_tokens,
        p.frac_micro,
        coalesce(s.sel_docs, 0) AS sel_docs,
        coalesce(s.sel_tokens, 0) AS sel_tokens
      FROM plan2 p LEFT JOIN sel s USING (source)
      ORDER BY p.source""")),

    // ---- e5: epoch / repetition plan — e4 fixed WHAT share of each
    //      source to sample; e5 fixes HOW MANY TIMES the source must
    //      be traversed to fill that target when the pool is smaller
    //      than the target (sampling WITH repetition — e4's frac
    //      saturates at 1e6 and cannot oversample). Repetition is
    //      capped at [[EpochCap]] epochs (the data-constrained-scaling
    //      practice); the un-fillable remainder is reported as an
    //      explicit per-source shortfall, not silently dropped — the
    //      number a data team uses to decide whether to go find more
    //      of that source. Row-local math over the plan's S rows; the
    //      corpus is never touched beyond e4's shared histogram.
    "e5_epoch_plan" -> QueryDef(
      (s, dir) => epochPlan(
        mixtureManifest(e4Hist(s, dir), MixtureBudgetDenom)),
      Some(s"""WITH $ledgerSqlCtes,
      ledger AS ($ledgerSqlSelect),
      $mixturePlanSqlCtes
      SELECT source, n_tokens, target_tokens,
        CASE WHEN n_tokens <= 0 THEN 0
          ELSE least(${EpochCap * 1000000L},
            CAST(CAST(target_tokens AS HUGEINT) * 1000000
              // n_tokens AS BIGINT)) END AS epochs_micro,
        CAST(least(CAST(target_tokens AS HUGEINT),
          CAST(n_tokens AS HUGEINT) * $EpochCap) AS BIGINT)
          AS planned_tokens,
        target_tokens - CAST(least(CAST(target_tokens AS HUGEINT),
          CAST(n_tokens AS HUGEINT) * $EpochCap) AS BIGINT)
          AS shortfall_tokens,
        CAST(target_tokens > CAST(least(CAST(target_tokens AS HUGEINT),
          CAST(n_tokens AS HUGEINT) * $EpochCap) AS BIGINT) AS BIGINT)
          AS capped
      FROM plan2 ORDER BY source""")),

    // ---- e6: training order — the deterministic GLOBAL shuffle of
    //      the admitted train pool. Epoch-order randomization is the
    //      one export step that naively needs a total sort (a single
    //      reducer at 100 TB); [[orderPositions]] computes the exact
    //      global rank in the salted-hash order with two bounded
    //      passes instead (hash-range buckets + offset prefix sum) —
    //      the bucket count is physical-only, the (position, chunk)
    //      output is bit-identical at any B and on any engine. Chunks
    //      are the loader's streaming unit: within a chunk docs are
    //      already in hash order, so any prefix of chunks is itself an
    //      unbiased sample of the corpus — a property sequential
    //      doc_id sharding (e3's layout, optimized for locality, not
    //      randomness) deliberately does not have.
    "e6_training_order" -> QueryDef(
      (s, dir) => orderPositions(
        admittedSlim(s, dir).filter(col("split") === "train")
          .select(col("doc_id"), col("source")))
        .select(col("doc_id"), col("source"), col("h"),
          col("position"), col("chunk"))
        .orderBy(col("position")),
      Some(s"""WITH $ledgerSqlCtes,
      ledger AS ($ledgerSqlSelect),
      adm AS (
        SELECT l.doc_id, coalesce(d.source, '') AS source,
          CAST(('0x' || substr(md5('ord|' || CAST(l.doc_id AS VARCHAR)),
            1, 15)) AS BIGINT) AS h
        FROM ledger l JOIN documents d USING (doc_id)
        WHERE l.final_keep = 1 AND l.split = 'train'
      )
      SELECT doc_id, source, h,
        row_number() OVER (ORDER BY h, doc_id) - 1 AS position,
        (row_number() OVER (ORDER BY h, doc_id) - 1) // $OrderChunkDocs
          AS chunk
      FROM adm ORDER BY position""")),

    // ---- e7: effective-token accounting — the "how much UNIQUE data
    //      do I actually have" report that decides whether a source is
    //      worth crawling harder: per source, raw docs/tokens next to
    //      the tokens sitting in non-canonical near-dup cluster members
    //      (d6's clusters, d13's keep-the-highest-quality choice — the
    //      SAME shared kernels, so "duplicate" means exactly what the
    //      dedup pass ships) and the effective tokens a training run
    //      would see after canonicalization. Cost on top of the shared
    //      d2 pair table: the row-wise token projection + d13's slim
    //      cluster window + ONE source-keyed agg — the corpus text is
    //      touched once, the report frame is catalog-sized. dup share
    //      in integer micro (truncating div, NULL on a zero-token
    //      source, never divide-by-zero).
    "e7_effective_tokens" -> QueryDef(
      (s, dir) => {
        import graft.dedup.DedupQueries
        val docs = Tables.table(s, dir, "documents")
          .select(col("doc_id"),
            coalesce(col("source"), lit("")).as("source"),
            coalesce(Text.bpeTokenCount(col("text")).cast("long"),
              lit(0L)).as("n_tokens"))
        // the ONE canonical-choice kernel (d13's), never re-derived
        val kept = DedupQueries.qualityCanonical(s, dir)
          .select(col("doc_id"), col("is_kept"))
        docs.join(kept, "doc_id")
          .groupBy(col("source"))
          .agg(count(lit(1)).as("n_docs"),
            sum(col("n_tokens")).as("n_tokens"),
            sum(when(col("is_kept") === 0L, 1L).otherwise(0L))
              .as("n_dup_docs"),
            sum(when(col("is_kept") === 0L, col("n_tokens"))
              .otherwise(0L)).as("dup_tokens"))
          .withColumn("effective_tokens",
            col("n_tokens") - col("dup_tokens"))
          .withColumn("dup_token_micro",
            // DECIMAL(38,0) numerator (the e8-checksum posture): a
            // LONG dup_tokens*1e6 throws under ANSI once a source
            // passes ~9.2e12 tokens — inside the 100-TB envelope
            expr("""CAST(CAST(dup_tokens AS DECIMAL(38,0)) * 1000000
              div nullif(CAST(n_tokens AS DECIMAL(38,0)), 0) AS BIGINT)"""))
          .orderBy(col("source"))
      },
      Some {
        val d2CoreSql = graft.dedup.DedupQueries.d2CoreSql
        s"""WITH RECURSIVE $d2CoreSql,
      ${graft.dedup.DedupQueries.ccRankedSqlCtes},
      tok AS (
        SELECT doc_id, coalesce(source, '') AS source,
          coalesce(CAST(len(regexp_extract_all(text,
            '[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]')) AS BIGINT), 0) AS n_tokens
        FROM documents
      )
      SELECT t.source,
        count(*) AS n_docs,
        CAST(sum(t.n_tokens) AS BIGINT) AS n_tokens,
        CAST(sum(CASE WHEN r.rn <> 1 THEN 1 ELSE 0 END) AS BIGINT)
          AS n_dup_docs,
        CAST(sum(CASE WHEN r.rn <> 1 THEN t.n_tokens ELSE 0 END)
          AS BIGINT) AS dup_tokens,
        CAST(sum(t.n_tokens) - sum(CASE WHEN r.rn <> 1 THEN t.n_tokens
          ELSE 0 END) AS BIGINT) AS effective_tokens,
        CAST(sum(CASE WHEN r.rn <> 1 THEN t.n_tokens ELSE 0 END)
          * 1000000 // nullif(sum(t.n_tokens), 0) AS BIGINT)
          AS dup_token_micro
      FROM tok t JOIN ranked r USING (doc_id)
      GROUP BY t.source ORDER BY t.source"""
      }),

    // ---- e8: release manifest — the reproducibility record a dataset
    //      release ships (and d16 diffs the next vintage against): per
    //      source and a grand '__total__' row, doc/token volume, the
    //      id range, null-payload count, and an ORDER-INVARIANT content
    //      checksum (sum of per-doc 60-bit md5 prefixes in
    //      DECIMAL(38,0), folded mod 1e18) — commutative, so the same
    //      corpus hashes identically under any partitioning, executor
    //      count or row order, and any single changed byte moves it.
    //      One row-local projection + one ROLLUP agg pass; the manifest
    //      frame is catalog-sized at any corpus scale.
    "e8_release_manifest" -> QueryDef(
      (s, dir) => {
        val perDoc = Tables.table(s, dir, "documents")
          .select(col("doc_id"),
            coalesce(col("source"), lit("")).as("source"),
            col("text").isNull.cast("long").as("is_null_text"),
            coalesce(Text.bpeTokenCount(col("text")).cast("long"),
              lit(0L)).as("n_tokens"),
            conv(substring(md5(coalesce(col("text"), lit(""))), 1, 15),
              16, 10).cast("long").as("h"))
        perDoc
          .rollup(col("source"))
          .agg(count(lit(1)).as("n_docs"),
            sum(col("is_null_text")).as("n_null_text"),
            sum(col("n_tokens")).as("n_tokens"),
            min(col("doc_id")).as("min_doc_id"),
            max(col("doc_id")).as("max_doc_id"),
            (sum(col("h").cast("decimal(38,0)")) %
              lit(1000000000000000000L).cast("decimal(38,0)"))
              .cast("long").as("content_checksum"))
          .withColumn("source", coalesce(col("source"), lit("__total__")))
          .orderBy(col("source"))
      },
      Some("""WITH perdoc AS (
        SELECT doc_id, coalesce(source, '') AS source,
          CAST(text IS NULL AS BIGINT) AS is_null_text,
          coalesce(CAST(len(regexp_extract_all(text,
            '[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]')) AS BIGINT), 0) AS n_tokens,
          CAST(('0x' || substr(md5(coalesce(text, '')), 1, 15)) AS BIGINT)
            AS h
        FROM documents
      )
      SELECT coalesce(source, '__total__') AS source,
        count(*) AS n_docs,
        CAST(sum(is_null_text) AS BIGINT) AS n_null_text,
        CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
        min(doc_id) AS min_doc_id,
        max(doc_id) AS max_doc_id,
        CAST(sum(CAST(h AS HUGEINT)) % 1000000000000000000 AS BIGINT)
          AS content_checksum
      FROM perdoc GROUP BY ROLLUP(source)
      ORDER BY coalesce(source, '__total__')""")),

    // ---- e9: curriculum buckets — the quality-stratified view of the
    //      admitted train pool (e4 slices it by SOURCE; a curriculum or
    //      quality-upweighting pass slices it by QUALITY): per (source,
    //      quality decile) the doc/token volume, each bucket's integer-
    //      micro share of its source, and the cumulative tokens from
    //      the TOP decile down — the number a keep-the-best-share cut or
    //      a quality-annealed schedule reads directly. Bucket = t2's
    //      shared score x10 floored (identical IEEE doubles in both
    //      engines, so the decile edges agree exactly). One join of two
    //      shared artifacts (ledger x admittedSlim), one agg, two
    //      windows over a frame bounded by #sources x 10 rows at any
    //      corpus size.
    "e9_curriculum_buckets" -> QueryDef(
      (s, dir) => {
        val q = ledgerFrame(s, dir)
          .filter(col("final_keep") === 1L && col("split") === "train")
          .select(col("doc_id"), col("quality_score"))
        val slim = admittedSlim(s, dir).filter(col("split") === "train")
          .select(col("doc_id"), col("source"), col("n_tokens"))
        val bucketed = slim.join(q, "doc_id")
          .withColumn("bucket",
            least(floor(col("quality_score") * 10), lit(9.0)).cast("long"))
          .groupBy(col("source"), col("bucket"))
          .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("n_tokens"))
        val wCum = Window.partitionBy(col("source"))
          .orderBy(col("bucket").desc)
        bucketed
          .withColumn("cum_tokens_from_top",
            sum(col("n_tokens")).over(wCum))
          .withColumn("share_micro", expr(
            // DECIMAL(38,0) numerator — same ANSI-overflow guard as e7
            """CAST(CAST(n_tokens AS DECIMAL(38,0)) * 1000000 div
              nullif(CAST(sum(n_tokens) OVER (PARTITION BY source)
                AS DECIMAL(38,0)), 0) AS BIGINT)"""))
          .orderBy(col("source"), col("bucket"))
      },
      Some(s"""WITH $ledgerSqlCtes,
      ledger AS ($ledgerSqlSelect),
      adm AS (
        SELECT l.doc_id, coalesce(d.source, '') AS source,
          l.quality_score,
          coalesce(CAST(len(regexp_extract_all(d.text,
            '[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]')) AS BIGINT), 0) AS n_tokens
        FROM ledger l JOIN documents d USING (doc_id)
        WHERE l.final_keep = 1 AND l.split = 'train'
      ), bucketed AS (
        SELECT source,
          CAST(least(floor(quality_score * 10), 9.0) AS BIGINT) AS bucket,
          count(*) AS n_docs,
          CAST(sum(n_tokens) AS BIGINT) AS n_tokens
        FROM adm GROUP BY 1, 2
      )
      SELECT source, bucket, n_docs, n_tokens,
        CAST(sum(n_tokens) OVER (PARTITION BY source ORDER BY bucket DESC)
          AS BIGINT) AS cum_tokens_from_top,
        CAST(CAST(n_tokens AS HUGEINT) * 1000000 //
          nullif(sum(n_tokens) OVER (PARTITION BY source), 0) AS BIGINT)
          AS share_micro
      FROM bucketed ORDER BY source, bucket""")),

    // ---- e10: dataloader resume manifest — the checkpoint/restart
    //      bookkeeping a long training run needs: for each checkpoint
    //      on a fixed fraction grid of the train pool's token volume
    //      ([[ResumeGridPct]]), WHERE in e3's deterministic shard
    //      layout does consumption stand — the shard the run is
    //      inside, how many shards/docs are fully behind it, and how
    //      many tokens into the current shard the cursor sits. A crash
    //      at step K resumes from (shard, offset) without replaying
    //      the corpus, and the answer is a pure function of the shard
    //      manifest, so every rank computes the same cursor.
    //
    //      Scale shape: everything runs on e3's shard manifest, which
    //      is metadata-sized BY CONSTRUCTION (pool_tokens/budget rows;
    //      a production budget keeps it thousands, not billions) — the
    //      global-order window and the 5-row grid cross-join never see
    //      corpus-proportional data, and the corpus itself is only
    //      touched through the shared materialized admittedSlim.
    "e10_resume_manifest" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        val shards = shardManifest(
          admittedSlim(s, dir)
            .filter(col("split") === "train")
            .select(col("doc_id"), col("split"), col("n_tokens")),
          ShardTokenBudget, ShardMacroDocs)
        val w = Window.orderBy(col("macro_shard"), col("shard_seq"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val ord = shards
          .withColumn("cum_end", sum(col("n_tokens")).over(w))
          .withColumn("cum_start", col("cum_end") - col("n_tokens"))
          .withColumn("docs_done",
            sum(col("n_docs")).over(w) - col("n_docs"))
          .withColumn("shards_done",
            row_number().over(Window.orderBy(col("macro_shard"),
              col("shard_seq"))).cast("long") - 1L)
        val tot = shards.agg(sum(col("n_tokens")).as("total"))
        val grid = ResumeGridPct.toDF("checkpoint_pct")
        grid.crossJoin(broadcast(tot))
          .withColumn("token_target",
            expr("total * checkpoint_pct div 100"))
          .join(broadcast(ord),
            col("token_target") >= col("cum_start") &&
              col("token_target") < col("cum_end"))
          .select(col("checkpoint_pct"), col("token_target"),
            col("macro_shard"), col("shard_seq"), col("shards_done"),
            col("docs_done"), col("cum_start"),
            (col("token_target") - col("cum_start"))
              .as("tokens_into_shard"))
          .orderBy(col("checkpoint_pct"))
      },
      Some(s"""WITH $ledgerSqlCtes,
      ledger AS ($ledgerSqlSelect),
      adm AS (
        SELECT l.doc_id, l.split,
          coalesce(CAST(len(regexp_extract_all(d.text,
            '[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]')) AS BIGINT), 0) AS n_tokens,
          l.doc_id // $ShardMacroDocs AS macro_shard
        FROM ledger l JOIN documents d USING (doc_id)
        WHERE l.final_keep = 1 AND l.split = 'train'
      ), c AS (
        SELECT doc_id, split, macro_shard, n_tokens,
          sum(n_tokens) OVER (PARTITION BY split, macro_shard
            ORDER BY doc_id ROWS UNBOUNDED PRECEDING) AS cum
        FROM adm
      ), shards AS (
        SELECT CAST(macro_shard AS BIGINT) AS macro_shard,
          CAST((cum - n_tokens) // $ShardTokenBudget AS BIGINT)
            AS shard_seq,
          count(*) AS n_docs,
          CAST(sum(n_tokens) AS BIGINT) AS n_tokens
        FROM c GROUP BY 1, 2
      ), ord AS (
        SELECT macro_shard, shard_seq, n_docs, n_tokens,
          CAST(sum(n_tokens) OVER o AS BIGINT) AS cum_end,
          CAST(sum(n_tokens) OVER o - n_tokens AS BIGINT) AS cum_start,
          CAST(sum(n_docs) OVER o - n_docs AS BIGINT) AS docs_done,
          CAST(row_number() OVER (ORDER BY macro_shard, shard_seq) - 1
            AS BIGINT) AS shards_done
        FROM shards
        WINDOW o AS (ORDER BY macro_shard, shard_seq
          ROWS UNBOUNDED PRECEDING)
      ), tot AS (SELECT CAST(sum(n_tokens) AS BIGINT) AS total FROM shards)
      SELECT CAST(g.pct AS BIGINT) AS checkpoint_pct,
        CAST(total * g.pct // 100 AS BIGINT) AS token_target,
        macro_shard, shard_seq, shards_done, docs_done, cum_start,
        CAST(total * g.pct // 100 - cum_start AS BIGINT)
          AS tokens_into_shard
      FROM (VALUES ${ResumeGridPct.map(p => s"($p)").mkString(", ")}) g(pct)
      CROSS JOIN tot
      JOIN ord ON total * g.pct // 100 >= cum_start
        AND total * g.pct // 100 < cum_end
      ORDER BY checkpoint_pct""")),

    // ---- e11: shard-integrity audit — the pre-flight check a
    //      training launch runs against e3's layout: does every
    //      admitted doc land in exactly one shard (doc/token totals
    //      reconcile against the pool), are shard id-ranges disjoint
    //      within each macro shard, and how far past the token budget
    //      does any shard run (a shard overruns by at most one doc BY
    //      CONSTRUCTION — assignment is by starting offset — so
    //      n_over_budget counts them and max_shard_tokens bounds the
    //      overshoot; a zero-doc gap or an overlap means layout
    //      corruption). All audit math runs on the MANIFEST
    //      (metadata-sized: pool_tokens/budget rows) and the per-split
    //      pool totals — the corpus is touched only through the shared
    //      [[admittedSlim]] artifact, and the lag window partitions by
    //      (split, macro_shard), never data-sized keys.
    "e11_shard_integrity" -> QueryDef(
      (s, dir) => {
        val slim = admittedSlim(s, dir)
          .select(col("doc_id"), col("split"), col("n_tokens"))
        val m = shardManifest(slim, ShardTokenBudget, ShardMacroDocs)
        val pool = slim.groupBy(col("split"))
          .agg(count(lit(1)).as("pool_docs"),
            sum(col("n_tokens")).as("pool_tokens"))
        val wm = Window.partitionBy(col("split"), col("macro_shard"))
          .orderBy(col("shard_seq"))
        m.withColumn("prev_max", lag(col("max_doc_id"), 1).over(wm))
          .withColumn("overlap", when(col("prev_max").isNotNull &&
            col("min_doc_id") <= col("prev_max"), 1L).otherwise(0L))
          .withColumn("over_budget",
            when(col("n_tokens") > ShardTokenBudget, 1L).otherwise(0L))
          .groupBy(col("split"))
          .agg(count(lit(1)).as("n_shards"),
            sum(col("n_docs")).as("n_docs"),
            sum(col("n_tokens")).as("n_tokens"),
            sum(col("over_budget")).as("n_over_budget"),
            sum(col("overlap")).as("n_range_overlaps"),
            max(col("n_tokens")).as("max_shard_tokens"))
          .join(pool, "split")
          .withColumn("docs_ok",
            (col("n_docs") === col("pool_docs")).cast("long"))
          .withColumn("tokens_ok",
            (col("n_tokens") === col("pool_tokens")).cast("long"))
          .select(col("split"), col("n_shards"), col("n_docs"),
            col("n_tokens"), col("pool_docs"), col("pool_tokens"),
            col("docs_ok"), col("tokens_ok"), col("n_over_budget"),
            col("n_range_overlaps"), col("max_shard_tokens"))
          .orderBy(col("split"))
      },
      Some(s"""WITH $ledgerSqlCtes,
      ledger AS ($ledgerSqlSelect),
      adm AS (
        SELECT l.doc_id, l.split,
          coalesce(CAST(len(regexp_extract_all(d.text,
            '[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]')) AS BIGINT), 0) AS n_tokens,
          l.doc_id // $ShardMacroDocs AS macro_shard
        FROM ledger l JOIN documents d USING (doc_id)
        WHERE l.final_keep = 1
      ), c AS (
        SELECT doc_id, split, macro_shard, n_tokens,
          sum(n_tokens) OVER (PARTITION BY split, macro_shard
            ORDER BY doc_id ROWS UNBOUNDED PRECEDING) AS cum
        FROM adm
      ), mft AS (
        SELECT split, CAST(macro_shard AS BIGINT) AS macro_shard,
          CAST((cum - n_tokens) // $ShardTokenBudget AS BIGINT)
            AS shard_seq,
          count(*) AS n_docs,
          CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
          min(doc_id) AS min_doc_id,
          max(doc_id) AS max_doc_id
        FROM c GROUP BY 1, 2, 3
      ), pool AS (
        SELECT split, count(*) AS pool_docs,
          CAST(sum(n_tokens) AS BIGINT) AS pool_tokens
        FROM adm GROUP BY 1
      ), aud AS (
        SELECT split, n_docs, n_tokens,
          CASE WHEN n_tokens > $ShardTokenBudget THEN 1 ELSE 0 END
            AS over_budget,
          CASE WHEN lag(max_doc_id) OVER (PARTITION BY split, macro_shard
              ORDER BY shard_seq) IS NOT NULL
            AND min_doc_id <= lag(max_doc_id) OVER
              (PARTITION BY split, macro_shard ORDER BY shard_seq)
            THEN 1 ELSE 0 END AS overlap
        FROM mft
      ), agg AS (
        SELECT split, count(*) AS n_shards,
          CAST(sum(n_docs) AS BIGINT) AS n_docs,
          CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
          CAST(sum(over_budget) AS BIGINT) AS n_over_budget,
          CAST(sum(overlap) AS BIGINT) AS n_range_overlaps,
          CAST(max(n_tokens) AS BIGINT) AS max_shard_tokens
        FROM aud GROUP BY 1
      )
      SELECT a.split, a.n_shards, a.n_docs, a.n_tokens,
        p.pool_docs, p.pool_tokens,
        CAST(a.n_docs = p.pool_docs AS BIGINT) AS docs_ok,
        CAST(a.n_tokens = p.pool_tokens AS BIGINT) AS tokens_ok,
        a.n_over_budget, a.n_range_overlaps, a.max_shard_tokens
      FROM agg a JOIN pool p USING (split)
      ORDER BY a.split"""))
  )
}
