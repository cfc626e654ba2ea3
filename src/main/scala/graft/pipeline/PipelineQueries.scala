package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
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

  /** e1's per-doc ledger (unordered) — shared with e3, which shards
    * the `final_keep = 1` survivors. */
  def ledgerFrame(s: SparkSession, dir: String): DataFrame = {
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
  private[pipeline] val ledgerSqlCtes: String = {
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
  private[pipeline] val ledgerSqlSelect: String = {
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
      (s, dir) => {
        val admitted = ledgerFrame(s, dir)
          .filter(col("final_keep") === 1L)
          .select(col("doc_id"), col("split"))
        val docs = Tables.table(s, dir, "documents")
          .join(admitted, "doc_id")
          // coalesce: an admitted null-text doc is a zero-token entry,
          // not a NULL that poisons the prefix sum
          .withColumn("n_tokens",
            coalesce(Text.bpeTokenCount(col("text")).cast("long"), lit(0L)))
        shardManifest(docs, ShardTokenBudget, ShardMacroDocs)
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
      )
      SELECT split, CAST(macro_shard AS BIGINT) AS macro_shard,
        CAST((cum - n_tokens) // $ShardTokenBudget AS BIGINT) AS shard_seq,
        count(*) AS n_docs,
        CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
        min(doc_id) AS min_doc_id,
        max(doc_id) AS max_doc_id
      FROM c
      GROUP BY 1, 2, 3
      ORDER BY split, macro_shard, shard_seq"""))
  )
}
