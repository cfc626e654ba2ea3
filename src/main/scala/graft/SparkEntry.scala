package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  private val registries: Seq[Map[String, QueryDef]] = Seq(
    relational.RelationalQueries.defs,
    relational.WindowQueries.defs,
    relational.LayoutQueries.defs,
    profile.ProfileQueries.defs,
    text.TextQueries.defs,
    dedup.DedupQueries.defs,
    sim.SimilarityQueries.defs,
    matcher.MatcherQueries.defs,
    matcher.EvalQueries.defs,
    modeler.ModelerQueries.defs,
    multimodal.MultimodalQueries.defs,
    streaming.StreamingQueries.defs,
    pipeline.PipelineQueries.defs
  )

  private lazy val (qs, oracles) = QueryDef.split(registries: _*)

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    qs("q1_pricing_summary")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = qs

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = oracles
}
