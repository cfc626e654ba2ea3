package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.text.Text

/** Structured-Streaming quality filtering + PII redaction over a
  * document stream — the streaming face of the batch t2/t5/t6
  * operators, for continuously-arriving training data.
  *
  * Every expression here IS the batch expression (Text.piiScrub, the
  * same word/ratio arithmetic as t2/t6), applied per row: the pass is
  * stateless — no watermark, no state store, unbounded throughput — so
  * a stream and its batch backfill produce identical rows by
  * construction ([[StreamingQualitySpec]] pins that equality, the same
  * contract the banded-signature stream test pins for d2). */
object StreamingQuality {

  /** Quality-gate threshold on the t2-style score. */
  val MinQuality = 0.2

  private def r6(c: Column): Column = floor(c * 1e6 + 0.5) / 1e6

  /** Per-document quality decision + scrubbed text: input needs
    * (doc_id, text); emits (doc_id, n_words, quality_score, keep,
    * scrubbed). Works identically on a streaming or batch frame. */
  def qualityScrub(docs: DataFrame): DataFrame = {
    val stop = graft.text.TextQueries.enStopwords
      .map(w => s"'$w'").mkString(", ")
    docs
      .withColumn("w", Text.words(col("text")))
      .withColumn("n_words", size(col("w")).cast("long"))
      // nullif mirrors DuckDB's NULL on length-0 division (ANSI Spark
      // would throw on an empty doc) — see TextQueries.qualityFrame
      .withColumn("punct_ratio", round(
        length(regexp_replace(col("text"), "[A-Za-z0-9\\s]", ""))
          .cast("double") / nullif(length(col("text")), lit(0)), 6))
      .withColumn("stop_ratio", round(
        expr(s"size(filter(w, x -> x IN ($stop)))").cast("double") /
          greatest(size(col("w")), lit(1)), 6))
      .withColumn("quality_score",
        r6(least(col("n_words").cast("double") / 100.0, lit(1.0)) * 0.4 +
          (lit(1.0) - least(col("punct_ratio") * 5.0, lit(1.0))) * 0.3 +
          least(col("stop_ratio") * 5.0, lit(1.0)) * 0.3))
      // when/otherwise, not a bare cast: a NULL score (null-text doc)
      // must yield keep = 0 like the oracle's CASE, not keep = NULL
      .withColumn("keep",
        when(col("quality_score") >= MinQuality, 1L).otherwise(0L))
      .withColumn("scrubbed", Text.piiScrub(col("text")))
      .select(col("doc_id"), col("n_words"), col("quality_score"),
        col("keep"), col("scrubbed"))
  }
}
