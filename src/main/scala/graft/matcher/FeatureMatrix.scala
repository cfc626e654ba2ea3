package graft.matcher

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.profile.ColumnProfiler
import graft.sources.Tables

/** Builds the per-column feature matrix feeding the semantic-type
  * classifier: the full [[ColumnProfiler]] profile joined with type
  * shares, one row per `table.column`. This replaces the reference's
  * driver-side List[(List[Double], String)] feature matrix (reference
  * TrainMlibSemanticTypeClassifier.scala:374-386) with a distributed
  * DataFrame end-to-end — at 100 TB the melt/aggregate runs on
  * executors and only O(#columns) profile rows ever reach the driver.
  */
object FeatureMatrix {

  /** Numeric feature column names, in assembler order. */
  val featureCols: Seq[String] = Seq(
    "prop_unique_vals", "prop_missing_vals", "ratio_alpha_chars",
    "prop_at_sign", "prop_currency", "prop_hyphen", "prop_paren",
    "mean_commas_per_entry", "mean_slashes_per_entry", "prop_range_format",
    "prop_numerical_chars", "prop_whitespace_chars", "is_discrete",
    "entropy_discrete", "shannon_entropy", "mean_len", "median_len",
    "mode_len", "min_len", "max_len",
    "share_int", "share_float", "share_bool", "share_date")

  /** Melt the given (table -> columns) map into one long-format frame
    * with `table.column`-qualified col_name. */
  def melted(spark: SparkSession, dir: String,
      tables: Seq[(String, Seq[String])]): DataFrame =
    tables.map { case (t, cols) =>
      ColumnProfiler.melt(Tables.table(spark, dir, t), cols)
        .select(concat(lit(t + "."), col("col_name")).as("col_name"),
          col("value"))
    }.reduce(_ unionByName _)

  /** Per-column sample cap for classifier features. The reference
    * computes matcher features on bounded samples, not full columns
    * (DataSetInterface.scala:214-295: first 4n rows, seeded sample of n
    * per column; type inference on <=100 values) — sampling IS the
    * semantics, and it is also what keeps the matcher leg O(#columns *
    * SampleN) at 100 TB. Hash-ordering replaces the seed so the sample
    * is deterministic under any partitioning. */
  val SampleN = 4000

  /** One row per column: col_name + all numeric features, computed on a
    * deterministic SampleN-value sample per column. The sampled melt is
    * persisted — profile + type shares make 5 aggregation passes, so
    * caching turns 5 source scans into 1. */
  /** Melt capped at SampleN deterministic values per column. */
  def sampledMelt(spark: SparkSession, dir: String,
      tables: Seq[(String, Seq[String])]): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("col_name"))
      .orderBy(xxhash64(col("value"), lit(42L)), col("value"))
    melted(spark, dir, tables)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= SampleN).drop("rn")
  }

  def features(spark: SparkSession, dir: String,
      tables: Seq[(String, Seq[String])]): DataFrame = {
    val m = sampledMelt(spark, dir, tables)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    ColumnProfiler.profile(m)
      .join(ColumnProfiler.typeShares(m), Seq("col_name"))
      .select(col("col_name") +: featureCols.map(c =>
        coalesce(col(c).cast("double"), lit(-1.0)).as(c)): _*)
  }
}
