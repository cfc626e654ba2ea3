package graft.matcher

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Class-imbalance resampling over a labelled frame (reference matcher
  * train/ClassImbalanceResampler.scala:29-423). Strategies resize each
  * class to a target count (max/mean/median of class sizes).
  *
  * Scale note: the reference shuffles driver-held lists with seeded
  * Random. Here sampling is hash-ordered (`xxhash64(row-key, seed)`) —
  * deterministic for a given input and seed, independent of
  * partitioning, and fully distributed: downsampling takes the first n
  * rows in hash order, upsampling replicates rows round-robin via
  * `explode(sequence(...))`. Self-determinism (same input -> same
  * output) is the contract the reference's own tests assert
  * (SparkParallelSpec.scala:323-399); bit-compat with its Random is
  * neither possible nor required. */
object Resampler {

  sealed trait Strategy
  case object NoResampling extends Strategy
  case object UpsampleToMax extends Strategy
  case object ResampleToMean extends Strategy
  case object UpsampleToMean extends Strategy
  case object ResampleToMedian extends Strategy
  case object UpsampleToMedian extends Strategy
  /** Cap `unknown`-labelled rows at the number of known rows
    * (reference :381-392). */
  case object CapUnknownToHalf extends Strategy

  val DefaultSeed = 5123219L

  /** Resample `df` (must have `label` and a unique `col_name` row key)
    * so each class hits the strategy's target count. */
  def resample(df: DataFrame, strategy: Strategy,
      seed: Long = DefaultSeed): DataFrame = strategy match {
    case NoResampling => df
    case CapUnknownToHalf =>
      val known = df.filter(col("label") =!= "unknown")
      val cap = known.count()
      val unknown = df.filter(col("label") === "unknown")
        .withColumn("h", xxhash64(col("col_name"), lit(seed)))
        .withColumn("rn", row_number().over(Window.orderBy(col("h"))))
        .filter(col("rn") <= cap)
        .drop("h", "rn")
      known.unionByName(unknown)
    case s =>
      val counts = df.groupBy(col("label")).count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      val sizes = counts.values.toSeq.sorted
      val target = s match {
        case UpsampleToMax => sizes.max
        case ResampleToMean | UpsampleToMean =>
          math.max(1L, sizes.sum / sizes.size)
        case ResampleToMedian | UpsampleToMedian =>
          // reference averages the two middle sizes for an even class
          // count (ClassImbalanceResampler median semantics)
          val n = sizes.size
          if (n % 2 == 1) sizes(n / 2)
          else (sizes(n / 2 - 1) + sizes(n / 2)) / 2
        case _ => sizes.max
      }
      val upOnly = s == UpsampleToMax || s == UpsampleToMean ||
        s == UpsampleToMedian
      resizeClasses(df, counts, target, upOnly, seed)
  }

  private def resizeClasses(df: DataFrame, counts: Map[String, Long],
      target: Long, upOnly: Boolean, seed: Long): DataFrame = {
    val w = Window.partitionBy(col("label"))
      .orderBy(xxhash64(col("col_name"), lit(seed)))
    val withRn = df.withColumn("rn", row_number().over(w))
    val countCol = coalesce(
      typedLit(counts).apply(col("label")), lit(1L))
    // keep: all rows when the class is small or we never downsample;
    // otherwise the first `target` rows in hash order
    val keep =
      if (upOnly) lit(true)
      else countCol <= target || col("rn") <= target
    // replicate small classes round-robin: target/c copies each, plus one
    // extra for the first target%c rows in hash order
    val copies =
      when(countCol >= target, lit(1L)).otherwise(
        floor(lit(target) / countCol) +
          when(col("rn") - 1 < lit(target) % countCol, 1L).otherwise(0L))
    withRn.filter(keep)
      .withColumn("copies", copies)
      .withColumn("copy", explode(sequence(lit(1L), col("copies"))))
      .drop("rn", "copies", "copy")
  }

  /** Bagging (reference :186-205, 333-379): assign each value row of a
    * melted frame to one of `numBags` bags per column, in deterministic
    * hash order; bags then profile independently. Returns the melted
    * frame + `bag_id`. */
  def assignBags(melted: DataFrame, numBags: Int, seed: Long = 501L): DataFrame = {
    val w = Window.partitionBy(col("col_name"))
      .orderBy(xxhash64(col("value"), lit(seed)), col("value"))
    melted.withColumn("bag_id",
      ((row_number().over(w) - 1) % numBags).cast("long"))
  }
}
