package graft

import org.apache.spark.sql.SparkSession

/** Scale-leg invariant runner: engine-side replacement checks for the
  * queries whose DuckDB twins are out of contract at a given scale
  * (see d9's oracle note). `runMain graft.Check <sfDir> [check...]`
  * runs the named checks (default: all) and prints one
  * `CHECK <name> violations=<n>` line each — 0 means consistent. */
object Check {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val names =
      if (args.length > 1) args.drop(1).toSet else Set("d9_consistency")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS", cpus))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    if (names("d9_consistency")) {
      val v = dedup.DedupQueries.embeddingClusterViolations(spark, dir)
      println(s"CHECK d9_consistency violations=$v")
    }
    spark.stop()
  }
}
