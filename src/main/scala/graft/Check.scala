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
    // p16 sharded-melt A/B: times the single-job x30 melt against the
    // G-job sharded mode at this scale and verifies row equality — the
    // measurement behind the production default (PERF.md r14).
    if (names("p16_shard_ab")) {
      def time[A](f: => A): (A, Double) = {
        val t0 = System.nanoTime(); val a = f
        (a, (System.nanoTime() - t0) / 1e9)
      }
      // two alternating rounds: round 1 pays JVM/codegen/page-cache
      // warmup (order-biased), round 2 is the fair warm comparison
      for (round <- 1 to 2) {
        val (single, t1) = time(
          profile.ProfileQueries.approxFds(spark, dir).collect().toSeq
            .map(_.toSeq))
        val (sharded, t5) = time(
          profile.ProfileQueries.approxFds(spark, dir, meltShards = 5)
            .collect().toSeq.map(_.toSeq))
        println(f"CHECK p16_shard_ab round=$round single_s=$t1%.1f " +
          f"sharded5_s=$t5%.1f equal=${single == sharded}")
      }
    }
    // diagnostic: Bench drives queries via count(); quantify how much
    // of p16's plan count() lets Catalyst prune vs a full collect()
    if (names("p16_count_vs_collect")) {
      def time[A](f: => A): Double = {
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      val tc = time(profile.ProfileQueries.approxFds(spark, dir).count())
      val tl = time(profile.ProfileQueries.approxFds(spark, dir).collect())
      println(f"CHECK p16_count_vs_collect count_s=$tc%.1f collect_s=$tl%.1f")
    }
    spark.stop()
  }
}
