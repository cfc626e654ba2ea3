package graft.text

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.Tables

/** t17 readability: structural invariants plus a full driver-side
  * integer-model recount (the report is exact integer micro arithmetic,
  * so a Scala Long/BigInt model must reproduce it byte-for-byte —
  * including truncating division on negative Flesch scores). */
class ReadabilitySpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  private lazy val report =
    TextQueries.defs("t17_readability").fn(spark, sf).collect()

  private lazy val docs = Tables.table(spark, sf, "documents")
    .select(coalesce(col("source"), lit("")).as("source"), col("text"))
    .collect().map(r => (r.getString(0),
      if (r.isNullAt(1)) "" else r.getString(1)))

  /** The exact integer model of one doc's flesch_micro (None = no words). */
  private def fleschMicro(text: String): Option[Long] = {
    val nWords = "[a-z0-9]+".r.findAllIn(text.toLowerCase).length.toLong
    val nSent = "[.!?]+".r.findAllIn(text).length.toLong + 1L
    val nSyll = "[aeiouy]+".r.findAllIn(text.toLowerCase).length.toLong
    if (nWords == 0L) None
    else Some(206835000L
      - (1015L * (nWords * 1000000L / nSent)) / 1000L
      - (84600L * (nSyll * 1000000L / nWords)) / 1000L)
  }

  test("one row per source, counts complete, min <= mean <= max") {
    val sources = docs.map(_._1).distinct.sorted
    assert(report.map(_.getString(0)).toSeq === sources.toSeq)
    assert(report.map(_.getLong(1)).sum === docs.length.toLong)
    for (r <- report) {
      assert(r.getLong(2) <= r.getLong(1)) // n_scored <= n_docs
      if (r.getLong(2) > 0) {
        assert(r.getLong(4) <= r.getLong(3) && r.getLong(3) <= r.getLong(5),
          s"${r.getString(0)}: min/mean/max out of order")
      } else {
        assert(r.isNullAt(3) && r.isNullAt(4) && r.isNullAt(5))
      }
    }
  }

  test("report equals the driver-side exact integer model") {
    val model = docs.groupBy(_._1).map { case (src, ds) =>
      val scores = ds.flatMap(d => fleschMicro(d._2))
      val mean =
        if (scores.isEmpty) None
        else Some((scores.map(BigInt(_)).sum / scores.length).toLong)
      src -> (ds.length.toLong, scores.length.toLong, mean,
        scores.sorted.headOption, scores.sorted.lastOption)
    }
    for (r <- report) {
      val (nDocs, nScored, mean, mn, mx) = model(r.getString(0))
      assert(r.getLong(1) === nDocs)
      assert(r.getLong(2) === nScored)
      assert((if (r.isNullAt(3)) None else Some(r.getLong(3))) === mean)
      assert((if (r.isNullAt(4)) None else Some(r.getLong(4))) === mn)
      assert((if (r.isNullAt(5)) None else Some(r.getLong(5))) === mx)
    }
    // the synthetic corpus has no sentence punctuation: everything is a
    // run-on, so at least one source must carry a NEGATIVE min — the
    // truncating-div-on-negatives parity this spec exists to pin
    assert(report.exists(r => !r.isNullAt(4) && r.getLong(4) < 0L))
  }
}
