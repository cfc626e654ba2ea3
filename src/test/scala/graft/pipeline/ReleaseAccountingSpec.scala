package graft.pipeline

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.Tables
import graft.text.Text

/** e7 effective-token accounting and e8 release manifest. */
class ReleaseAccountingSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  // ---- e7 ----

  private lazy val e7 =
    PipelineQueries.defs("e7_effective_tokens").fn(spark, sf).collect()

  test("e7: token identity, bounds, and corpus-complete counts") {
    val nDocs = Tables.table(spark, sf, "documents").count()
    assert(e7.map(_.getLong(1)).sum === nDocs)
    for (r <- e7) {
      assert(r.getLong(5) === r.getLong(2) - r.getLong(4),
        s"${r.getString(0)}: effective != total - dup")
      assert(r.getLong(3) <= r.getLong(1), "more dup docs than docs")
      assert(r.getLong(4) <= r.getLong(2), "more dup tokens than tokens")
      if (!r.isNullAt(6))
        assert(r.getLong(6) >= 0L && r.getLong(6) <= 1000000L)
    }
  }

  test("e7: dup rows are exactly d13's is_kept = 0 set") {
    val dropped = graft.dedup.DedupQueries
      .defs("d13_cluster_canonical").fn(spark, sf)
      .filter(col("is_kept") === 0L).select(col("doc_id"))
    val bySource = Tables.table(spark, sf, "documents")
      .join(dropped, "doc_id")
      .select(coalesce(col("source"), lit("")).as("source"),
        coalesce(Text.bpeTokenCount(col("text")).cast("long"), lit(0L))
          .as("n_tokens"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("nd"), sum(col("n_tokens")).as("dt"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    for (r <- e7) {
      val (nd, dt) = bySource.getOrElse(r.getString(0), (0L, 0L))
      assert(r.getLong(3) === nd, s"${r.getString(0)} dup docs")
      assert(r.getLong(4) === dt, s"${r.getString(0)} dup tokens")
    }
    assert(e7.map(_.getLong(3)).sum > 0L, "no dups at this sf")
  }

  // ---- e8 ----

  private lazy val e8 =
    PipelineQueries.defs("e8_release_manifest").fn(spark, sf).collect()

  test("e8: the total row is the exact fold of the per-source rows") {
    val (totals, perSource) = e8.partition(_.getString(0) == "__total__")
    assert(totals.length === 1)
    val t = totals.head
    assert(t.getLong(1) === perSource.map(_.getLong(1)).sum)
    assert(t.getLong(2) === perSource.map(_.getLong(2)).sum)
    assert(t.getLong(3) === perSource.map(_.getLong(3)).sum)
    assert(t.getLong(4) === perSource.map(_.getLong(4)).min)
    assert(t.getLong(5) === perSource.map(_.getLong(5)).max)
    // checksum folds commutatively: sum of residues mod M = residue of sum
    val m = BigInt(1000000000000000000L)
    assert(BigInt(t.getLong(6)) ===
      perSource.map(r => BigInt(r.getLong(6))).sum % m)
  }

  test("e8: checksum is order-invariant and moves on any changed byte") {
    val m = BigInt(1000000000000000000L)
    val texts = Tables.table(spark, sf, "documents")
      .select(coalesce(col("text"), lit(""))).collect()
      .map(_.getString(0))
    def sum(ts: Seq[String]): BigInt = ts.map { s =>
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 15)
      BigInt(java.lang.Long.parseLong(hex, 16))
    }.sum % m
    val total = e8.find(_.getString(0) == "__total__").get.getLong(6)
    assert(sum(texts.toSeq) === BigInt(total))
    assert(sum(texts.reverse.toSeq) === BigInt(total), "order dependence")
    val mutated = texts.toSeq.updated(0, texts(0) + "x")
    assert(sum(mutated) !== BigInt(total), "a changed byte must move it")
  }
}
