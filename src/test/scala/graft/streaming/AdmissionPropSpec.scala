package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Randomized battery for st10's admission RULE
  * ([[StreamingQueries.admissionFrame]]) — the continuous-ingest
  * contract on arbitrary corpora:
  *
  *  - **idempotence**: admit a batch, grow the fingerprint index by
  *    the admitted docs' fps, re-feed the SAME batch → every
  *    previously-admitted doc with a fingerprint is now an exact dup
  *    and nothing re-admits. (Null-text docs carry NO fingerprint to
  *    dedup on — by contract they re-admit and batch d1's window
  *    resolves them on the next snapshot, the flag-now/resolve-later
  *    split; the spec pins exactly that.)
  *  - **determinism**: same inputs, same ledger, twice.
  *  - **the admit rule**: admit == passed_quality && !is_exact_dup &&
  *    !contaminated, row for row, with every flag two-valued even on
  *    null/empty/giant-token docs.
  *  - **index-independence of quality/contamination**: re-feeding
  *    against the grown index changes ONLY dup/admit flags.
  */
class AdmissionPropSpec extends SparkSpec {

  private val vocab = Array("alpha", "beta", "gamma", "delta", "epsilon",
    "zeta", "eta", "theta", "iota", "kappa", "the", "and", "of", "to",
    "data", "model", "train", "eval", "corpus", "shard")

  private def randText(rnd: scala.util.Random): String =
    rnd.nextInt(12) match {
      case 0 => null
      case 1 => ""
      case 2 => "   "
      case _ =>
        val n = 1 + rnd.nextInt(60)
        Seq.fill(n)(vocab(rnd.nextInt(vocab.length))).mkString(" ")
    }

  private def docsDf(docs: Seq[(Long, String)]): DataFrame = {
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id",
        org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("text",
        org.apache.spark.sql.types.StringType, nullable = true)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(
        docs.map(d => org.apache.spark.sql.Row(d._1, d._2)), 4), schema)
  }

  private def fpsOf(df: DataFrame): DataFrame =
    df.select(md5(graft.text.Text.normText(col("text"))).as("fp"))
      .filter(col("fp").isNotNull).distinct()

  test("admission is idempotent: re-feeding an admitted batch is a no-op") {
    val rnd = new scala.util.Random(20260816L)
    for (trial <- 1 to 5) {
      val batch = (1L to (20L + rnd.nextInt(60)))
        .map(id => id -> randText(rnd))
      // some docs duplicate within the batch and against the corpus
      val corpus = batch.take(5) ++
        Seq(1000L -> "alpha beta gamma delta epsilon zeta eta theta iota")
      val evalG = docsDf(corpus.takeRight(1))
        .select(explode(graft.text.Text.wordShingles(
          graft.text.Text.words(col("text")),
          graft.dedup.DedupQueries.DecontamN)).as("g")).distinct()
      val probe = graft.dedup.EvalGrams.rowProbe(evalG)
      val index0 = fpsOf(docsDf(corpus))
      def run(index: DataFrame) = StreamingQueries
        .admissionFrame(docsDf(batch), index, probe)
        .collect().map(r => r.getLong(0) ->
          (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(6)))
        .toMap
      val first = run(index0)
      // determinism
      assert(run(index0) === first, s"trial $trial: not deterministic")
      // the admit rule, row for row, all flags two-valued
      first.values.foreach { case (pass, dup, cont, admit) =>
        assert(Set(0L, 1L)(pass) && Set(0L, 1L)(dup) &&
          Set(0L, 1L)(cont) && Set(0L, 1L)(admit))
        assert(admit === (if (pass == 1L && dup == 0L && cont == 0L) 1L
          else 0L))
      }
      // grow the index by the admitted docs' fps; re-feed the batch
      val admittedIds = first.collect {
        case (id, (_, _, _, 1L)) => id }.toSet
      val admittedFps = fpsOf(
        docsDf(batch.filter(d => admittedIds(d._1))))
      val second = run(index0.unionByName(admittedFps).distinct())
      // ONLY null text is fingerprint-less: empty/whitespace/symbol
      // docs all normalize to the EMPTY string and share md5("") —
      // they dedup against each other (e2's adversarial pin 7 shape)
      val textless = batch.filter(_._2 == null).map(_._1).toSet
      for ((id, (pass1, _, cont1, _)) <- first) {
        val (pass2, dup2, cont2, admit2) = second(id)
        // quality + contamination are index-independent
        assert((pass2, cont2) === (pass1, cont1), s"trial $trial doc $id")
        if (admittedIds(id) && !textless(id)) {
          assert(dup2 === 1L && admit2 === 0L,
            s"trial $trial doc $id: re-admitted an admitted doc")
        }
        if (textless(id)) {
          // no fingerprint to dedup on — re-admits by contract,
          // resolved by batch d1 on the next snapshot
          assert(dup2 === 0L, s"trial $trial doc $id")
        }
      }
      assert(second.values.forall(_._4 == 0L) ||
        second.collect { case (id, (_, _, _, 1L)) => id }
          .forall(textless),
        s"trial $trial: a fingerprinted doc re-admitted")
      // the fixture is not vacuous: something was admitted, something
      // was a dup, something was contaminated across trials
      assert(first.nonEmpty)
    }
  }

  test("duplicate texts within the corpus index never admit") {
    val docs = Seq(1L -> "alpha beta gamma", 2L -> "delta epsilon zeta",
      3L -> "alpha beta gamma")
    val evalG = docsDf(Seq(99L -> "nothing shared here at all truly"))
      .select(explode(graft.text.Text.wordShingles(
        graft.text.Text.words(col("text")),
        graft.dedup.DedupQueries.DecontamN)).as("g")).distinct()
    val probe = graft.dedup.EvalGrams.rowProbe(evalG)
    val index = fpsOf(docsDf(Seq(10L -> "alpha beta gamma")))
    val out = StreamingQueries.admissionFrame(docsDf(docs), index, probe)
      .collect().map(r => r.getLong(0) -> (r.getLong(3), r.getLong(6)))
      .toMap
    assert(out(1L) === ((1L, 0L)), "doc 1 matches the indexed fp")
    assert(out(3L) === ((1L, 0L)), "doc 3 matches the indexed fp")
    assert(out(2L)._1 === 0L, "doc 2 is novel")
  }
}
