package graft.dedup

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.text.Text

/** Restores the independent check the r15 lockstep twin edit removed
  * (r15 verdict "what's wrong" #2): d4/d18/d22 intersect 60-bit
  * truncated-md5 shingle fingerprints (`conv(substr(md5(s),1,15))`)
  * and their DuckDB twins were rewritten to compute the SAME
  * fingerprints, so oracle hash-identity can no longer catch a
  * fingerprinting bug. This spec pins, at fixture scale, that the
  * fingerprint-space set operations equal the raw-gram-space ones:
  * for every pair, |fp1 ∩ fp2| == |sh1 ∩ sh2| and the fp jaccard
  * equals the raw jaccard — i.e. the 60-bit map is collision-free on
  * the fixture and the idiom changes representation only. */
class FingerprintEquivalenceSpec extends SparkSpec {

  private val fp60 = (c: org.apache.spark.sql.Column) =>
    transform(c, s => conv(substring(md5(s), 1, 15), 16, 10).cast("long"))

  // word corpus with planted overlap structure: shared prefixes
  // (containment), near-identical twins (jaccard), disjoint docs
  private def texts: Seq[String] = {
    val words = Seq("alpha", "bravo", "charlie", "delta", "echo",
      "foxtrot", "golf", "hotel", "india", "juliet", "kilo", "lima",
      "mike", "november", "oscar", "papa", "quebec", "romeo")
    val rnd = new scala.util.Random(16L)
    val base = (1 to 12).map(_ =>
      (1 to 30).map(_ => words(rnd.nextInt(words.size))).mkString(" "))
    base ++
      base.take(4) ++ // exact dups
      base.take(4).map(_ + " zulu yankee xray") ++ // contained prefixes
      base.take(4).map(t => t.replace("alpha", "whiskey")) // near dups
  }

  test("d18 idiom: fingerprint intersect == raw word-shingle intersect, all pairs") {
    import spark.implicits._
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
      .select(col("doc_id"), Text.words(col("text")).as("w"))
      .select(col("doc_id"), Text.wordShingles(col("w"), 2).as("sh"))
      .withColumn("fp", fp60(col("sh")))
    val pairs = docs.as("a").join(docs.as("b"),
        col("a.doc_id") < col("b.doc_id"))
      .select(
        size(array_intersect(col("a.sh"), col("b.sh"))).as("raw_inter"),
        size(array_intersect(col("a.fp"), col("b.fp"))).as("fp_inter"),
        size(col("a.sh")).as("n1_raw"), size(col("a.fp")).as("n1_fp"))
      .collect()
    assert(pairs.nonEmpty)
    pairs.foreach { r =>
      assert(r.getInt(0) === r.getInt(1), "intersect size diverged")
      assert(r.getInt(2) === r.getInt(3), "set size diverged")
    }
  }

  test("d4 idiom: fingerprint jaccard == raw char-4-gram jaccard, all pairs") {
    import spark.implicits._
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
      .select(col("doc_id"), Text.charShingles(col("text"), 4).as("g"))
      .withColumn("fp", fp60(col("g")))
    val pairs = docs.as("a").join(docs.as("b"),
        col("a.doc_id") < col("b.doc_id"))
      .select(
        round(Text.jaccard(col("a.g"), col("b.g")), 6).as("raw_j"),
        round(Text.jaccard(col("a.fp"), col("b.fp")), 6).as("fp_j"))
      .collect()
    assert(pairs.nonEmpty)
    pairs.foreach { r =>
      assert(r.getDouble(0) === r.getDouble(1), "jaccard diverged")
    }
    // sanity: the fixture exercises a non-degenerate similarity spread
    // (exact dups at 1.0; random pairs share char-grams through the
    // common vocabulary, so the low side is ~0.3-0.5, not 0)
    assert(pairs.exists(r => r.getDouble(0) > 0.9))
    assert(pairs.exists(r => r.getDouble(0) < 0.6))
  }

  test("d2/d14 idiom: fp intersect + arithmetic union == raw word-shingle jaccard") {
    // the r16 verify form: jaccard = inter / (n1 + n2 - inter) over
    // 60-bit fps and distinct-shingle counts, replacing the
    // array_union hash set — same integers, same quotient double
    import spark.implicits._
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
      .select(col("doc_id"), Text.words(col("text")).as("w"))
      .select(col("doc_id"), Text.wordShingles(col("w"), 2).as("sh"))
      .withColumn("fp", fp60(col("sh")))
      .withColumn("n", size(col("sh")).cast("long"))
    val pairs = docs.as("a").join(docs.as("b"),
        col("a.doc_id") < col("b.doc_id"))
      .withColumn("inter",
        size(array_intersect(col("a.fp"), col("b.fp"))).cast("long"))
      .select(
        round(Text.jaccard(col("a.sh"), col("b.sh")), 6).as("raw_j"),
        round(col("inter").cast("double") /
          nullif((col("a.n") + col("b.n") - col("inter")).cast("double"),
            lit(0.0)), 6).as("fp_j"))
      .collect()
    assert(pairs.nonEmpty)
    pairs.foreach { r =>
      assert(r.getDouble(0) === r.getDouble(1),
        "arithmetic-union jaccard diverged")
    }
  }
}
