package graft.dedup

import graft.SparkSpec

/** Randomized battery for [[DedupQueries.contaminationReport]] — the
  * per-eval-doc severity numbers feed a model card, so a divergence
  * from the spec'd rule silently misreports how compromised a
  * benchmark is. Each trial draws a random shingled corpus (shared
  * small vocab so train/eval gram collisions actually happen, null
  * and empty shingle arrays, duplicate grams inside one doc, unicode
  * and empty-string grams) and compares the full report against a
  * brute-force Set/multiset model: shared = evalGrams ∩ trainGrams,
  * n_grams = |sh| (multiset — the production input is a distinct
  * array, but the operator must count exactly what it is given),
  * n_shared = multiplicity of shared grams in sh, overlap =
  * floor(n_shared·1e6 / n_grams) or NULL when gram-less. Covers both
  * EvalGrams paths implicitly (the bloom prefilter has no false
  * negatives; the confirm join removes false positives — any drift
  * fails the equality). Also pins the no-eval-docs and the
  * nothing-shared corpora.
  */
class ContaminationReportPropSpec extends SparkSpec {

  import DedupQueries.DecontamEvalMod

  private type Doc = (Long, Seq[String])

  private def model(docs: Seq[Doc])
      : Seq[(Long, Long, Long, Option[Long], Long)] = {
    val isEval = (id: Long) => id % DecontamEvalMod == 0
    def grams(d: Doc): Seq[String] = Option(d._2).getOrElse(Nil)
    val evalSet = docs.filter(d => isEval(d._1)).flatMap(grams).toSet
    val trainSet = docs.filterNot(d => isEval(d._1)).flatMap(grams).toSet
    val shared = evalSet intersect trainSet
    docs.filter(d => isEval(d._1)).sortBy(_._1).map { d =>
      val sh = grams(d)
      val nGrams = sh.length.toLong
      val nShared = sh.count(shared.contains).toLong
      val overlap =
        if (nGrams == 0L) None else Some(nShared * 1000000L / nGrams)
      (d._1, nGrams, nShared, overlap, if (nShared > 0L) 1L else 0L)
    }
  }

  private def run(docs: Seq[Doc]) = {
    import spark.implicits._
    val shingled = docs.toDF("doc_id", "sh")
    val evalG = docs.filter(_._1 % DecontamEvalMod == 0)
      .flatMap(d => Option(d._2).getOrElse(Nil)).distinct.toDF("g")
    DedupQueries.contaminationReport(shingled, evalG).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3)), r.getLong(4)))
      .toSeq
  }

  test("random corpora: report equals the Set-model of the rule") {
    val rnd = new scala.util.Random(20260815L)
    val vocab = Array("alpha", "beta", "", "γράμμα", "词", "x y", "q5")
    for (trial <- 1 to 6) {
      val nDocs = 60 + rnd.nextInt(200)
      val docs: Seq[Doc] = (0L until nDocs.toLong).map { id =>
        val sh: Seq[String] = rnd.nextInt(10) match {
          case 0 => null
          case 1 => Nil
          case k =>
            // duplicates on purpose: multiplicity must be counted
            Seq.fill(1 + rnd.nextInt(6))(vocab(rnd.nextInt(vocab.length)))
        }
        (id, sh)
      }
      assert(run(docs) === model(docs), s"trial $trial (n=$nDocs)")
    }
  }

  test("no eval docs -> empty report; disjoint vocab -> all-clean") {
    val noEval: Seq[Doc] =
      (1L to 49L).map(id => (id, Seq("a b c d e")))
    assert(run(noEval).isEmpty)
    val disjoint: Seq[Doc] = Seq(
      (0L, Seq("only eval", "twice eval", "twice eval")),
      (1L, Seq("only train")), (2L, Seq("other train")))
    assert(run(disjoint) ===
      Seq((0L, 3L, 0L, Some(0L), 0L)))
  }
}
