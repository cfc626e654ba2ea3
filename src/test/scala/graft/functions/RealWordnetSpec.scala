package graft.functions

import org.scalatest.funsuite.AnyFunSuite

import Lexical.Taxonomy

/** Integration proof that the WNDB loader survives REAL Princeton
  * WordNet data, not only the generated 341-synset fixture
  * (LexicalSpec). Two layers:
  *
  *  - the reference ships a real WordNet dict
  *    (matcher/src/test/resources/wordnet/dict) WITHOUT `data.noun`
  *    (only the adj/adv/verb data files made it into its repo), so the
  *    line-grammar tokenizer is exercised against the real `data.verb`
  *    — 13k+ genuine wninput(5WN) synset lines with hex word counts,
  *    multi-word collocations, pointer batteries, and the verb frames
  *    section after the pointers;
  *  - the full noun Taxonomy build (single root, IC, JCN/LIN/WUP) is
  *    OPT-IN on a real `data.noun`: point GRAFT_WORDNET_DICT at any
  *    Princeton dict dir (or drop data.noun into the reference copy)
  *    and the structural-invariant test runs; absent that file it
  *    cancels cleanly (`assume`), never fails.
  */
class RealWordnetSpec extends AnyFunSuite {

  private val refDict =
    "/root/reference/matcher/src/test/resources/wordnet/dict"

  test("real data.verb: every synset line of the reference's Princeton " +
      "file tokenizes; hypernym offsets resolve; the one real cycle " +
      "(restrain/inhibit) is detected") {
    val f = new java.io.File(s"$refDict/data.verb")
    assume(f.exists(), s"reference WordNet verb data not present at $f")
    val src = scala.io.Source.fromFile(f)
    val synsets =
      try Taxonomy.parseWndbSynsets(src.getLines(), Set("v"))
      finally src.close()
    assert(synsets.size > 10000, s"only ${synsets.size} synsets parsed")
    assert(synsets.forall(_.words.nonEmpty), "synset with no words")
    assert(synsets.forall(_.words.forall(_.nonEmpty)), "empty word")
    // multi-word collocations got their underscores mapped to spaces
    assert(synsets.exists(_.words.exists(_.contains(' '))),
      "real WordNet has collocations; none survived tokenization")
    val offsets = synsets.map(_.offset).toSet
    assert(offsets.size === synsets.size, "duplicate synset offsets")
    val dangling = synsets.flatMap(_.hypernym).filterNot(offsets)
    assert(dangling.isEmpty,
      s"hypernym offsets not in file: ${dangling.take(5).mkString(", ")}")
    // Real-data finding this spec exists to preserve: WordNet 3.0's
    // verb hierarchy contains a GENUINE mutual first-hypernym pair —
    // restrain (02422663) ⇄ inhibit (02423762) — so raw Princeton data
    // is not guaranteed acyclic, and the Taxonomy loader's load-time
    // cycle validation (Taxonomy.validated) is load-bearing, not
    // defensive boilerplate. Assert the walk finds exactly that cycle
    // and nothing else.
    val up = synsets.flatMap(s => s.hypernym.map(s.offset -> _)).toMap
    val cycleMembers = scala.collection.mutable.Set[String]()
    for (start <- up.keys) {
      val seen = scala.collection.mutable.Set[String]()
      var cur = start
      while (up.contains(cur) && !seen.contains(cur)) {
        seen += cur; cur = up(cur)
      }
      if (up.contains(cur)) {
        // re-walk from the entry point to collect the cycle itself
        var c = cur
        do { cycleMembers += c; c = up(c) } while (c != cur)
      }
    }
    assert(cycleMembers.toSet === Set("02422663", "02423762"),
      "expected exactly WordNet 3.0's known restrain/inhibit mutual-" +
        s"hypernym pair, found: ${cycleMembers.toSeq.sorted.mkString(", ")}")
    // troponymy is real in this file: most verbs have a hypernym
    assert(up.size > synsets.size / 2,
      s"only ${up.size}/${synsets.size} synsets carry a hypernym edge")
  }

  test("real data.noun (opt-in): full Taxonomy build holds the " +
      "structural invariants — root reachability, IC monotone on " +
      "hypernym chains, JCN/LIN symmetry") {
    val dataNoun = sys.env.get("GRAFT_WORDNET_DICT")
      .map(d => new java.io.File(s"$d/data.noun"))
      .filter(_.exists())
      .orElse(Some(new java.io.File(s"$refDict/data.noun")).filter(_.exists()))
    assume(dataNoun.isDefined,
      "no real data.noun present (set GRAFT_WORDNET_DICT to a Princeton " +
        "dict dir to run this)")
    val t = Taxonomy.fromWndbDir(dataNoun.get.getParent)
    // root reachability is what validated() proved at load; re-derive a
    // sample: every 97th node's parent chain terminates
    val nodes = t.count.keySet.toSeq.sorted
    assert(nodes.size > 50000, s"real WordNet has 80k+ noun synsets, got ${nodes.size}")
    val sample = nodes.grouped(97).map(_.head).toSeq
    for (n <- sample) {
      var cur = n; var hops = 0
      while (t.parent.contains(cur)) {
        cur = t.parent(cur); hops += 1
        assert(hops < 100, s"chain from $n too deep")
      }
      // IC monotone: a child is never more frequent than its ancestor
      t.parent.get(n).foreach(p => assert(t.ic(n) >= t.ic(p) - 1e-12,
        s"IC not monotone: ic($n) < ic($p)"))
    }
    // JCN/LIN/WUP symmetry on sample pairs
    for (Seq(a, b) <- sample.take(40).grouped(2)) {
      assert(t.wordDistanceMicros(a, b) === t.wordDistanceMicros(b, a),
        s"asymmetric distance for ($a, $b)")
    }
  }
}
