package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** Hand-computed expectations for the lexical (WordNet-family) metrics
  * over a 6-node toy taxonomy, so the JCN/LIN/WUP arithmetic is checked
  * against the standard definitions — independently of the builtin
  * lexicon and of the DuckDB oracle (which consumes these values as
  * literals).
  *
  * Toy tree (counts in parens):     root(10)
  *                                  /      \
  *                              mid(6)    other(4)
  *                              /    \
  *                          leafa(3) leafb(2)
  * subtree: leafa=3, leafb=2, mid=11, other=4, root=25 (total).
  */
class LexicalSpec extends AnyFunSuite {

  private val toy = Lexical.Taxonomy.parse(
    """root||10
      |mid|root|6
      |other|root|4
      |leafa|mid|3
      |leafb|mid|2
      |la=leafa
      |""".stripMargin.linesIterator)

  private def ic(sub: Double) = -math.log(sub / 25.0)

  test("WUP: 2*depth(lcs)/(depth(a)+depth(b))") {
    // leafa vs leafb: lcs=mid depth 2; both depth 3 -> 4/6
    val (_, _, wup) = toy.wordDistances("leafa", "leafb")
    assert(wup === math.floor((1.0 - 4.0 / 6.0) * 1e6 + 0.5) / 1e6)
    // leafa vs other: lcs=root depth 1 -> 2/(3+2)
    val (_, _, wup2) = toy.wordDistances("leafa", "other")
    assert(wup2 === math.floor((1.0 - 2.0 / 5.0) * 1e6 + 0.5) / 1e6)
  }

  test("LIN: 2*IC(mics)/(IC(a)+IC(b))") {
    val expected = 1.0 - 2.0 * ic(11) / (ic(3) + ic(2))
    val (_, lin, _) = toy.wordDistances("leafa", "leafb")
    assert(lin === math.floor(expected * 1e6 + 0.5) / 1e6)
  }

  test("JCN: 1 - (1/(IC(a)+IC(b)-2*IC(mics)))/MaxJcn") {
    val sim = 1.0 / (ic(3) + ic(2) - 2.0 * ic(11))
    val expected = 1.0 - sim / Lexical.MaxJcn
    val (jcn, _, _) = toy.wordDistances("leafa", "leafb")
    assert(jcn === math.floor(expected * 1e6 + 0.5) / 1e6)
  }

  test("equal words are 0 before lookup; OOV words are maximally distant") {
    assert(toy.wordDistances("zzz", "zzz") === ((0.0, 0.0, 0.0)))
    assert(toy.wordDistances("zzz", "leafa") === ((1.0, 1.0, 1.0)))
  }

  test("synonyms canonicalize before the graph walk") {
    assert(toy.wordDistances("la", "leafb") === toy.wordDistances("leafa", "leafb"))
  }

  test("compound alignment iterates the bigger set, truncated micro-mean") {
    // sets {leafa} vs {leafa, other}: bigger = {leafa, other};
    // leafa->leafa = 0, other->leafa = d(other, leafa); mean = d/2 floored
    val (j, _, _) = toy.compoundDistance(Seq("leafa"), Seq("leafa", "other"))
    val (ju, _, _) = toy.wordDistanceMicros("other", "leafa")
    assert(j === (ju / 2) / 1e6)
  }

  test("min over class examples + empty-pool sentinel (reference J4/A25)") {
    val out = toy.minDistFromClassExamples(
      attrTokens = Seq("leafa"),
      classList = Seq("c1", "c2"),
      pool = Map("c1" -> Seq(Seq("other"), Seq("leafb", "leafa"))))
    // c1: min(d(leafa, other), aligned {leafb,leafa}) — second example
    // contains leafa so its bigger-set mean includes a 0 match
    assert(out("c1")._3 < toy.wordDistances("leafa", "other")._3)
    assert(out("c2") === ((-1.0, -1.0, -1.0)))
  }

  test("parse rejects cycles, undefined parents, and multiple roots") {
    def bad(src: String) =
      intercept[IllegalArgumentException](
        Lexical.Taxonomy.parse(src.linesIterator))
    assert(bad("a|b|1\nb|a|1").getMessage.contains("cycle") ||
      bad("a|b|1\nb|a|1").getMessage.contains("root"))
    assert(bad("root||1\nx|ghost|1").getMessage.contains("ghost"))
    assert(bad("r1||1\nr2||1\na|r1|1").getMessage.contains("root"))
    assert(bad("root||1\na|root|1\nz=ghost2").getMessage.contains("ghost2"))
  }

  test("single-node taxonomy loads and behaves (no bare root crash)") {
    // regression: `root` used a parent-edges-only formula, so a
    // taxonomy that validation accepted (one node, zero parent edges)
    // crashed later inside the first metric with NoSuchElementException
    val one = Lexical.Taxonomy.parse(Iterator("entity||5"))
    assert(one.wordDistances("entity", "entity") === ((0.0, 0.0, 0.0)))
    assert(one.wordDistances("entity", "zzz") === ((1.0, 1.0, 1.0)))
  }

  test("WNDB loader: Princeton data.noun fixture, hand-computed JCN/LIN/WUP") {
    val t = Lexical.Taxonomy.fromWndbDir(
      getClass.getResource("/wordnet").getPath)
    // fixture tree (uniform count 1/synset):
    //   entity
    //   ├ abstraction ── measure(=quantity), attribute
    //   └ object(=physical object) ── artifact ── cart(=wagon),
    //                                 living thing
    // subtree: entity=8, abstraction=3, object=4, artifact=2, leaves=1
    def icOf(sub: Double) = -math.log(sub / 8.0)
    def r6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    val (jcn, lin, wup) = t.wordDistances("measure", "attribute")
    // WUP: lcs=abstraction depth 2, both words depth 3 -> sim 4/6
    assert(wup === r6(1.0 - 4.0 / 6.0))
    // LIN: mics=abstraction: 2*ic(3)/(ic(1)+ic(1))
    assert(lin === r6(1.0 - 2.0 * icOf(3) / (icOf(1) + icOf(1))))
    // JCN: 1 - (1/(2*ic(1) - 2*ic(3)))/MaxJcn
    assert(jcn === r6(1.0 -
      (1.0 / (2.0 * icOf(1) - 2.0 * icOf(3))) / Lexical.MaxJcn))
    // deeper pair across branches: cart(4) vs living thing(3), lcs=object(2)
    val (_, _, wup2) = t.wordDistances("cart", "living thing")
    assert(wup2 === r6(1.0 - 2.0 * 2.0 / (4 + 3)))
    // synset co-words became synonyms of the first word
    assert(t.wordDistances("quantity", "attribute") ===
      t.wordDistances("measure", "attribute"))
    assert(t.wordDistances("wagon", "cart") === ((0.0, 0.0, 0.0)))
    // underscored lemma surfaces with a space, like WordNet lemmas do
    val (_, _, wupObj) = t.wordDistances("physical object", "artifact")
    assert(wupObj === r6(1.0 - 2.0 * 2.0 / (2 + 3)))
  }

  test("builtin taxonomy is well-formed and covers schema vocabulary") {
    val t = Lexical.Taxonomy.builtin
    // related attribute words are closer than cross-branch words (LIN)
    val (_, linNear, _) = t.wordDistances("price", "cost")
    val (_, linFar, _) = t.wordDistances("price", "customer")
    assert(linNear < linFar)
    // identifier synonyms: id == identifier canonicalization
    assert(t.wordDistances("id", "identifier") === ((0.0, 0.0, 0.0)))
  }
}
