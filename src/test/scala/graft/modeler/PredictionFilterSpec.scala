package graft.modeler

import org.scalatest.funsuite.AnyFunSuite

import SemanticModeler.{Candidate, ColumnPrediction}

/** P3 + G5 unit battery: the reference's unknown-threshold prediction
  * filter (PredictOctopus.filterColumnPredictions:101-122) and
  * learned-semantic-type injection (KarmaSuggestModel.scala:119-217). */
class PredictionFilterSpec extends AnyFunSuite {

  private val ont = Ontology.parseTurtle("""
    :Person a owl:Class .
    :City a owl:Class .
    :name a owl:DatatypeProperty ; rdfs:domain :Person .
    :age a owl:DatatypeProperty ; rdfs:domain :Person .
    :cityname a owl:DatatypeProperty ; rdfs:domain :City .
    :livesIn a owl:ObjectProperty ; rdfs:domain :Person ; rdfs:range :City .
  """)

  test("filterPredictions drops confidently-unknown columns (P3)") {
    val preds = Map(
      "t.a" -> ColumnPrediction("unknown", 0.9,
        Map("unknown" -> 0.9, "name" -> 0.1)),
      "t.b" -> ColumnPrediction("name", 0.8,
        Map("unknown" -> 0.2, "name" -> 0.8)))
    val f = SemanticModeler.filterPredictions(preds, 0.5)
    assert(!f.contains("t.a"), "unknown@0.9 > 0.5 must be discarded")
    assert(f("t.b").label === "name" && f("t.b").confidence === 0.8)
  }

  test("filterPredictions re-labels below-threshold unknowns to the best known class") {
    // unknown argmax but NOT above the threshold: the reference keeps the
    // column and re-labels it to the best remaining class
    val preds = Map(
      "t.a" -> ColumnPrediction("unknown", 0.4,
        Map("unknown" -> 0.4, "name" -> 0.35, "age" -> 0.25)))
    val f = SemanticModeler.filterPredictions(preds, 0.5)
    assert(f("t.a").label === "name")
    assert(f("t.a").confidence === 0.35)
    // and the unknown class is stripped from the score map (it has no
    // ontology node)
    assert(!f("t.a").scores.contains("unknown"))
  }

  test("filterPredictions drops all-zero score maps") {
    val preds = Map(
      "t.a" -> ColumnPrediction("name", 0.0,
        Map("name" -> 0.0, "age" -> 0.0)),
      // all mass on unknown: after the strip the rest is zero -> dropped
      "t.b" -> ColumnPrediction("unknown", 0.45,
        Map("unknown" -> 0.45, "name" -> 0.0)))
    assert(SemanticModeler.filterPredictions(preds, 0.5).isEmpty)
  }

  test("filterPredictions breaks score ties by class name (deterministic)") {
    val preds = Map(
      "t.a" -> ColumnPrediction("name", 0.5,
        Map("name" -> 0.5, "age" -> 0.5)))
    assert(SemanticModeler.filterPredictions(preds, 0.5)("t.a").label === "age")
  }

  test("learnedCandidates resolves Class---property labels directly") {
    val cands = SemanticModeler.learnedCandidates(
      Map("Person---name" -> 0.7, "City---cityname" -> 0.3), ont)
    assert(cands === Seq(
      Candidate("Person", "name", 0.7),
      Candidate("City", "cityname", 0.3)))
  }

  test("learnedCandidates resolves plain labels through the typeMap and drops unresolvable ones") {
    val typeMap = Map("fullname" -> ("Person", "name"))
    val cands = SemanticModeler.learnedCandidates(
      Map("fullname" -> 0.6, "blob" -> 0.4, "zeroed" -> 0.0), ont, typeMap)
    assert(cands === Seq(Candidate("Person", "name", 0.6)),
      "unmapped and zero-score labels must not produce candidates")
  }

  test("learnedCandidates drops labels that resolve outside the ontology") {
    val cands = SemanticModeler.learnedCandidates(
      Map("Ghost---name" -> 0.9,   // class not in ontology
          "Person---height" -> 0.8, // property not on the class
          "City---name" -> 0.7),    // property exists but on Person
      ont)
    assert(cands.isEmpty)
  }

  test("mergeCandidates keeps max confidence per (class, property)") {
    val merged = SemanticModeler.mergeCandidates(
      Seq(Candidate("Person", "name", 0.7), Candidate("Person", "age", 0.2)),
      Seq(Candidate("Person", "name", 0.4), Candidate("City", "cityname", 0.5)))
    assert(merged === Seq(
      Candidate("Person", "name", 0.7),
      Candidate("City", "cityname", 0.5),
      Candidate("Person", "age", 0.2)))
  }

  test("a learned type steers the suggestion where name-matching would not (G5)") {
    val align = new AlignmentGraph(ont)
    // column named nothing like "age": name candidates alone score it
    // low everywhere; the classifier's learned (Person, age) injection
    // must drive the winning mapping
    val colName = "src.q7x"
    val named = SemanticModeler.nameCandidates(colName, ont)
    val learned = Seq(Candidate("Person", "age", 0.95))
    val withLearned = SemanticModeler.suggest(align,
      Seq(colName -> SemanticModeler.mergeCandidates(learned, named)))
    val nameOnly = SemanticModeler.suggest(align, Seq(colName -> named))
    def topProp(sugs: Seq[SemanticModeler.Suggestion]): String =
      sugs.head.model.links.collectFirst {
        case l if sugs.head.model.nodes.exists(n =>
          n.id == l.dst && n.isInstanceOf[ColumnNode]) => l.label
      }.get
    assert(topProp(withLearned) === "age")
    assert(topProp(nameOnly) !== "age",
      "fixture invalid: name matching already picks age — rename the column")
  }
}
