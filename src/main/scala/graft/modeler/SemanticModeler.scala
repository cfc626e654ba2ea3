package graft.modeler

/** Semantic-model suggestion (G4-G6, reference
  * KarmaSuggestModel.scala:98-362, 569-675): attach candidate semantic
  * types to columns, pick mapping combinations, search top-k Steiner
  * trees over the alignment graph, and convert each tree into a ranked,
  * scored [[SemanticModel]]. */
object SemanticModeler {

  /** A candidate semantic type for one column: (class, data property,
    * confidence) — the reference's learned-semantic-type injection
    * (KarmaSuggestModel.scala:175-217). */
  final case class Candidate(cls: String, prop: String, confidence: Double)

  /** One column's classifier output — label, its confidence, and the
    * full per-class score map (reference ColumnPrediction,
    * types/ModelTypes.scala:281-295). */
  final case class ColumnPrediction(
      label: String, confidence: Double, scores: Map[String, Double])

  /** The matcher's catch-all class, excluded from the ontology
    * (reference ModelTypes.UknownClass). */
  val UnknownClass = "unknown"

  /** Default unknown-prediction cutoff (reference
    * ModelingProperties.unknownThreshold, types SsdTypes.scala:447-469). */
  val UnknownThreshold = 0.5

  /** P3: filter problematic column predictions before modeling
    * (reference PredictOctopus.filterColumnPredictions:101-122):
    * the `unknown` class is removed from every score map (it has no
    * ontology node); a column whose argmax IS `unknown` above the
    * threshold is discarded outright; otherwise the best remaining
    * class becomes the column's (label, confidence); columns whose
    * remaining scores are all zero are discarded ("no predictions").
    * Ties break by class name so the result is map-order independent
    * (the reference's maxBy inherits HashMap order — a latent
    * nondeterminism we don't reproduce). */
  def filterPredictions(preds: Map[String, ColumnPrediction],
      unknownThreshold: Double = UnknownThreshold): Map[String, ColumnPrediction] =
    preds.map { case (col, p) =>
      val kept = p.scores.filter(_._1 != UnknownClass)
      val (lab, conf) =
        if (p.label == UnknownClass && p.confidence > unknownThreshold)
          (UnknownClass, 0.0) // confidently unknown: drop at the next step
        else if (kept.isEmpty) (UnknownClass, 0.0)
        else { val b = kept.toSeq.minBy(t => (-t._2, t._1)); b }
      col -> ColumnPrediction(lab, conf, kept)
    }.filter(_._2.confidence > 0)

  /** G5: convert a filtered prediction's score map into learned
    * semantic-type candidates (reference
    * KarmaSuggestModel.getLearntSemanticTypes:121-164): a label of the
    * reference's `Class---property` form resolves directly; a plain
    * label resolves through `typeMap` (the analogue of the reference's
    * semanticTypeMap, which maps matcher labels to ontology URIs).
    * Labels that resolve to nothing in the ontology are dropped — the
    * reference's null-KarmaLabel filter. */
  def learnedCandidates(scores: Map[String, Double], ontology: Ontology,
      typeMap: Map[String, (String, String)] = Map.empty): Seq[Candidate] =
    scores.toSeq.filter(_._2 > 0).flatMap { case (label, score) =>
      val resolved =
        if (label.contains("---")) {
          val parts = label.split("---", -1)
          if (parts.length == 2) Some((parts(0), parts(1))) else None
        } else typeMap.get(label)
      resolved.filter { case (cls, prop) =>
        ontology.classes.contains(cls) &&
          ontology.dataPropsOf(cls).exists(_.uri == prop)
      }.map { case (cls, prop) => Candidate(cls, prop, score) }
    }.sortBy(c => (-c.confidence, c.cls, c.prop))

  /** Merge learned and name-based candidates for one column, keeping
    * the highest confidence per (class, property) — the reference sets
    * learned types ALONGSIDE the user/name types on the Karma
    * ColumnNode (KarmaSuggestModel.scala:205-211), it does not replace
    * them. */
  def mergeCandidates(learned: Seq[Candidate], named: Seq[Candidate]): Seq[Candidate] =
    (learned ++ named).groupBy(c => (c.cls, c.prop))
      .map(_._2.maxBy(_.confidence)).toSeq
      .sortBy(c => (-c.confidence, c.cls, c.prop))

  final case class Scores(
      linkCost: Double,
      linkCoherence: Double,
      nodeConfidence: Double,
      nodeCoverage: Double,
      karmaScore: Double)

  final case class Suggestion(model: SemanticModel, scores: Scores)

  val DefaultTopK = 10
  /** Mapping-combination beam width (reference numCandidateMappings). */
  val Beam = 10

  /** Name-based candidate generation: score ontology data properties
    * against the column name by normalized edit distance (stand-in for
    * classifier-learned types when none are supplied; reference default
    * path does the same via its kNN name features). */
  def nameCandidates(column: String, ontology: Ontology, top: Int = 4): Seq[Candidate] = {
    val short = column.replaceAll("^.*\\.", "").toLowerCase
      .replaceAll("^[a-z]{1,2}_", "")
    ontology.dataProps.map { p =>
      val d = graft.functions.StringFunctions
        .needlemanWunsch(short, p.uri.toLowerCase)
      Candidate(p.domain, p.uri, math.max(0.0, 1.0 - d))
    }.sortBy(c => (-c.confidence, c.cls, c.prop)).take(top)
  }

  /** Suggest top-k semantic models for `columns` given per-column
    * candidates. */
  def suggest(align: AlignmentGraph,
      columnCandidates: Seq[(String, Seq[Candidate])],
      topK: Int = DefaultTopK): Seq[Suggestion] = {
    val edges = align.edges.map(e =>
      SteinerTree.Edge(e.src, e.dst, e.label, e.weight))

    // beam over mapping combinations, ordered by total confidence
    var combos: Seq[Seq[(String, Candidate)]] = Seq(Seq())
    columnCandidates.foreach { case (col, cands) =>
      combos = combos.flatMap(prefix =>
        cands.take(4).map(c => prefix :+ (col -> c)))
        .sortBy(-_.map(_._2.confidence).sum).take(Beam)
    }

    val suggestions = combos.flatMap { mapping =>
      val terminals = mapping.map(_._2.cls).distinct.sorted
      SteinerTree.topK(edges, terminals, topK).map { tree =>
        build(mapping, tree, align)
      }
    }
    suggestions
      .groupBy(_.model.triples).map(_._2.minBy(_.scores.karmaScore)).toSeq
      .sortBy(s => (s.scores.karmaScore,
        s.model.triples.toSeq.sorted.mkString("|")))
      .take(topK)
  }

  private def build(mapping: Seq[(String, Candidate)], tree: SteinerTree.Tree,
      align: AlignmentGraph): Suggestion = {
    val classUris = (tree.nodeSet ++ mapping.map(_._2.cls)).toSeq.sorted
    val classIds = classUris.zipWithIndex.toMap
    val classNodes = classUris.map(c => ClassNode(classIds(c), c))
    val columnNodes = mapping.zipWithIndex.map { case ((col, _), i) =>
      ColumnNode(classUris.size + i, col)
    }
    val classLinks = tree.edges.map(e =>
      SmLink(classIds(e.src), classIds(e.dst), e.label, e.weight))
    val dataLinks = mapping.zip(columnNodes).map { case ((_, cand), cn) =>
      SmLink(classIds(cand.cls), cn.id, cand.prop, 1.0)
    }
    val model = SemanticModel(classNodes ++ columnNodes, classLinks ++ dataLinks)
    val knownShare =
      if (tree.edges.isEmpty) 1.0
      else tree.edges.count(_.weight <= align.KnownWeight).toDouble / tree.edges.size
    val conf = if (mapping.isEmpty) 0.0
      else mapping.map(_._2.confidence).sum / mapping.size
    val cost = tree.cost + dataLinks.size
    val coverage = if (model.nodes.isEmpty) 0.0
      else mapping.size.toDouble / model.nodes.size
    Suggestion(model, Scores(
      linkCost = cost,
      linkCoherence = math.round(knownShare * 100) / 100.0,
      nodeConfidence = math.round(conf * 1e6) / 1e6,
      nodeCoverage = math.round(coverage * 100) / 100.0,
      karmaScore = math.round((cost + (1 - conf)) * 1e6) / 1e6))
  }
}
