package graft.modeler

import org.apache.spark.sql.functions._

import graft.QueryDef

/** Semantic-modeling queries. The modeler is driver-side (graphs are
  * ontology-sized); queries expose its output as DataFrames so the
  * harness can check shape/determinism. */
object ModelerQueries {

  /** Flat source whose model we suggest: order data joined with
    * customer and nation attributes (the classic "flat export" a
    * semantic model reconstructs). */
  val flatColumns: Seq[String] =
    Seq("orderkey", "orderdate", "name", "acctbal", "nationname")

  def suggestFor(columns: Seq[String], known: Seq[SemanticModel])
      : Seq[SemanticModeler.Suggestion] = {
    val align = new AlignmentGraph(Ontology.tpch)
    known.foreach(align.add)
    val cands = columns.map(c =>
      c -> SemanticModeler.nameCandidates(c, Ontology.tpch))
    SemanticModeler.suggest(align, cands)
  }

  /** The known model: Order -placedBy-> Customer -custNation-> Nation,
    * used to bias the alignment graph (G2). */
  def knownOrderModel: SemanticModel = SemanticModel(
    Seq(ClassNode(0, "Order"), ClassNode(1, "Customer"), ClassNode(2, "Nation")),
    Seq(SmLink(0, 1, "placedBy"), SmLink(1, 2, "custNation")))

  /** Pinned g2 edge list (sorted by src, property, dst) — the regression
    * oracle for the alignment graph; kept in sync with the live graph by
    * ModelerSpec. */
  val PinnedAlignmentEdges: Seq[(String, String, String, Double)] = Seq(
    ("Customer", "custNation", "Nation", 0.01),
    ("LineItem", "ofPart", "Part", 1.0),
    ("LineItem", "suppliedBy", "Supplier", 1.0),
    ("Nation", "inRegion", "Region", 1.0),
    ("Order", "contains", "LineItem", 1.0),
    ("Order", "placedBy", "Customer", 0.01),
    ("Supplier", "suppNation", "Nation", 1.0))

  val defs: Map[String, QueryDef] = Map(

    // ---- g1: ranked semantic-model suggestions for the flat source
    "g1_semantic_models" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        val suggestions = suggestFor(flatColumns, Seq(knownOrderModel))
        suggestions.zipWithIndex.flatMap { case (sug, rank) =>
          val byId = sug.model.nodes.map(n => n.id -> n.label).toMap
          sug.model.links.map(l =>
            (rank + 1L, byId(l.src), l.label, byId(l.dst),
              sug.scores.linkCost, sug.scores.nodeConfidence))
        }.toDF("rank", "src", "property", "dst", "link_cost", "confidence")
          .orderBy(col("rank"), col("src"), col("property"), col("dst"))
      },
      None),

    // ---- g2: alignment-graph edges with known-model re-weighting
    "g2_alignment_graph" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        val align = new AlignmentGraph(Ontology.tpch).add(knownOrderModel)
        align.edges.map(e => (e.src, e.label, e.dst, e.weight))
          .toDF("src", "property", "dst", "weight")
          .orderBy(col("src"), col("property"), col("dst"))
      },
      // deterministic, data-independent edge list: the tpch ontology's
      // object properties at weight 1.0 except the two known-model links
      // (placedBy, custNation) re-weighted to 0.01 — pinned as a VALUES
      // regression oracle; ModelerSpec checks the pin against the live
      // graph so drift fails sbt test before it fails the driver.
      Some {
        val vals = PinnedAlignmentEdges
          .map { case (s0, p0, d0, w0) => s"('$s0', '$p0', '$d0', $w0)" }
          .mkString(",\n          ")
        s"""SELECT src, property, dst, CAST(weight AS DOUBLE) AS weight
        FROM (VALUES
          $vals
        ) AS t(src, property, dst, weight)
        ORDER BY src, property, dst"""
      }),

    // ---- g3: triple-set evaluation of the top suggestion vs gold
    "g3_model_evaluation" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        val top = suggestFor(flatColumns, Seq(knownOrderModel)).head.model
        val gold = {
          val cls = Seq(ClassNode(0, "Order"), ClassNode(1, "Customer"),
            ClassNode(2, "Nation"))
          val cols = flatColumns.zipWithIndex.map { case (c, i) =>
            ColumnNode(3 + i, c)
          }
          SemanticModel(cls ++ cols, Seq(
            SmLink(0, 1, "placedBy"), SmLink(1, 2, "custNation"),
            SmLink(0, 3, "orderkey"), SmLink(0, 4, "orderdate"),
            SmLink(1, 5, "name"), SmLink(1, 6, "acctbal"),
            SmLink(2, 7, "nationname")))
        }
        val (p, r, j) = SemanticModel.evaluate(top, gold)
        Seq(("top1", p, r, j)).toDF("model", "precision", "recall", "jaccard")
      },
      None)
  )
}
