package graft.modeler

import org.apache.spark.sql.functions._

import graft.QueryDef
import graft.matcher.{MatcherSession, SemanticTypeClassifier}

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

  /** Matcher-label -> tpch-ontology (class, data property) — the
    * analogue of the reference's semanticTypeMap (matcher labels to
    * ontology URIs, KarmaSuggestModel.scala:119-141), binding the
    * built-in label universe to [[Ontology.tpch]]. `text` has no
    * ontology analogue on purpose: its predictions exercise the
    * reference's unresolvable-label drop. */
  val tpchTypeMap: Map[String, (String, String)] = Map(
    "identifier" -> ("Order", "orderkey"),
    "name" -> ("Customer", "name"),
    "category" -> ("Customer", "mktsegment"),
    "money" -> ("Customer", "acctbal"),
    "date" -> ("Order", "orderdate"),
    "quantity" -> ("LineItem", "quantity"))

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
      // data-independent deterministic output (ontology + column names
      // only) — pinned as a VALUES regression oracle; ModelerSpec checks
      // the pin against the live suggester so drift fails sbt test first.
      Some {
        val vals = PinnedSuggestions
          .map { case (r, s0, p0, d0, lc, cf) =>
            s"($r, '$s0', '$p0', '$d0', $lc, $cf)" }
          .mkString(",\n          ")
        s"""SELECT CAST(rank AS BIGINT) AS rank, src, property, dst,
          CAST(link_cost AS DOUBLE) AS link_cost,
          CAST(confidence AS DOUBLE) AS confidence
        FROM (VALUES
          $vals
        ) AS t(rank, src, property, dst, link_cost, confidence)
        ORDER BY rank, src, property, dst"""
      }),

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
      // data-independent: the top suggestion reconstructs the gold model
      // exactly (pinned, guarded by ModelerSpec's live-vs-pin check)
      Some("""SELECT model, CAST(precision AS DOUBLE) AS precision,
        CAST(recall AS DOUBLE) AS recall, CAST(jaccard AS DOUBLE) AS jaccard
        FROM (VALUES ('top1', 1.0, 1.0, 1.0))
          AS t(model, precision, recall, jaccard)""")),

    // ---- g4: P3-filtered predictions -> learned semantic-type
    //      candidates merged with name candidates (the matcher->modeler
    //      coupling: reference PredictOctopus.filterColumnPredictions
    //      :101-122 + KarmaSuggestModel learned-type injection :175-217)
    "g4_learned_types" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        val preds = SemanticTypeClassifier.predict(
            MatcherSession.model(s, dir), MatcherSession.holdoutFeatures(s, dir))
          .collect().map { r =>
            r.getString(0) -> SemanticModeler.ColumnPrediction(
              r.getString(1), r.getDouble(2),
              r.getMap[String, Double](r.fieldIndex("scores")).toMap)
          }.toMap
        SemanticModeler.filterPredictions(preds).toSeq
          .flatMap { case (colName, p) =>
            SemanticModeler.mergeCandidates(
                SemanticModeler.learnedCandidates(p.scores, Ontology.tpch, tpchTypeMap),
                SemanticModeler.nameCandidates(colName, Ontology.tpch))
              .take(4).zipWithIndex.map { case (c, i) =>
                (colName, (i + 1).toLong, c.cls, c.prop,
                  math.round(c.confidence * 1e6) / 1e6)
              }
          }
          .toDF("col_name", "rank", "class", "property", "confidence")
          .orderBy(col("col_name"), col("rank"))
      },
      // pinned regression oracle at the driver's correctness sf (0.01):
      // deterministic RF scores + data-independent name candidates ⇒
      // constant output at a fixed sf; guarded live-vs-pin by
      // PredictionPinSpec (same contract as the m4/m8 pins).
      Some {
        val vals = PinnedG4Sf001
          .map { case (c, r, cl, p, cf) => s"('$c', $r, '$cl', '$p', $cf)" }
          .mkString(",\n      ")
        s"""SELECT col_name, CAST(rank AS BIGINT) AS rank, class, property,
          CAST(confidence AS DOUBLE) AS confidence
        FROM (VALUES
      $vals
        ) AS t(col_name, rank, class, property, confidence)
        ORDER BY col_name, rank"""
      })
  )

  /** g4's pinned output at sf0.01 (col_name, rank, class, property,
    * confidence) — refreshed from a Verify run whenever the matcher
    * features/model change; PredictionPinSpec checks live-vs-pin. */
  lazy val PinnedG4Sf001: Seq[(String, Long, String, String, Double)] = Seq(
    ("events.event_id", 1L, "Order", "orderkey", 0.492188),
    ("events.event_id", 2L, "LineItem", "extendedprice", 0.307692),
    ("events.event_id", 3L, "LineItem", "quantity", 0.257813),
    ("events.event_id", 4L, "Part", "brand", 0.25),
    ("events.event_type", 1L, "Customer", "mktsegment", 0.664063),
    ("events.event_type", 2L, "Part", "parttype", 0.5),
    ("events.event_type", 3L, "LineItem", "quantity", 0.4),
    ("events.event_type", 4L, "LineItem", "extendedprice", 0.307692),
    ("events.props", 1L, "Part", "parttype", 0.375),
    ("events.props", 2L, "Customer", "mktsegment", 0.335938),
    ("events.props", 3L, "Part", "partname", 0.25),
    ("events.props", 4L, "Order", "orderpriority", 0.230769),
    ("events.ts", 1L, "Order", "orderdate", 0.359375),
    ("events.ts", 2L, "Customer", "mktsegment", 0.2),
    ("events.ts", 3L, "Customer", "name", 0.1875),
    ("events.ts", 4L, "Order", "orderstatus", 0.181818),
    ("events.user_id", 1L, "Order", "orderkey", 0.476563),
    ("events.user_id", 2L, "LineItem", "quantity", 0.351563),
    ("events.user_id", 3L, "Part", "brand", 0.285714),
    ("events.user_id", 4L, "Order", "orderpriority", 0.230769),
    ("events.value", 1L, "Customer", "acctbal", 0.460938),
    ("events.value", 2L, "Customer", "name", 0.4),
    ("events.value", 3L, "Order", "totalprice", 0.3),
    ("events.value", 4L, "Part", "retailprice", 0.272727),
    ("nation.n_name", 1L, "Customer", "name", 1.0),
    ("nation.n_name", 2L, "Part", "partname", 0.5),
    ("nation.n_name", 3L, "Supplier", "suppname", 0.5),
    ("nation.n_name", 4L, "Nation", "nationname", 0.4),
    ("nation.n_nationkey", 1L, "Order", "orderkey", 0.984375),
    ("nation.n_nationkey", 2L, "Nation", "nationname", 0.6),
    ("nation.n_nationkey", 3L, "Customer", "custkey", 0.333333),
    ("nation.n_nationkey", 4L, "Customer", "name", 0.333333),
    ("nation.n_regionkey", 1L, "Order", "orderkey", 0.664063),
    ("nation.n_regionkey", 2L, "Region", "regionname", 0.6),
    ("nation.n_regionkey", 3L, "Order", "orderpriority", 0.384615),
    ("nation.n_regionkey", 4L, "Customer", "custkey", 0.333333),
    ("region.r_name", 1L, "Customer", "name", 1.0),
    ("region.r_name", 2L, "Part", "partname", 0.5),
    ("region.r_name", 3L, "Supplier", "suppname", 0.5),
    ("region.r_name", 4L, "Nation", "nationname", 0.4),
    ("region.r_regionkey", 1L, "Order", "orderkey", 0.648438),
    ("region.r_regionkey", 2L, "Region", "regionname", 0.6),
    ("region.r_regionkey", 3L, "Order", "orderpriority", 0.384615),
    ("region.r_regionkey", 4L, "Customer", "custkey", 0.333333))

  /** g1's pinned suggestion list (data-independent — derived from the
    * tpch ontology and the flat column names alone): (rank, src,
    * property, dst, link_cost, confidence), sorted. ModelerSpec checks
    * the live suggester against this pin. */
  lazy val PinnedSuggestions: Seq[(Long, String, String, String, Double, Double)] = Seq(
    (1L, "Customer", "acctbal", "acctbal", 5.02, 1.0),
    (1L, "Customer", "custNation", "Nation", 5.02, 1.0),
    (1L, "Customer", "name", "name", 5.02, 1.0),
    (1L, "Nation", "nationname", "nationname", 5.02, 1.0),
    (1L, "Order", "orderdate", "orderdate", 5.02, 1.0),
    (1L, "Order", "orderkey", "orderkey", 5.02, 1.0),
    (1L, "Order", "placedBy", "Customer", 5.02, 1.0),
    (2L, "Customer", "acctbal", "acctbal", 5.02, 0.927273),
    (2L, "Customer", "custNation", "Nation", 5.02, 0.927273),
    (2L, "Customer", "name", "name", 5.02, 0.927273),
    (2L, "Nation", "nationname", "nationname", 5.02, 0.927273),
    (2L, "Order", "orderkey", "orderkey", 5.02, 0.927273),
    (2L, "Order", "orderstatus", "orderdate", 5.02, 0.927273),
    (2L, "Order", "placedBy", "Customer", 5.02, 0.927273),
    (3L, "Customer", "acctbal", "acctbal", 5.02, 0.911111),
    (3L, "Customer", "custNation", "Nation", 5.02, 0.911111),
    (3L, "Customer", "name", "name", 5.02, 0.911111),
    (3L, "Nation", "nationname", "nationname", 5.02, 0.911111),
    (3L, "Order", "orderdate", "orderdate", 5.02, 0.911111),
    (3L, "Order", "orderdate", "orderkey", 5.02, 0.911111),
    (3L, "Order", "placedBy", "Customer", 5.02, 0.911111),
    (4L, "Customer", "acctbal", "acctbal", 5.02, 0.911111),
    (4L, "Customer", "custNation", "Nation", 5.02, 0.911111),
    (4L, "Customer", "name", "name", 5.02, 0.911111),
    (4L, "Nation", "nationname", "nationname", 5.02, 0.911111),
    (4L, "Order", "orderkey", "orderdate", 5.02, 0.911111),
    (4L, "Order", "orderkey", "orderkey", 5.02, 0.911111),
    (4L, "Order", "placedBy", "Customer", 5.02, 0.911111),
    (5L, "Customer", "acctbal", "acctbal", 5.02, 0.892308),
    (5L, "Customer", "custNation", "Nation", 5.02, 0.892308),
    (5L, "Customer", "name", "name", 5.02, 0.892308),
    (5L, "Nation", "nationname", "nationname", 5.02, 0.892308),
    (5L, "Order", "orderdate", "orderdate", 5.02, 0.892308),
    (5L, "Order", "orderpriority", "orderkey", 5.02, 0.892308),
    (5L, "Order", "placedBy", "Customer", 5.02, 0.892308),
    (6L, "Customer", "acctbal", "acctbal", 5.02, 0.892308),
    (6L, "Customer", "custNation", "Nation", 5.02, 0.892308),
    (6L, "Customer", "name", "name", 5.02, 0.892308),
    (6L, "Nation", "nationname", "nationname", 5.02, 0.892308),
    (6L, "Order", "orderkey", "orderkey", 5.02, 0.892308),
    (6L, "Order", "orderpriority", "orderdate", 5.02, 0.892308),
    (6L, "Order", "placedBy", "Customer", 5.02, 0.892308),
    (7L, "Customer", "acctbal", "acctbal", 6.02, 0.94),
    (7L, "Customer", "custNation", "Nation", 6.02, 0.94),
    (7L, "Customer", "name", "name", 6.02, 0.94),
    (7L, "Nation", "inRegion", "Region", 6.02, 0.94),
    (7L, "Order", "orderdate", "orderdate", 6.02, 0.94),
    (7L, "Order", "orderkey", "orderkey", 6.02, 0.94),
    (7L, "Order", "placedBy", "Customer", 6.02, 0.94),
    (7L, "Region", "regionname", "nationname", 6.02, 0.94),
    (8L, "Customer", "acctbal", "acctbal", 6.02, 0.9),
    (8L, "Customer", "custNation", "Nation", 6.02, 0.9),
    (8L, "Nation", "nationname", "nationname", 6.02, 0.9),
    (8L, "Order", "orderdate", "orderdate", 6.02, 0.9),
    (8L, "Order", "orderkey", "orderkey", 6.02, 0.9),
    (8L, "Order", "placedBy", "Customer", 6.02, 0.9),
    (8L, "Supplier", "suppNation", "Nation", 6.02, 0.9),
    (8L, "Supplier", "suppname", "name", 6.02, 0.9),
    (9L, "Customer", "acctbal", "acctbal", 7.01, 0.9),
    (9L, "Customer", "name", "name", 7.01, 0.9),
    (9L, "LineItem", "ofPart", "Part", 7.01, 0.9),
    (9L, "Order", "contains", "LineItem", 7.01, 0.9),
    (9L, "Order", "orderdate", "orderdate", 7.01, 0.9),
    (9L, "Order", "orderkey", "orderkey", 7.01, 0.9),
    (9L, "Order", "placedBy", "Customer", 7.01, 0.9),
    (9L, "Part", "partname", "nationname", 7.01, 0.9),
    (10L, "Customer", "acctbal", "acctbal", 7.02, 0.9),
    (10L, "Customer", "custNation", "Nation", 7.02, 0.9),
    (10L, "LineItem", "ofPart", "Part", 7.02, 0.9),
    (10L, "Nation", "nationname", "nationname", 7.02, 0.9),
    (10L, "Order", "contains", "LineItem", 7.02, 0.9),
    (10L, "Order", "orderdate", "orderdate", 7.02, 0.9),
    (10L, "Order", "orderkey", "orderkey", 7.02, 0.9),
    (10L, "Order", "placedBy", "Customer", 7.02, 0.9),
    (10L, "Part", "partname", "name", 7.02, 0.9))
}
