package graft.modeler

/** Semantic-model graph: a small labelled directed multigraph mapping
  * data columns onto ontology classes (reference
  * types/SemanticModel.scala:41-171, SsdTypes.scala:164-283). Node ids
  * are ints; class nodes carry an ontology class URI, column nodes a
  * column name. Links are data properties (class -> column) or object
  * properties (class -> class). */
sealed trait SmNode { def id: Int; def label: String }
final case class ClassNode(id: Int, label: String) extends SmNode
final case class ColumnNode(id: Int, label: String) extends SmNode

final case class SmLink(src: Int, dst: Int, label: String, weight: Double = 1.0)

final case class SemanticModel(nodes: Seq[SmNode], links: Seq[SmLink]) {

  def classNodes: Seq[ClassNode] = nodes.collect { case c: ClassNode => c }
  def columnNodes: Seq[ColumnNode] = nodes.collect { case c: ColumnNode => c }
  private def byId: Map[Int, SmNode] = nodes.map(n => n.id -> n).toMap

  /** Connectivity check, undirected (reference SsdTypes.isComplete,
    * :178-221: a complete model is one connected graph). */
  def isConnected: Boolean = {
    if (nodes.isEmpty) return true
    val adj = links.flatMap(l => Seq(l.src -> l.dst, l.dst -> l.src))
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val seen = collection.mutable.Set(nodes.head.id)
    val stack = collection.mutable.Stack(nodes.head.id)
    while (stack.nonEmpty) {
      val n = stack.pop()
      adj.getOrElse(n, Nil).foreach(m => if (seen.add(m)) stack.push(m))
    }
    seen.size == nodes.size
  }

  /** Consistency: every column node has exactly one incoming data
    * property and no outgoing links (reference SsdTypes.isConsistent). */
  def isConsistent: Boolean = columnNodes.forall { c =>
    links.count(_.dst == c.id) == 1 && !links.exists(_.src == c.id)
  }

  /** RDF-style triple set for evaluation (reference
    * EvaluateOctopus.scala:50-101 compares triple sets). */
  def triples: Set[(String, String, String)] = {
    val m = byId
    links.map(l => (m(l.src).label, l.label, m(l.dst).label)).toSet
  }

  def linkCost: Double = links.map(_.weight).sum

  /** Compact JSON serialization (G8; reference stores SSDs as JSON). */
  def toJson: String = {
    def q(s: String) = "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
    val ns = nodes.map {
      case ClassNode(id, l) => s"""{"id":$id,"type":"class","label":${q(l)}}"""
      case ColumnNode(id, l) => s"""{"id":$id,"type":"column","label":${q(l)}}"""
    }.mkString("[", ",", "]")
    val ls = links.map(l =>
      s"""{"src":${l.src},"dst":${l.dst},"label":${q(l.label)},"weight":${l.weight}}""")
      .mkString("[", ",", "]")
    s"""{"nodes":$ns,"links":$ls}"""
  }
}

object SemanticModel {

  /** Parse the toJson format back (minimal hand-rolled JSON reader for
    * exactly the shape toJson emits). */
  def fromJson(json: String): SemanticModel = {
    def objs(arr: String): Seq[String] = {
      val out = collection.mutable.Buffer[String]()
      var depth = 0; var start = -1
      arr.zipWithIndex.foreach { case (c, i) =>
        if (c == '{') { if (depth == 0) start = i; depth += 1 }
        else if (c == '}') { depth -= 1; if (depth == 0) out += arr.substring(start, i + 1) }
      }
      out.toSeq
    }
    def field(o: String, k: String): String = {
      val m = ("\"" + k + "\":(\"(?:[^\"\\\\]|\\\\.)*\"|[^,}]+)").r
        .findFirstMatchIn(o).get.group(1)
      if (m.startsWith("\""))
        m.substring(1, m.length - 1).replace("\\\"", "\"").replace("\\\\", "\\")
      else m
    }
    val nodesArr = json.substring(json.indexOf("\"nodes\":") + 8,
      json.indexOf(",\"links\""))
    val linksArr = json.substring(json.indexOf("\"links\":") + 8)
    val nodes = objs(nodesArr).map { o =>
      val id = field(o, "id").toInt
      if (field(o, "type") == "class") ClassNode(id, field(o, "label"))
      else ColumnNode(id, field(o, "label"))
    }
    val links = objs(linksArr).map { o =>
      SmLink(field(o, "src").toInt, field(o, "dst").toInt,
        field(o, "label"), field(o, "weight").toDouble)
    }
    SemanticModel(nodes, links)
  }

  /** Triple-set evaluation: precision / recall / jaccard (M11, reference
    * EvaluateOctopus.scala:50-101, 2-decimal rounding kept). */
  def evaluate(predicted: SemanticModel, gold: SemanticModel): (Double, Double, Double) = {
    val p = predicted.triples; val g = gold.triples
    val inter = (p & g).size.toDouble
    def r2(x: Double) = math.round(x * 100) / 100.0
    (r2(if (p.isEmpty) 0 else inter / p.size),
      r2(if (g.isEmpty) 0 else inter / g.size),
      r2(if ((p | g).isEmpty) 0 else inter / (p | g).size))
  }
}
