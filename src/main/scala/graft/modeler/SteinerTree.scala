package graft.modeler

/** Top-k Steiner-tree approximation over the alignment graph (G4,
  * reference KarmaSuggestModel.scala:569-608 via Karma's ModelLearner
  * .hypothesize). Uses the Takahashi-Matsuyama heuristic (iteratively
  * connect the nearest unconnected terminal by shortest path) seeded
  * from each terminal, plus single-edge perturbations for diversity;
  * candidates are ranked by total weight and deduplicated by edge set.
  * Alignment graphs are ontology-sized, so this is driver-side. */
object SteinerTree {

  final case class Edge(src: String, dst: String, label: String, weight: Double)
  final case class Tree(edges: Seq[Edge]) {
    def cost: Double = edges.map(_.weight).sum
    def nodeSet: Set[String] = edges.flatMap(e => Seq(e.src, e.dst)).toSet
    def key: Set[(String, String, String)] =
      edges.map(e => (e.src, e.label, e.dst)).toSet
  }

  /** Dijkstra over the undirected view; returns (dist, path-edges) from
    * `from` to every node. */
  private def shortestPaths(edges: Seq[Edge], from: String)
      : Map[String, (Double, List[Edge])] = {
    val adj = edges.flatMap(e => Seq(e.src -> e, e.dst -> e))
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val dist = collection.mutable.Map(from -> (0.0, List.empty[Edge]))
    val pq = collection.mutable.PriorityQueue((0.0, from))(
      Ordering.by[(Double, String), Double](-_._1))
    val done = collection.mutable.Set[String]()
    while (pq.nonEmpty) {
      val (d, n) = pq.dequeue()
      if (done.add(n)) {
        adj.getOrElse(n, Nil).foreach { e =>
          val other = if (e.src == n) e.dst else e.src
          val nd = d + e.weight
          if (nd < dist.get(other).map(_._1).getOrElse(Double.MaxValue)) {
            dist(other) = (nd, e :: dist(n)._2)
            pq.enqueue((nd, other))
          }
        }
      }
    }
    dist.toMap
  }

  /** Takahashi-Matsuyama from a given start terminal. */
  private def tmTree(edges: Seq[Edge], terminals: Seq[String],
      start: String): Option[Tree] = {
    var treeEdges = Set.empty[Edge]
    var treeNodes = Set(start)
    var remaining = terminals.filterNot(_ == start).toSet
    while (remaining.nonEmpty) {
      // nearest (terminal, attach-path) over all tree nodes
      val best = treeNodes.toSeq.sorted.flatMap { tn =>
        val sp = shortestPaths(edges, tn)
        remaining.toSeq.sorted.flatMap(t => sp.get(t).map(t -> _))
      }.sortBy { case (t, (d, _)) => (d, t) }.headOption
      best match {
        case Some((t, (_, path))) =>
          treeEdges ++= path
          treeNodes ++= path.flatMap(e => Seq(e.src, e.dst))
          remaining -= t
          remaining --= remaining.filter(treeNodes.contains)
        case None => return None // disconnected
      }
    }
    Some(Tree(treeEdges.toSeq.sortBy(e => (e.src, e.label, e.dst))))
  }

  /** Top-k trees spanning `terminals`, ranked by (cost, edge-set key). */
  def topK(edges: Seq[Edge], terminals: Seq[String], k: Int): Seq[Tree] = {
    if (terminals.isEmpty) return Nil
    if (terminals.size == 1) return Seq(Tree(Nil))
    val seeds = terminals.flatMap(t => tmTree(edges, terminals, t))
    // diversity: for each seed tree, retry with each tree edge removed
    val perturbed = seeds.flatMap { tr =>
      tr.edges.flatMap { drop =>
        tmTree(edges.filterNot(e => e == drop), terminals, terminals.head)
      }
    }
    (seeds ++ perturbed)
      .groupBy(_.key).map(_._2.head).toSeq
      .sortBy(t => (t.cost, t.key.toSeq.sorted.mkString("|")))
      .take(k)
  }
}
