package graft.modeler

/** Minimal ontology model + Turtle-subset parser (reference modeler
  * loads OWL via Karma/Jena — KarmaParams.scala:48-205; we parse the
  * subset the modeler actually uses: classes, data properties, object
  * properties with domain/range, subclass axioms).
  *
  * Graphs here are ontology-sized (tens of nodes), so everything is
  * driver-side Scala — SURVEY §2.11: distribution is unnecessary and
  * would only add latency.
  */
final case class DataProp(uri: String, domain: String)
final case class ObjectProp(uri: String, domain: String, range: String)

final case class Ontology(
    classes: Set[String],
    dataProps: Seq[DataProp],
    objectProps: Seq[ObjectProp],
    subClassOf: Map[String, String]) {

  /** Classes plus all superclasses (closure). */
  def classClosure(c: String): List[String] =
    c :: subClassOf.get(c).map(classClosure).getOrElse(Nil)

  /** Data properties available on a class incl. inherited ones. */
  def dataPropsOf(c: String): Seq[DataProp] = {
    val cs = classClosure(c).toSet
    dataProps.filter(p => cs.contains(p.domain))
  }

  /** Object properties whose domain includes the class. */
  def objectPropsOf(c: String): Seq[ObjectProp] = {
    val cs = classClosure(c).toSet
    objectProps.filter(p => cs.contains(p.domain))
  }
}

object Ontology {

  /** Parse a pragmatic Turtle subset:
    * {{{
    * :Customer a owl:Class .
    * :SpecialCustomer rdfs:subClassOf :Customer .
    * :name a owl:DatatypeProperty ; rdfs:domain :Customer .
    * :placedBy a owl:ObjectProperty ; rdfs:domain :Order ; rdfs:range :Customer .
    * }}}
    */
  def parseTurtle(text: String): Ontology = {
    val statements = text.split("\\.\\s*\n|\\.\\s*$").map(_.trim).filter(_.nonEmpty)
      .filterNot(s => s.startsWith("@prefix") || s.startsWith("#"))
    var classes = Set.empty[String]
    var dataProps = Vector.empty[DataProp]
    var objectProps = Vector.empty[ObjectProp]
    var subClassOf = Map.empty[String, String]

    def localName(t: String): String =
      t.stripPrefix(":").replaceAll("^.*[:#/]", "")

    statements.foreach { st =>
      val clauses = st.split(";").map(_.trim).filter(_.nonEmpty)
      val firstToks = clauses.head.split("\\s+")
      val subject = localName(firstToks.head)
      // clause list: first clause minus the subject, then the rest
      val pairs = (firstToks.drop(1).mkString(" ") +: clauses.tail.toSeq)
        .map(_.split("\\s+")).collect { case t if t.length >= 2 => (t(0), t(1)) }
      var isData = false; var isObject = false
      var domain: Option[String] = None; var range: Option[String] = None
      pairs.foreach {
        case ("a" | "rdf:type", obj) => localName(obj) match {
          case "Class" => classes += subject
          case "DatatypeProperty" => isData = true
          case "ObjectProperty" => isObject = true
          case _ =>
        }
        case (p, obj) if p.endsWith("subClassOf") =>
          subClassOf += subject -> localName(obj)
        case (p, obj) if p.endsWith("domain") => domain = Some(localName(obj))
        case (p, obj) if p.endsWith("range") => range = Some(localName(obj))
        case _ =>
      }
      if (isData) domain.foreach(d => dataProps :+= DataProp(subject, d))
      if (isObject) for (d <- domain; r <- range)
        objectProps :+= ObjectProp(subject, d, r)
    }
    Ontology(classes, dataProps, objectProps, subClassOf)
  }

  /** Built-in TPC-H-domain ontology used by the modeler queries. */
  val tpch: Ontology = parseTurtle("""
    :Customer a owl:Class .
    :Order a owl:Class .
    :LineItem a owl:Class .
    :Part a owl:Class .
    :Supplier a owl:Class .
    :Nation a owl:Class .
    :Region a owl:Class .
    :custkey a owl:DatatypeProperty ; rdfs:domain :Customer .
    :name a owl:DatatypeProperty ; rdfs:domain :Customer .
    :acctbal a owl:DatatypeProperty ; rdfs:domain :Customer .
    :mktsegment a owl:DatatypeProperty ; rdfs:domain :Customer .
    :orderkey a owl:DatatypeProperty ; rdfs:domain :Order .
    :orderdate a owl:DatatypeProperty ; rdfs:domain :Order .
    :totalprice a owl:DatatypeProperty ; rdfs:domain :Order .
    :orderstatus a owl:DatatypeProperty ; rdfs:domain :Order .
    :orderpriority a owl:DatatypeProperty ; rdfs:domain :Order .
    :quantity a owl:DatatypeProperty ; rdfs:domain :LineItem .
    :extendedprice a owl:DatatypeProperty ; rdfs:domain :LineItem .
    :discount a owl:DatatypeProperty ; rdfs:domain :LineItem .
    :shipdate a owl:DatatypeProperty ; rdfs:domain :LineItem .
    :partname a owl:DatatypeProperty ; rdfs:domain :Part .
    :brand a owl:DatatypeProperty ; rdfs:domain :Part .
    :parttype a owl:DatatypeProperty ; rdfs:domain :Part .
    :retailprice a owl:DatatypeProperty ; rdfs:domain :Part .
    :suppname a owl:DatatypeProperty ; rdfs:domain :Supplier .
    :suppbal a owl:DatatypeProperty ; rdfs:domain :Supplier .
    :nationname a owl:DatatypeProperty ; rdfs:domain :Nation .
    :regionname a owl:DatatypeProperty ; rdfs:domain :Region .
    :placedBy a owl:ObjectProperty ; rdfs:domain :Order ; rdfs:range :Customer .
    :contains a owl:ObjectProperty ; rdfs:domain :Order ; rdfs:range :LineItem .
    :ofPart a owl:ObjectProperty ; rdfs:domain :LineItem ; rdfs:range :Part .
    :suppliedBy a owl:ObjectProperty ; rdfs:domain :LineItem ; rdfs:range :Supplier .
    :custNation a owl:ObjectProperty ; rdfs:domain :Customer ; rdfs:range :Nation .
    :suppNation a owl:ObjectProperty ; rdfs:domain :Supplier ; rdfs:range :Nation .
    :inRegion a owl:ObjectProperty ; rdfs:domain :Nation ; rdfs:range :Region .
  """)
}
