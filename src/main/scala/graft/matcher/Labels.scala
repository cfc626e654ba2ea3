package graft.matcher

/** Semantic-type labels for the testdata columns — the analogue of the
  * reference's manual SemanticTypeLabels (reference matcher
  * data/Labels.scala:45-78, loaded from label CSVs). Train/holdout split
  * is by table (reference eval/DataPartitioner.scala partitions by
  * dataset the same way). */
object Labels {

  val classes: Seq[String] =
    Seq("identifier", "name", "category", "money", "date", "quantity", "text")

  /** (table, column) -> semantic class, training portion. */
  val train: Seq[(String, String, String)] = Seq(
    ("customer", "c_custkey", "identifier"),
    ("customer", "c_name", "name"),
    ("customer", "c_nationkey", "identifier"),
    ("customer", "c_acctbal", "money"),
    ("customer", "c_mktsegment", "category"),
    ("orders", "o_orderkey", "identifier"),
    ("orders", "o_custkey", "identifier"),
    ("orders", "o_orderstatus", "category"),
    ("orders", "o_totalprice", "money"),
    ("orders", "o_orderdate", "date"),
    ("orders", "o_orderpriority", "category"),
    ("lineitem", "l_orderkey", "identifier"),
    ("lineitem", "l_partkey", "identifier"),
    ("lineitem", "l_suppkey", "identifier"),
    ("lineitem", "l_linenumber", "quantity"),
    ("lineitem", "l_quantity", "quantity"),
    ("lineitem", "l_extendedprice", "money"),
    ("lineitem", "l_discount", "quantity"),
    ("lineitem", "l_tax", "quantity"),
    ("lineitem", "l_returnflag", "category"),
    ("lineitem", "l_linestatus", "category"),
    ("lineitem", "l_shipdate", "date"),
    ("part", "p_partkey", "identifier"),
    ("part", "p_name", "name"),
    ("part", "p_brand", "category"),
    ("part", "p_type", "category"),
    ("part", "p_size", "quantity"),
    ("part", "p_retailprice", "money"),
    ("supplier", "s_suppkey", "identifier"),
    ("supplier", "s_name", "name"),
    ("supplier", "s_nationkey", "identifier"),
    ("supplier", "s_acctbal", "money"),
    ("documents", "doc_id", "identifier"),
    ("documents", "text", "text"),
    ("documents", "lang", "category"),
    ("documents", "source", "category"),
    ("documents", "n_chars", "quantity"))

  /** Held-out tables with expected classes, for evaluation. */
  val holdout: Seq[(String, String, String)] = Seq(
    ("nation", "n_nationkey", "identifier"),
    ("nation", "n_name", "name"),
    ("nation", "n_regionkey", "identifier"),
    ("region", "r_regionkey", "identifier"),
    ("region", "r_name", "name"),
    ("events", "event_id", "identifier"),
    ("events", "ts", "date"),
    ("events", "user_id", "identifier"),
    ("events", "event_type", "category"),
    ("events", "value", "money"),
    ("events", "props", "text"))

  def trainTables: Seq[(String, Seq[String])] =
    train.groupBy(_._1).view.mapValues(_.map(_._2)).toSeq.sortBy(_._1)

  def holdoutTables: Seq[(String, Seq[String])] =
    holdout.groupBy(_._1).view.mapValues(_.map(_._2)).toSeq.sortBy(_._1)
}
