package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Semantic source description attributes (reference
  * types/SsdTypes.scala:318-356): each SSD attribute carries SQL text
  * (`"select col from table"`) that the reference declares but never
  * executes. On Spark it runs for free: register the source tables as
  * views and hand the text to `spark.sql`, so SSD attribute
  * transformations (projections, concatenations, case mapping) are real
  * executable column derivations. */
final case class SsdAttribute(id: Int, name: String, sql: String)

final case class Ssd(
    id: Int,
    name: String,
    attributes: Seq[SsdAttribute],
    ontologyIds: Seq[Int] = Nil) {

  /** Materialize one attribute (a one-column frame) via its SQL. */
  def attributeFrame(spark: SparkSession, attr: SsdAttribute): DataFrame =
    spark.sql(attr.sql)

  /** Materialize every attribute; attribute SQL must yield one column. */
  def materialize(spark: SparkSession): Map[String, DataFrame] =
    attributes.map(a => a.name -> attributeFrame(spark, a)).toMap
}

object Ssd {
  /** Identity SSD for a table's columns (reference
    * OctopusInterface.generateEmptySsd:414-437). */
  def identity(id: Int, table: String, cols: Seq[String]): Ssd =
    Ssd(id, table, cols.zipWithIndex.map { case (c, i) =>
      SsdAttribute(i, c, s"select `$c` from $table")
    })
}
