package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Per-semantic-class value rewrites (reference
  * transformation/DataModelTransformation.scala:16-66, which shells out
  * to `sed -E` per value — here a pure Catalyst `regexp_replace`, fully
  * codegen'd and distributed). */
final case class Transformation(
    semanticClass: String, sourcePattern: String, outputFormat: String)

object Transformations {

  /** Apply each transformation to the value column of rows whose label
    * matches its semantic class. */
  def apply(df: DataFrame, valueCol: String, labelCol: String,
      transforms: Seq[Transformation]): DataFrame = {
    val v = transforms.foldLeft(col(valueCol)) { (acc, t) =>
      when(col(labelCol) === t.semanticClass,
        regexp_replace(acc, t.sourcePattern, t.outputFormat)).otherwise(acc)
    }
    df.withColumn(valueCol, v)
  }
}
