package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One engine query: the Spark implementation plus (when SQL-expressible)
  * the equivalent ANSI SQL the driver runs in DuckDB as a correctness
  * oracle. Column names/types must match between the two — the harness
  * sorts columns by name and hash-compares values.
  */
final case class QueryDef(
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String] = None)

object QueryDef {
  /** Collect (name -> fn) and (name -> oracle) maps from query registries. */
  def split(regs: Map[String, QueryDef]*)
      : (Map[String, (SparkSession, String) => DataFrame], Map[String, String]) = {
    val all = regs.reduce(_ ++ _)
    (all.map { case (k, v) => k -> v.fn },
     all.collect { case (k, QueryDef(_, Some(sql))) => k -> sql })
  }
}
