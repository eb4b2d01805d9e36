package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One driver-verifiable query: a Spark program over the testdata tables plus
  * (when SQL-expressible) the equivalent DuckDB oracle SQL. Column names MUST
  * match between the two — the driver sorts columns by name and hashes values.
  */
final case class QueryDef(
    name: String,
    spark: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    doc: String)

object Registry {
  def all: Seq[QueryDef] =
    RelationalQueries.defs ++ MergeQueries.defs ++ TextQueries.defs ++
      VectorQueries.defs ++ StreamingQueries.defs

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.spark).toMap

  def oracleSql: Map[String, String] =
    all.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
