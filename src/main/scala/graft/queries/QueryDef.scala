package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One catalog entry: a named Spark query over a testdata dir plus (where
  * SQL-expressible) the equivalent DuckDB oracle SQL the driver uses for the
  * hash-match correctness gate. Non-SQL-expressible operators (minhash
  * internals, LSH bucketing, …) omit the oracle and are covered by ScalaTest
  * instead (SURVEY.md §5).
  */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object Catalog {
  def all: Seq[QueryDef] =
    ReferenceQueries.defs ++ RelationalQueries.defs ++ PipelineQueries.defs

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(d => d.name -> d.fn).toMap

  def oracleSql: Map[String, String] =
    all.collect { case QueryDef(n, _, Some(sql)) => n -> sql }.toMap
}
