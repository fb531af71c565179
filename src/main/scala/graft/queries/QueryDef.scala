package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One catalog entry: a named Spark query over a testdata dir plus the
  * equivalent DuckDB oracle SQL the driver uses for the hash-match
  * correctness gate. Most oracles are static SQL; operators whose oracle
  * needs data-dependent literals (e.g. IVF centroids trained from the
  * table) provide `dynOracle`, evaluated by `graft.Verify` against the
  * actual scale-factor dir right before the oracle dump.
  */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    dynOracle: Option[(SparkSession, String) => String] = None)

object Catalog {
  def all: Seq[QueryDef] =
    ReferenceQueries.defs ++ RelationalQueries.defs ++ PipelineQueries.defs

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(d => d.name -> d.fn).toMap

  def oracleSql: Map[String, String] =
    all.collect { case QueryDef(n, _, Some(sql), _) => n -> sql }.toMap

  def dynamicOracleSql: Map[String, (SparkSession, String) => String] =
    all.collect { case QueryDef(n, _, _, Some(f)) => n -> f }.toMap
}
