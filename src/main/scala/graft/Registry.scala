package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One declared engine capability: a named deterministic query over the
  * test tables, with an optional DuckDB-equivalent oracle SQL.
  *
  * Determinism contract (BASELINE.md): output fully ordered, floating
  * aggregates computed exactly (decimal) then rounded, column names
  * identical between the Spark plan and the oracle SQL.
  */
final case class Q(
    name: String,
    doc: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object Registry {
  /** All query modules, merged. Order is stable for reporting. */
  def all: Seq[Q] =
    queries.Relational.all ++
      queries.Analytic.all ++
      queries.TextOps.all ++
      queries.DedupOps.all ++
      queries.SimilarityOps.all ++
      queries.ContactOps.all ++
      queries.MultimodalOps.all ++
      queries.StreamingOps.all

  def queriesMap: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.run).toMap

  def oracleMap: Map[String, String] =
    all.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
