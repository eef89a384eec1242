package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One verifiable query: a Spark implementation over the driver's parquet
  * tables and (where SQL-expressible) an equivalent DuckDB oracle. Column
  * names/aliases MUST match between the two — the driver sorts columns by
  * name before hashing.
  */
final case class Q(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    doc: String
)

object Registry {
  def all: Seq[Q] = GraphQueries.all ++ RelationalQueries.all ++ PipelineQueries.all

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.fn).toMap

  def oracleSql: Map[String, String] =
    all.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
