package graft

import graft.operators.Registry
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` / `oracleSql` are assembled from [[graft.operators.Registry]]:
  * one entry per implemented operator family from SURVEY §2 (graph ops on
  * the TPC-H-derived property graph), the relational layer, and the
  * training-data pipeline operators (dedup / similarity / text analysis /
  * streaming / multimodal).
  */
object SparkEntry {

  /** Flagship query on sf=0.001; driver smoke-checks rows>0.
    * Revenue by nation: fact-fact shuffle join + broadcast dims + hash agg.
    */
  def entry(spark: SparkSession): DataFrame =
    Registry.queries("q02_revenue_by_nation")(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Registry.queries

  def oracleSql: Map[String, String] = Registry.oracleSql
}
