package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: audit the standing-graph artifact invariants against
  * independent recomputation from the fact table — `runMain
  * graft.tools.ArtifactAudit <sfDir>`. Exists because artifact-fed
  * session memos (r14) make artifact CONTENT the correctness root for
  * the whole co-purchase family; a wrong artifact would propagate
  * everywhere the memos reach.
  */
object ArtifactAudit {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder().master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val li = graft.sources.TpchGraph.lineitemDeduped(spark, dir)
      .select(col("l_orderkey").as("k"), col("l_partkey").as("p")).distinct()
    val half = li.join(li.withColumnsRenamed(Map("p" -> "p2")), "k")
      .filter(col("p") < col("p2"))
      .select(col("p").as("u"), col("p2").as("v")).distinct()
    val nHalf = half.count()

    val adj = graft.sources.TpchGraph.storedRankedAdjacency(spark, dir)
    val nAdj = adj.count()
    val nAdjDistinct = adj.select("u", "v").distinct().count()
    val memoHalf = graft.sources.TpchGraph.copurchaseEdges(spark, dir).count()
    val memoMirror = graft.sources.TpchGraph.copurchaseEdgesMirrored(spark, dir).count()

    println(s"[audit] independent half=$nHalf expected mirror=${2 * nHalf}")
    println(s"[audit] ranked_adj rows=$nAdj distinct=$nAdjDistinct memoHalf=$memoHalf memoMirror=$memoMirror")
    val ok = nAdj == 2 * nHalf && nAdjDistinct == nAdj &&
      memoHalf == nHalf && memoMirror == 2 * nHalf
    println(s"[audit] ${if (ok) "OK" else "MISMATCH"}")
    spark.stop()
    if (!ok) sys.exit(1)
  }
}
