package graft.tools

import org.apache.spark.sql.SparkSession

/** Second-JVM half of the ArtifactStore read-after-foreign-refresh spec:
  * rebuilds (or reads, if current) a named artifact from a source parquet
  * dir in its OWN process — own Spark catalog, own file-lock acquisition —
  * so a parent spec's long-lived session can verify it detects the foreign
  * rebuild on its next read. This is the deployment event the store must
  * survive: a refresh job updates the lake table while a long-running
  * analytics session still holds a catalog entry (and cached file listing)
  * for the PREVIOUS build.
  *
  * args: `<sourceDir> <artifactName>`; `SPARK_GRAFT_ARTIFACTS` must point
  * at the shared store root. The artifact is the `src` table of sourceDir,
  * bucketed 2 ways on `k`. Prints `[child] rows=N` on success.
  */
object ArtifactForeignRefresh {
  def main(args: Array[String]): Unit = {
    val Array(sourceDir, name) = args
    val spark = SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fp = graft.core.ArtifactStore.sourceFingerprint(sourceDir, Seq("src"))
    val df = graft.core.ArtifactStore.bucketed(spark, name, fp, "k", 2)(
      spark.read.parquet(s"$sourceDir/src.parquet"))
    println(s"[child] rows=${df.count()}")
    spark.stop()
  }
}
