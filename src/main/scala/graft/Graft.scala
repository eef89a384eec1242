package graft

import graft.core.{GraphIO, GraphState, Seed}
import org.apache.spark.sql.SparkSession

/** Top-level facade: the one-stop entry point for a user switching from
  * the reference application to this engine.
  *
  * {{{
  *   val spark = Graft.session()              // engine-tuned SparkSession
  *   val g     = Graft.openOrSeed(spark, dir) // load store, or seed a new one
  *   g.nodesOfType("taxonnode") ...           // operator surface: GraphState,
  *                                            // operators.Motif, functions.*
  * }}}
  */
object Graft {

  /** An engine-tuned session: custom expressions callable from SQL, the
    * top-k strategy + rewrite rule installed, AQE on (runtime re-plan,
    * skew-join splitting), and the parquet nanos flag legacy
    * TIMESTAMP(NANOS) event files need (current files are native
    * `timestamp[us]`; the flag is then a no-op). `shufflePartitions` should track cluster cores — the
    * local default mirrors the test environment.
    */
  def session(appName: String = "graft",
              master: String = "local[*]",
              shufflePartitions: Int = 32): SparkSession = {
    val spark = SparkSession.builder()
      .appName(appName)
      .master(master)
      .config("spark.sql.extensions", classOf[graft.plans.GraftExtensions].getName)
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    // getOrCreate may return a pre-existing session built WITHOUT the
    // extension (tests, shells) — register directly (idempotent):
    // functions, the planner strategy, AND the rank-filter rewrite rule
    graft.plans.GraftExtensions.registerAll(spark)
    graft.plans.TopKRewrite.enable(spark)
    spark
  }

  /** Open a graph store, or seed a fresh one (time index, Holocene label,
    * outcomes, Life root — reference `Seed.fs:48-99`) when the directory
    * has no graph yet — the reference's open-or-init behavior
    * (`Storage.fs:195-220` + `Library.fs:320-325`).
    */
  def openOrSeed(spark: SparkSession, dir: String): GraphState = {
    val nodesPath = new org.apache.hadoop.fs.Path(s"$dir/nodes")
    val fs = nodesPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(nodesPath)) GraphIO.load(spark, dir)
    else {
      val seeded = Seed.seedGraph(spark)
      GraphIO.save(seeded, dir)
      GraphIO.load(spark, dir)
    }
  }
}
