package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local SparkSession for all suites (one JVM-wide session —
  * `getOrCreate` returns the same instance across suites).
  *
  * `SPARK_GRAFT_MASTER=local-cluster[2,4,2048]` (with
  * `SPARK_GRAFT_EXEC_CP` pointing at the test-classes dir and
  * `SPARK_HOME` set) runs every suite against REAL executor JVMs —
  * the cross-process serialization rehearsal; see [[graft.core.Masters]].
  */
trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = graft.core.Masters.configure(
      SparkSession.builder(), "4")
    .appName("graft-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  lazy val sf: String = "/root/testdata/sf0.001"
}
