package graft.core

import graft.SparkSpec
import org.apache.spark.storage.StorageLevel

/** Pins the deployment-resolved lineage-cut storage level: single-JVM
  * masters keep localCheckpoint's stock MEMORY_AND_DISK (bench parity);
  * every multi-executor master string gets the one-replica level that
  * makes a single executor death survivable (the r13 kill sweep showed
  * the unreplicated level losing truncated-lineage blocks
  * irrecoverably: CHECKPOINT_RDD_BLOCK_ID_NOT_FOUND on HITS).
  */
class CkptSpec extends SparkSpec {

  test("single-JVM master strings resolve to the stock unreplicated level") {
    assert(Ckpt.singleJvm("local"))
    assert(Ckpt.singleJvm("local[4]"))
    assert(Ckpt.singleJvm("local[*]"))
    assert(Ckpt.singleJvm("local[32,3]")) // retry variant
  }

  test("multi-executor master strings resolve to the replicated level") {
    assert(!Ckpt.singleJvm("local-cluster[2,4,2048]"))
    assert(!Ckpt.singleJvm("spark://host:7077"))
    assert(!Ckpt.singleJvm("yarn"))
    assert(!Ckpt.singleJvm("k8s://https://host:6443"))
  }

  test("level() follows the live session's master and lckpt preserves content") {
    import Ckpt._
    val df = spark.range(100).toDF("id")
    // the suite also runs under SPARK_GRAFT_MASTER=local-cluster in the
    // cross-JVM rehearsal — assert the branch the live master selects
    val expected =
      if (Ckpt.singleJvm(spark.sparkContext.master)) StorageLevel.MEMORY_AND_DISK
      else StorageLevel.DISK_ONLY_2
    assert(Ckpt.level(df) === expected)
    val c = df.lckpt(eager = true)
    assert(c.count() === 100L)
    assert(c.agg(org.apache.spark.sql.functions.sum("id")).head.getLong(0) === 4950L)
  }
}
