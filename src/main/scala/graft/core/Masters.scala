package graft.core

import org.apache.spark.sql.SparkSession

/** Session-master resolution shared by the runtime mains (Verify, Bench)
  * and the test harness.
  *
  * `SPARK_GRAFT_MASTER` overrides the default single-process
  * `local[cpus]`. The load-bearing override is `local-cluster[W,C,MB]`:
  * Spark's standalone-cluster test master, which launches W REAL executor
  * JVMs (C cores / MB megabytes each) from `SPARK_HOME`. Everything a
  * single-process `local[N]` run never exercises crosses a process
  * boundary there — closure serialization of every operator lambda, the
  * custom Catalyst expressions riding serialized plan fragments,
  * broadcast values (Bloom filters, centroid arrays, frontier maps)
  * re-materialized by executor-side deserialization, GraphX
  * vertex/edge payloads, and task-result traffic — i.e. the classic
  * works-locally-dies-on-cluster failure class, made testable on one box.
  */
object Masters {

  def resolve(cpus: String): String =
    sys.env.getOrElse("SPARK_GRAFT_MASTER", s"local[$cpus]")

  /** Apply the resolved master; for executor-JVM masters also ship the
    * library's classes. A local-cluster executor is launched with only
    * `SPARK_HOME/jars` on its classpath — the application's own classes
    * must ride `spark.executor.extraClassPath` (a same-host directory
    * path; a real cluster submits an application jar, which is the same
    * contract with a copy step). The main-classes directory is derived
    * from this class's own code source; extra entries (e.g. the test
    * classes directory when running specs cross-JVM) join via
    * `SPARK_GRAFT_EXEC_CP`.
    */
  def configure(b: SparkSession.Builder, cpus: String): SparkSession.Builder = {
    val m = resolve(cpus)
    // SPARK_GRAFT_SERIALIZER=org.apache.spark.serializer.KryoSerializer
    // runs the gate under the serializer most real clusters deploy with
    // — shuffle/broadcast/task-result bytes take the Kryo path instead
    // of Java serialization, the second axis (after the master) on
    // which single-process runs under-test a deployment.
    val b0 = sys.env.get("SPARK_GRAFT_SERIALIZER")
      .fold(b)(s => b.config("spark.serializer", s))
    val b1 = b0.master(m)
    // multi-executor masters: blocks replicate (Ckpt's DISK_ONLY_2
    // checkpoint level — disk-resident precisely so both replication
    // directions stay zero-allocation; see Ckpt's scaladoc for why the
    // memory-tiered _2 levels OOMed).
    // (1) past 8 MB the replication upload must STREAM — the
    // default single-buffer UploadBlock message allocates the whole
    // block contiguously on top of an already-pressured heap, and the
    // r13 memory-constrained rig OOMed on exactly that allocation with
    // ~30 MB checkpoint blocks (a 32 MB threshold missed them; 8 MB
    // keeps the replication path's transient allocation bounded at
    // frame size no matter the block); (2) when an executor dies,
    // re-replicate its blocks' lost copies proactively so a LATER
    // second failure still finds a replica (the kill-sweep's
    // repeated-churn case).
    // Churn resilience under memory pressure (measured on the r13
    // 2 GiB-executor sweep): an executor that OOMs takes seconds to be
    // relaunched by the worker, and in that window the scheduler can
    // burn all 4 default task attempts against the dying JVM
    // (RejectedExecutionException from its draining thread pool) —
    // aborting a job the NEXT executor would have finished. Exclusion
    // routes retries away from a failing executor; 8 attempts outlast
    // the relaunch window. The two memory knobs bound the UNMANAGED
    // heap users that a 2 GiB executor cannot absorb: 4 concurrent
    // reducers × 48 MB default in-flight fetch is ~10% of the heap in
    // netty buffers, and the default 50% unevictable storage region is
    // wrong for this engine's storage profile — its bulk is SER+disk
    // checkpoint blocks that evict gracefully, so protecting less
    // storage hands execution the headroom that UNABLE_TO_ACQUIRE_MEMORY
    // task failures were dying for.
    val b2 =
      if (Ckpt.singleJvm(m)) b1
      else b1
        .config("spark.network.maxRemoteBlockSizeFetchToMem", "8m")
        .config("spark.storage.replication.proactive", "true")
        .config("spark.excludeOnFailure.enabled", "true")
        .config("spark.task.maxFailures", "8")
        .config("spark.reducer.maxSizeInFlight", "16m")
        .config("spark.memory.storageFraction", "0.3")
    if (!m.startsWith("local-cluster")) b2
    else {
      // decode via toURI→Paths: getPath returns a URL-ENCODED path
      // (spaces as %20 etc.), which breaks executor class loading for a
      // classes dir under any path needing escapes — and only on the
      // local-cluster axis, the worst place for a silent divergence
      val own =
        try {
          val loc = Masters.getClass.getProtectionDomain.getCodeSource.getLocation
          try java.nio.file.Paths.get(loc.toURI).toString
          catch { case _: Throwable => loc.getPath }
        } catch { case _: Throwable => "" }
      val entries = (own +: sys.env.get("SPARK_GRAFT_EXEC_CP").toSeq)
        .filter(_.nonEmpty)
      b2.config("spark.executor.extraClassPath",
        entries.mkString(java.io.File.pathSeparator))
    }
  }
}
