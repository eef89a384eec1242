package graft.core

import graft.SparkSpec

/** Read-after-FOREIGN-refresh: the staleness mode the r12 two-JVM race
  * validation did not cover. A long-lived session registers an artifact's
  * catalog entry and caches its file listing; a refresh job in ANOTHER
  * process then rebuilds the artifact (delete-directory + rewrite). The
  * session's next `bucketed()` call must serve the NEW content — not the
  * old rows, and not a FileNotFoundException from the cached listing of
  * deleted files. The fix under test: `register()` records the meta-file
  * text at registration and, on a later call, drops + re-creates +
  * refreshes the table when the on-disk meta changed.
  */
class ArtifactForeignRefreshSpec extends SparkSpec {
  import spark.implicits._

  private val addOpens = Seq(
    "java.base/java.lang", "java.base/java.lang.invoke",
    "java.base/java.lang.reflect", "java.base/java.io",
    "java.base/java.net", "java.base/java.nio",
    "java.base/java.util", "java.base/java.util.concurrent",
    "java.base/java.util.concurrent.atomic",
    "java.base/sun.nio.ch", "java.base/sun.nio.cs",
    "java.base/sun.security.action", "java.base/sun.util.calendar",
  ).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))

  private def mainClassesDir: String =
    java.nio.file.Paths.get(
      ArtifactStore.getClass.getProtectionDomain.getCodeSource.getLocation.toURI).toString

  /** Run [[graft.tools.ArtifactForeignRefresh]] in a bare second JVM
    * sharing this suite's store root. Returns (exitCode, combined output).
    */
  private def foreignRefresh(sourceDir: String, name: String): (Int, String) = {
    val javaBin = java.nio.file.Paths.get(
      sys.props("java.home"), "bin", "java").toString
    val cmd = (Seq(javaBin) ++ addOpens ++ Seq(
      "-Xmx2g", "-Dspark.ui.enabled=false",
      "-cp", s"$mainClassesDir:/opt/spark/jars/*",
      "graft.tools.ArtifactForeignRefresh", sourceDir, name)).toArray
    val pb = new ProcessBuilder(cmd: _*)
    pb.redirectErrorStream(true)
    pb.environment().put("SPARK_GRAFT_ARTIFACTS", ArtifactStore.storeRoot)
    val p = pb.start()
    val out = new String(p.getInputStream.readAllBytes(), "UTF-8")
    val done = p.waitFor(180, java.util.concurrent.TimeUnit.SECONDS)
    if (!done) { p.destroyForcibly(); fail(s"child JVM timed out\n$out") }
    (p.exitValue(), out)
  }

  test("a long-lived session serves a FOREIGN rebuild's content on its next read") {
    val srcDir = TempStores.scratchDir("art-foreign-src-")
    val name = s"spec_foreign_${System.nanoTime()}"
    def writeSource(version: String, n: Int): Unit =
      (1 to n).map(i => (i.toLong, version)).toDF("k", "ver")
        .repartition(1).write.mode("overwrite")
        .parquet(s"$srcDir/src.parquet")
    def fp = ArtifactStore.sourceFingerprint(srcDir, Seq("src"))

    writeSource("v1", 3)
    val a = ArtifactStore.bucketed(spark, name, fp, "k", 2)(
      spark.read.parquet(s"$srcDir/src.parquet"))
    // materialize: caches the v1 file listing in this session's catalog
    assert(a.collect().map(_.getString(1)).toSet == Set("v1"))

    // the foreign refresh: source changes, ANOTHER process rebuilds
    writeSource("v2", 5)
    val (exit, out) = foreignRefresh(srcDir, name)
    assert(exit == 0, out)
    assert(out.contains("[child] rows=5"), out)

    // this session's next read: current fingerprint, so the build closure
    // must NOT run — and the result must be the child's v2 content, not
    // the stale v1 listing (or a FileNotFoundException on deleted files)
    val b = ArtifactStore.bucketed(spark, name, fp, "k", 2) {
      fail("artifact is current after the foreign rebuild — must not rebuild again")
    }
    val rows = b.collect()
    assert(rows.length == 5, rows.mkString(","))
    assert(rows.map(_.getString(1)).toSet == Set("v2"))
    // and the re-registered entry still carries the bucket spec
    val cat = spark.sql(s"DESCRIBE TABLE EXTENDED graft_art_$name")
      .collect().map(r => s"${r.getString(0)}=${r.getString(1)}").mkString("\n")
    assert(cat.contains("Num Buckets=2"), cat)
  }

  test("an UNCHANGED artifact re-read takes the fast path (no drop/re-create)") {
    val srcDir = TempStores.scratchDir("art-stable-src-")
    val name = s"spec_stable_${System.nanoTime()}"
    Seq((1L, "x")).toDF("k", "ver").repartition(1)
      .write.mode("overwrite").parquet(s"$srcDir/src.parquet")
    val fp = ArtifactStore.sourceFingerprint(srcDir, Seq("src"))
    ArtifactStore.bucketed(spark, name, fp, "k", 2)(
      spark.read.parquet(s"$srcDir/src.parquet"))
    val t1 = spark.table(s"graft_art_$name")
    // second call with identical meta: same catalog entry survives
    ArtifactStore.bucketed(spark, name, fp, "k", 2)(fail("must not rebuild"))
    assert(spark.table(s"graft_art_$name").collect().toSeq == t1.collect().toSeq)
  }
}
