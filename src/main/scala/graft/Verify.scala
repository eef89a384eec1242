package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    // optional comma-separated name-prefix filter (local iteration only —
    // the driver always runs the full set)
    val only: String => Boolean =
      if (args.length > 2) { val ps = args(2).split(','); n => ps.exists(n.startsWith) }
      else _ => true
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // SPARK_GRAFT_MASTER=local-cluster[2,8,4096] runs this same gate
    // across real executor JVMs (see graft.core.Masters)
    val spark = graft.core.Masters.configure(SparkSession.builder(), cpus)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    SparkEntry.queries.filter(kv => only(kv._1)).foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
        // a failed query must not leave a PREVIOUS run's output in place —
        // the gate would silently compare stale (possibly passing) results
        val stale = Paths.get(s"$outDir/$name")
        if (Files.exists(stale)) {
          import scala.jdk.CollectionConverters._
          Files.walk(stale).iterator().asScala.toSeq.reverse.foreach(Files.delete)
        }
      }
    }
    // p110's oracle needs its Verify-time golden table (deflate lengths
    // computed by a direct Deflater call on the same input) spliced in
    // before the dump — see graft.operators.DeflateGolden.
    if (only("p110_compression_quality"))
      graft.operators.DeflateGolden.prepare(spark, sfDir)
    // p130's oracle needs its Verify-time splice (derived sign-LSH
    // bucket tables whose SHAPE depends on the corpus count) — see
    // graft.operators.DerivedLshGolden.
    if (only("p130_derived_lsh_endgame"))
      graft.operators.DerivedLshGolden.prepare(spark, sfDir)
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"),
      Verify.oracleJson(only))
    spark.stop()
  }

  // JSON string escape: backslash, quote, and ALL control chars (<0x20)
  // — a tab or CR in builder-authored SQL would otherwise make the
  // driver's json.load fail and silently zero the round's correctness.
  private def q(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""

  private[graft] def oracleJson(only: String => Boolean): String =
    SparkEntry.oracleSql.filter(kv => only(kv._1))
      .map { case (k, v) =>
        s"${q(k)}: ${q(graft.operators.DerivedLshGolden.substitute(
          graft.operators.DeflateGolden.substitute(v)))}"
      }.mkString("{", ",", "}")
}

/** Dump ALL oracle SQL to a json file without starting Spark — feeds
  * `tools/typesweep.py`'s static DuckDB type audit (the check that kills
  * the uncast-sum → HUGEINT hash-drift class before the driver sees it). */
object OracleDump {
  def main(args: Array[String]): Unit = {
    val out = Paths.get(args(0))
    if (out.getParent != null) Files.createDirectories(out.getParent)
    Files.writeString(out, Verify.oracleJson(_ => true))
  }
}
