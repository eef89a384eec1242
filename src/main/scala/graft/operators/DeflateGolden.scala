package graft.operators

import org.apache.spark.sql.SparkSession

/** Verify-time golden table closing p110's oracle hole.
  *
  * DEFLATE output is deterministic for a fixed zlib level but not a
  * cross-engine quantity — DuckDB cannot recompute it, so p110 was the
  * gate's last `no_oracle` row. Instead of exempting the column, Verify
  * generates a golden `(doc_id, n_deflate)` VALUES table at dump time by
  * calling `java.util.zip.Deflater` DIRECTLY on `String → UTF-8 bytes`
  * — an independent code path from the [[graft.functions.expressions
  * .DeflateLen]] expression's `UTF8String` eval/codegen paths — and
  * splices it into the oracle SQL at [[Marker]]. The gate then
  * hash-checks ALL five p110 columns: a codegen bug, null-handling slip,
  * or row-misalignment in the expression fails the round, while the
  * compression algorithm itself rests on the JDK plus DeflateLenSpec's
  * pinned goldens.
  *
  * When nothing was prepared (OracleDump's Spark-less dump for the
  * typesweep type audit), the marker stays unexpanded and the template's
  * typed NULL dummy row keeps the SQL parseable — and, if it ever
  * reached the driver that way, the never-matching NULL join key would
  * return 0 rows and fail the gate LOUDLY rather than silently pass.
  */
object DeflateGolden {

  val Marker = "/*DEFLATE_GOLDEN*/"

  @volatile private var rows: Option[String] = None

  /** Reference deflate length: plain JVM types end-to-end, no Spark
    * expression machinery — same zlib parameters as DeflateLen (level 6,
    * raw/nowrap).
    */
  def deflatedLenRef(text: String): Int = {
    val d = new java.util.zip.Deflater(6, true)
    try {
      d.setInput(text.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      d.finish()
      val buf = new Array[Byte](8192)
      var total = 0
      while (!d.finished()) total += d.deflate(buf)
      total
    } finally d.end()
  }

  /** Build the golden rows from the gate's own input data. Gate scales
    * only (sf0.01 → 500 docs, sf0.1 → 5000): the collect is bounded by
    * the documents table the driver verifies against, not corpus scale.
    */
  def prepare(spark: SparkSession, sfDir: String): Unit = {
    val sb = new StringBuilder
    spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text").collect()
      .foreach { r =>
        if (!r.isNullAt(0) && !r.isNullAt(1))
          sb.append(s", (${r.getLong(0)}, ${deflatedLenRef(r.getString(1))})")
      }
    rows = Some(sb.toString)
  }

  def substitute(sql: String): String = rows match {
    case Some(r) => sql.replace(Marker, r)
    case None    => sql
  }
}
