package graft.operators

import org.apache.spark.sql.SparkSession

/** Verify-time SQL splice for p130's corpus-derived sign-LSH oracle.
  *
  * p130 gates the near-dup ENDGAME (blocking → inline verify → CC
  * collapse) at the config [[graft.functions.Similarity.lshConfigFor]]
  * derives from the corpus — the operator DEFAULT since round 10. The
  * oracle must replay the same bucket tables, and the bucket expression
  * SHAPE (how many seeded hyperplane literals, how many UNION'd table
  * CTEs) depends on the derived `(planes, tables)`, which depends on the
  * corpus COUNT — a quantity the static SQL template cannot know.
  * DuckDB re-derives the CONFIG itself from `count(*)` (the p112
  * derivation, proving the Scala and SQL derivations agree via the
  * hash-checked `planes`/`tables` output columns); only the
  * seed-deterministic plane CONSTANTS — the same splitmix64 stream both
  * engines cannot derive in SQL — are spliced here, exactly as p22's
  * fixed-config oracle inlines its six tables' planes as literals.
  *
  * Unprepared (OracleDump's Spark-less dump for the typesweep audit),
  * the marker stays unexpanded: the template's typed zero-row `bk` seed
  * yields an empty pair set, and the never-satisfied config guard row
  * keeps a drift to that state LOUD (0 rows vs the gate's non-empty
  * expectation) rather than silently passing.
  */
object DerivedLshGolden {

  val Marker = "/*DERIVED_LSH_BUCKETS*/"

  /** The admission threshold p130 runs at — the same cos ≥ 0.4 the p22
    * family uses (this synthetic corpus has no pairs above ≈ 0.51).
    */
  val MinCos = 0.4

  @volatile private var splice: Option[String] = None

  /** One bucket-table SELECT per derived table, with the seeded plane
    * components inlined — the exact SQL twin of `Dedup.lshBucketed`
    * (seed = 7 + t, sign of the 1e-6-rounded projection sets bit i).
    */
  private[operators] def bucketTablesSql(n: Long, dim: Int): String = {
    val (planes, tables) = graft.functions.Similarity.lshConfigFor(n, MinCos)
    (0 until tables).map { t =>
      val ps = graft.functions.Similarity.hyperplanes(planes, dim, seed = 7L + t)
      val bucket = ps.zipWithIndex.map { case (p, i) =>
        val lst = p.mkString("[", ", ", "]") + "::DOUBLE[]"
        s"(CASE WHEN round(list_inner_product(e, $lst), 6) > 0 THEN ${1L << i} ELSE 0 END)"
      }.mkString(" + ")
      s"UNION ALL SELECT $t AS tbl, vec_id, CAST($bucket AS BIGINT) AS bucket FROM v"
    }.mkString("\n          ")
  }

  /** Derive the config for the gate corpus and render the splice. The
    * count is the same number the operator's default path derives from,
    * read independently here (a straight parquet count, no operator
    * code) so the golden side does not share the code path under test.
    */
  def prepare(spark: SparkSession, sfDir: String): Unit = {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val n = emb.count()
    val dim = emb.selectExpr("max(size(embedding))").head().getInt(0)
    splice = Some(bucketTablesSql(n, dim))
  }

  def substitute(sql: String): String = splice match {
    case Some(s) => sql.replace(Marker, s)
    case None    => sql
  }
}
