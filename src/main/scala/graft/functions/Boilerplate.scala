package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** CCNet-style boilerplate removal: lines that recur across many
  * documents (navigation menus, cookie banners, copyright footers) are
  * dropped from every document before training-data use.
  *
  * Shuffle inventory at 100 TB: per-document line dedup is map-side
  * (`array_distinct` before the explode), so the document-frequency
  * count is ONE partially-aggregated shuffle keyed on the line — the
  * same shape as a word count. The frequent-line lexicon is, by
  * definition of "boilerplate", a heavy-hitter set orders of magnitude
  * smaller than the corpus, so the removal pass joins against it
  * broadcast — the rewrite itself never shuffles document text.
  */
object Boilerplate {

  /** The boilerplate lexicon: lines whose document frequency is at
    * least `minDf`, with their df. Each document votes once per
    * distinct line (`array_distinct` is map-side; repeats within one
    * document are not corpus-level evidence).
    */
  def frequentLines(df: DataFrame, text: Column, minDf: Int): DataFrame = {
    require(minDf >= 2, s"minDf < 2 would classify every line as boilerplate: $minDf")
    df.select(explode(array_distinct(split(text, "\n"))).as("line"))
      .groupBy("line").agg(count(lit(1)).as("line_df"))
      .filter(col("line_df") >= minDf)
  }

  /** Rewrite each document with its boilerplate lines removed,
    * preserving the order of surviving lines, plus kept/dropped line
    * counts. Documents whose every line is boilerplate survive with an
    * empty `clean_text` (dropping them silently would corrupt
    * downstream joins on the id).
    */
  /** Source-level template-PREFIX detection — the scaffolding signal
    * line-frequency misses: scraped corpora carry per-site boilerplate
    * at the document HEAD ("Welcome to X — menu — ...") that is not a
    * repeated line but a repeated opening token run. Per source, find
    * the most frequent `k`-token document prefix and its share of the
    * source's documents (exact integer permille) — a share near 1000
    * means the source is template-dominated and its prefix belongs in
    * the strip list. One map-side prefix projection (`slice` of the
    * token array — no self-join, no explode), one (source, prefix)
    * count, one top-1-per-source via the bounded-heap operator. Docs
    * shorter than `k` tokens don't form a prefix and are excluded from
    * both numerator and denominator (counted separately).
    */
  def prefixShare(df: DataFrame, id: Column, text: Column, source: Column,
                  k: Int): DataFrame = {
    require(k >= 1, s"prefixShare needs k >= 1: $k")
    val toks = TextOps.tokens(lower(text))
    val base = df.select(source.as("source"), id.as("doc_id"),
        when(size(toks) >= k, concat_ws(" ", slice(toks, 1, k))).as("prefix"))
    val perSource = base.groupBy("source")
      .agg(count(col("prefix")).as("n_docs"),
        (count(lit(1)) - count(col("prefix"))).as("n_short"))
    val counts = base.filter(col("prefix").isNotNull)
      .groupBy("source", "prefix").agg(count(lit(1)).as("n_prefix"))
    val top = graft.plans.TopKPerGroup.topK(counts, Seq(col("source")),
      struct(col("n_prefix"), col("prefix")), 1)
    top.join(perSource, "source")
      .select(col("source"), col("prefix").as("top_prefix"),
        col("n_prefix"), col("n_docs"), col("n_short"),
        expr("n_prefix * 1000L div n_docs").as("share_permille"))
  }

  def removeFrequentLines(df: DataFrame, id: Column, text: Column, minDf: Int): DataFrame = {
    val lexicon = broadcast(
      frequentLines(df, text, minDf).select(col("line"), lit(true).as("is_bp")))
    df.select(id.as("doc_id"), posexplode(split(text, "\n")).as(Seq("pos", "line")))
      .join(lexicon, Seq("line"), "left")
      .groupBy("doc_id")
      .agg(
        concat_ws("\n",
          transform(
            array_sort(collect_list(when(col("is_bp").isNull, struct(col("pos"), col("line"))))),
            x => x.getField("line"))).as("clean_text"),
        sum(when(col("is_bp").isNull, 1).otherwise(0)).cast("int").as("n_kept"),
        sum(when(col("is_bp").isNotNull, 1).otherwise(0)).cast("int").as("n_dropped"))
  }
}
