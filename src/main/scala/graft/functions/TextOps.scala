package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale corpus pipelines: token
  * counting, quality scoring, language ID, document fingerprinting.
  *
  * Everything here is built from `org.apache.spark.sql.functions` (incl.
  * higher-order array functions) — no UDFs — so the whole pipeline stays
  * inside whole-stage codegen and scales linearly with no shuffle except
  * the final aggregations a caller adds.
  */
object TextOps {

  /** Whitespace tokenizer: split on runs of whitespace, drop empty edge
    * tokens (leading/trailing whitespace would otherwise yield "").
    */
  def tokens(text: Column): Column =
    filter(split(text, "\\s+"), t => length(t) > 0)

  def tokenCount(text: Column): Column = size(tokens(text))

  /** Intra-document repeated-line removal: keep the FIRST occurrence of
    * each distinct line, preserving order — the cleaning primitive for
    * within-page repetition (navigation blocks, headers repeated by a
    * scraper), complementary to [[Boilerplate]]'s corpus-frequent-line
    * removal (which needs a shuffle; this is map-side only).
    * `array_distinct` preserves first-occurrence order by contract, so
    * the whole op is three array expressions per row.
    */
  def dropRepeatedLines(text: Column): Column =
    array_join(array_distinct(split(text, "\n")), "\n")

  /** Canonicalize text for exact dedup / fingerprinting: Unicode NFC
    * (composed/decomposed encodings of the same glyphs collapse), then
    * lowercase, then whitespace runs → one space, then trim. This is the
    * standard pre-hash step — without it byte-level exact dedup misses
    * visually-identical documents. NFC (not NFKC) by default so
    * compatibility characters (①, ﬁ) are PRESERVED: aggressive folding is
    * a separate policy decision the caller opts into via `form = "NFKC"`.
    * Everything stays in whole-stage codegen ([[expressions.UnicodeNorm]]
    * is a native expression; the rest are built-ins).
    */
  def canonicalize(text: Column, form: String = "NFC"): Column =
    trim(regexp_replace(
      lower(graft.functions.expressions.UnicodeNorm.normCol(text, form)),
      "\\s+", " "))

  /** A BPE-ish subword proxy: count of alphanumeric runs plus count of
    * punctuation marks — a cheap deterministic stand-in for a real
    * tokenizer's token count (useful for budget estimates over 100 TB of
    * text). Formulated with global `regexp_replace` (no lookahead) so it
    * is portable to RE2-based engines.
    */
  def subwordCountApprox(text: Column): Column = {
    val collapsed = regexp_replace(text, "[A-Za-z0-9]+", "\u0001")
    val nRuns = length(collapsed) - length(regexp_replace(collapsed, "\u0001", ""))
    val nPunct = length(text) - length(regexp_replace(text, "[\\p{Punct}]", ""))
    nRuns + nPunct
  }

  /** Count of tokens that appear in `vocab`. */
  def tokenHits(text: Column, vocab: Seq[String]): Column = {
    val arr = array(vocab.map(lit): _*)
    size(filter(tokens(lower(text)), t => array_contains(arr, t)))
  }

  /** Quality signals: length, mean token length, punctuation ratio,
    * stopword ratio, uppercase ratio. Returns a struct column; callers
    * project / threshold.
    *
    * Counters come from the native
    * [[graft.functions.expressions.QualityCounts]] expression — one char
    * scan per row instead of two full-text regex rewrites plus a split
    * and two higher-order filters (which also fall out of codegen).
    */
  def qualitySignals(text: Column, stopwords: Seq[String]): Column = {
    val c = graft.functions.expressions.QualityCounts.qualityCountsCol(text, stopwords)
    val nChars = c.getField("n_chars")
    val nTok = c.getField("n_tokens")
    struct(
      nChars.as("n_chars"),
      nTok.as("n_tokens"),
      round(nChars.cast("double") / greatest(nTok, lit(1)), 4).as("mean_token_len"),
      round(c.getField("n_punct").cast("double") / greatest(nChars, lit(1)), 4).as("punct_ratio"),
      round(c.getField("n_upper").cast("double") / greatest(nChars, lit(1)), 4).as("upper_ratio"),
      round(c.getField("n_stop").cast("double") / greatest(nTok, lit(1)), 4).as("stopword_ratio")
    )
  }

  val defaultStopwords: Seq[String] =
    Seq("the", "a", "an", "of", "and", "or", "to", "in", "is", "it")

  /** Marker-word language ID: score each language by marker-token hits,
    * pick the argmax with a deterministic tie-break (declaration order).
    * Pure column expressions → replicable in ANSI SQL for the oracle.
    * (A real n-gram profile model slots into the same shape.)
    */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "is"),
    "es" -> Seq("el", "la", "de", "que", "y"),
    "de" -> Seq("der", "die", "das", "und", "ist"),
    "fr" -> Seq("le", "les", "et", "est", "une"),
    "zh" -> Seq("的", "是", "了", "在", "我")
  )

  /** Single-character non-ASCII markers (CJK function words) score by
    * SUBSTRING occurrence — unsegmented scripts have no whitespace
    * tokens, so token-equality scoring could never fire for them.
    */
  private[functions] def isCjkMarker(m: String): Boolean = m.length == 1 && m.head > 127

  /** Marker score: whitespace-token hits for word markers + occurrence
    * counts for single-char CJK markers (`translate` strips every
    * occurrence; the length delta counts them — codegen'd, no regex).
    */
  def markerHits(text: Column, markers: Seq[String]): Column = {
    val (cjk, words) = markers.partition(isCjkMarker)
    val wordScore = if (words.nonEmpty) tokenHits(text, words) else lit(0)
    cjk.foldLeft(wordScore) { (acc, m) =>
      acc + (length(text) - length(translate(text, m, "")))
    }
  }

  def langId(text: Column): Column = {
    val scores = langMarkers.map { case (lang, markers) => lang -> markerHits(lower(text), markers) }
    val best = greatest(scores.map(_._2): _*)
    // first language (in declaration order) reaching the max score
    scores.reverse.foldLeft(lit(langMarkers.head._1)) { case (acc, (lang, score)) =>
      when(score === best, lit(lang)).otherwise(acc)
    }
  }

  /** Tokens that are a marker for ANY language — ONE tokenization shared
    * by every per-language score. [[langId]] embeds the tokenizer in each
    * language's score subtree, and because higher-order filters are
    * CodegenFallback (no CSE), that splits the text N_langs times per
    * row. Projecting this array once and scoring from it does the split
    * exactly once; the per-language filters then scan a few dozen marker
    * tokens instead of the whole document. (Keep it in its OWN projection
    * — multiple non-cheap references stop `CollapseProject` from
    * re-inlining the split.)
    */
  def markerTokens(loweredText: Column): Column = {
    val words = langMarkers.flatMap(_._2).filterNot(isCjkMarker).distinct
    val arr = array(words.map(lit): _*)
    filter(tokens(loweredText), t => array_contains(arr, t))
  }

  /** [[langId]] over a pre-projected [[markerTokens]] array (word scores)
    * and the pre-lowered text (CJK substring scores). Scores — and
    * therefore ties and the declaration-order tie-break — are identical
    * to [[langId]]: filtering tokens to the all-language marker subset
    * first cannot change any per-language hit count.
    */
  def langIdFromMarkerTokens(markerTok: Column, loweredText: Column): Column = {
    val scores = langMarkers.map { case (lang, markers) =>
      val (cjk, words) = markers.partition(isCjkMarker)
      val arr = array(words.map(lit): _*)
      val wordScore =
        if (words.nonEmpty) size(filter(markerTok, t => array_contains(arr, t))) else lit(0)
      lang -> cjk.foldLeft(wordScore) { (acc, m) =>
        acc + (length(loweredText) - length(translate(loweredText, m, "")))
      }
    }
    val best = greatest(scores.map(_._2): _*)
    scores.reverse.foldLeft(lit(langMarkers.head._1)) { case (acc, (lang, score)) =>
      when(score === best, lit(lang)).otherwise(acc)
    }
  }

  /** Document fingerprint: md5 of case-folded, whitespace-collapsed text —
    * the exact-dedup key that survives trivial reformatting.
    */
  def fingerprint(text: Column): Column =
    md5(regexp_replace(trim(lower(text)), "\\s+", " "))

  /** Winnowing fingerprints (the rolling-hash local-fingerprint scheme of
    * MOSS): hash every `k`-char gram, then keep the minimum hash of each
    * sliding window of `w` consecutive gram hashes. Any sufficiently long
    * shared substring between two documents yields shared fingerprints,
    * robust to insertions elsewhere. Backed by the native
    * [[graft.functions.expressions.WinnowingFp]] expression — one O(n)
    * codegen'd pass per row (rolling polynomial hash + monotonic-deque
    * windowed min).
    */
  def winnowingFingerprints(text: Column, k: Int, w: Int): Column =
    graft.functions.expressions.Winnowing.winnowingFpCol(text, k, w)
}
