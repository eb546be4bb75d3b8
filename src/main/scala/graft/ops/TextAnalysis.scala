package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for LLM training-data pipelines over the
  * `documents` table: tokenization, quality scoring, language ID,
  * fingerprinting. All built from codegen'd expressions — one narrow
  * projection pass per document, no shuffle, no UDFs — so a 100 TB corpus
  * scan stays scan-bound.
  */
object TextAnalysis {

  /** Whitespace tokens of trimmed text. */
  def tokens(text: Column): Column = split(trim(text), "\\s+")

  def tokenCount(text: Column): Column = size(tokens(text)).cast("long")

  /** A BPE-ish subword count: alphanumeric runs (the cheap pre-tokenizer
    * pass of a byte-pair encoder — count only, no merges). RE2-compatible
    * pattern so the same regex runs in any engine.
    */
  def subwordCount(text: Column): Column =
    size(filter(split(text, "[^a-zA-Z0-9]+"), t => length(t) > 0)).cast("long")

  /** Characters matching a class, counted via strip-and-diff (codegen'd,
    * no regex scan per char).
    */
  def charClassCount(text: Column, charClassRegex: String): Column =
    (length(text) - length(regexp_replace(text, charClassRegex, ""))).cast("long")

  def punctCount(text: Column): Column = charClassCount(text, "[.,;:!?'\"()\\-]")

  /** Occurrences of any word from `words` among the tokens — the HOF
    * executable spec (interpreted `isin` scan per token; test-only —
    * production paths use the single-pass `TextKernels` expressions).
    */
  def wordHits(text: Column, words: Seq[String]): Column =
    size(filter(tokens(text), t => t.isin(words.map(lit): _*))).cast("long")

  /** Per-language stopword sets — single source of truth lives with the
    * kernel (graft.functions.TextKernels); re-exported here for the query
    * layer's oracle-SQL generation and the specs.
    */
  val langStopwords: Seq[(String, Seq[String])] =
    graft.functions.TextKernels.langStopwords

  /** Predicted language: the first language (in fixed alphabetical order)
    * whose stopword-hit count is ≥ every other — deterministic argmax with
    * alphabetical tie-break, 'und' (undetermined) when nothing hits.
    * Single tokenize+lookup pass (TextKernels.lang_id); `langIdHof` below
    * is the executable spec.
    */
  def langId(text: Column): Column = graft.functions.TextKernels.lang_id(text)

  /** The HOF spec of `langId` (one interpreted stopword scan per language
    * — test-only).
    */
  def langIdHof(text: Column): Column = {
    val scores = langStopwords.map { case (lang, words) => lang -> wordHits(text, words) }
    val maxScore = greatest(scores.map(_._2): _*)
    val anyHit = maxScore > 0
    scores.foldRight(lit("und")) { case ((lang, s), elseExpr) =>
      when(anyHit && s === maxScore, lit(lang)).otherwise(elseExpr)
    }
  }

  /** Count of tokens in the union of all language stopword sets — the
    * single-pass kernel behind quality scoring.
    */
  def stopwordHits(text: Column): Column =
    graft.functions.TextKernels.stopword_hits(text)

  /** Linear document-classifier inference (the fastText-style quality
    * filter of the GPT-3/CCNet pipelines: a bag-of-words linear model
    * scored per document, corpus-scale): score = Σ_tokens weight(token),
    * where the per-token weight is derived deterministically from the
    * portable token hash — centered to [-(m-1)/2, (m-1)/2] — standing in
    * for learned weights (no trained artifact ships with the repo; a
    * real deployment swaps the hash for a broadcast weight map without
    * touching the plan shape). All-integer arithmetic → exact on any
    * engine, and the whole thing is one narrow codegen'd pass: inference
    * over 100 TB is scan-bound, shuffle-free.
    */
  def linearClassifierScore(text: Column, weightMod: Long = 2001L): Column =
    aggregate(tokens(text), lit(0L), (acc, t) =>
      acc + (graft.functions.MathExprs.polyHash(t, weightMod)
        - (weightMod - 1) / 2))

  /** Composite quality score in [0,1] from cheap surface statistics —
    * the length / punctuation / stopword-ratio heuristics of C4-style
    * corpus filtering, composed so each term is a ratio of exact integer
    * counts (deterministic across engines).
    */
  def qualityScore(text: Column): Column = {
    val nChars = length(text).cast("double")
    val nTokens = tokenCount(text).cast("double")
    val meanTokLen = when(nTokens > 0, nChars / nTokens).otherwise(lit(0.0))
    val stopRatio = when(nTokens > 0,
      stopwordHits(text).cast("double") / nTokens).otherwise(lit(0.0))
    val punctRatio = when(nChars > 0,
      punctCount(text).cast("double") / nChars).otherwise(lit(0.0))
    val lengthTerm = least(nChars / lit(500.0), lit(1.0))
    val tokLenTerm = when(meanTokLen >= 3 && meanTokLen <= 10, lit(1.0)).otherwise(lit(0.5))
    val stopTerm = least(stopRatio * 3.0, lit(1.0))
    val punctTerm = when(punctRatio <= 0.1, lit(1.0)).otherwise(lit(0.5))
    lengthTerm * 0.3 + tokLenTerm * 0.2 + stopTerm * 0.3 + punctTerm * 0.2
  }

  /** Polynomial rolling-hash document fingerprint:
    * h = fold(chars)(h·31 + code mod 1e9+7). The modulus keeps every
    * intermediate < 2^35 so the fold is portable to any engine with exact
    * 64-bit ints (DuckDB list_reduce mirrors it for the oracle).
    */
  val FingerprintMod: Long = 1000000007L

  def fingerprint(text: Column): Column =
    graft.functions.MathExprs.polyHash(text, FingerprintMod)

  /** The HOF spec of `fingerprint` (identical fold; interpreted and ~50×
    * slower — test-only).
    */
  def fingerprintHof(text: Column): Column =
    aggregate(
      filter(split(text, ""), ch => length(ch) > 0),
      lit(0L),
      (acc, ch) => (acc * 31 + ascii(ch)) % FingerprintMod)

  // ------------------------------------------------------------------
  // PII scrubbing & normalization (training-data hygiene passes)
  // ------------------------------------------------------------------

  /** PII patterns, RE2-compatible (no lookarounds, no backrefs) so the
    * identical regex runs under Spark's Java engine and the oracle's RE2.
    */
  val EmailRe: String = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Re: String = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  val PhoneRe: String = "\\+\\d[\\d-]{7,}"

  /** Redact emails, then IPv4s, then phone-shaped digit runs (fixed
    * order: the replacements are disjoint by construction, but a stable
    * order keeps the output deterministic if patterns ever overlap).
    * Spark's `regexp_replace` is global; the oracle needs the 'g' flag.
    */
  def scrubPii(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailRe, "<EMAIL>"),
        Ipv4Re, "<IP>"),
      PhoneRe, "<PHONE>")

  /** C4-style surface normalization: lowercase, non-alphanumeric → space,
    * collapse runs, trim. ASCII-only classes so Java and RE2 agree;
    * non-Latin scripts normalize to empty (they'd route to a
    * script-specific pass in a full pipeline).
    */
  def normalize(text: Column): Column =
    trim(regexp_replace(
      regexp_replace(lower(text), "[^a-z0-9 ]", " "),
      " +", " "))

  /** Overlapping token-window chunks — pretraining context windows / RAG
    * passages. Chunk i covers tokens [i·stride+1, i·stride+window]
    * (1-based); the chunk count ceil((n-window)/stride)+1 (min 1) makes
    * the final chunk the only partial one, and no chunk is ever fully
    * contained in its predecessor (stride < window ⇒ overlap =
    * window−stride tokens). Entirely narrow: tokenize, explode a
    * per-row `sequence`, `slice` — the whole operator lives in one
    * projection pass inside whole-stage codegen, so a 100 TB corpus
    * chunks at scan speed with zero shuffle (any downstream orderBy is
    * the caller's, as in the oracled query).
    *
    * `docCols` are carried through (doc_id at minimum). Output:
    * docCols*, chunk_idx, n_tokens, chunk_text.
    */
  def chunkTokens(df: org.apache.spark.sql.DataFrame, textCol: String,
      window: Int, stride: Int,
      docCols: Seq[String]): org.apache.spark.sql.DataFrame = {
    require(window > 0 && stride > 0 && stride <= window,
      s"need 0 < stride <= window, got window=$window stride=$stride")
    val keep = docCols.map(col)
    df.select(keep :+ tokens(col(textCol)).as("ts"): _*)
      .withColumn("n", size(col("ts")))
      .withColumn("n_chunks",
        when(col("n") <= window, lit(1L)).otherwise(
          floor((col("n") - window + stride - 1) / lit(stride.toDouble)) + 1L))
      .withColumn("chunk_idx", explode(sequence(lit(0L), col("n_chunks") - 1)))
      .withColumn("chunk",
        slice(col("ts"), col("chunk_idx") * stride + 1, lit(window)))
      .select(keep ++ Seq(col("chunk_idx"),
        size(col("chunk")).cast("long").as("n_tokens"),
        array_join(col("chunk"), " ").as("chunk_text")): _*)
  }
}
