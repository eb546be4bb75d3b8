package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass text kernels for the language-ID / quality-scoring hot
  * path.
  *
  * The HOF formulation (`filter(tokens, t.isin(50 literals))`) evaluates
  * interpreted — 50 string comparisons per token per list, re-run once per
  * language plus once for the combined set, with the tokenize subtree
  * inlined into every lambda (the same Catalyst inlining pathology the
  * sketch kernels in `SketchExpressions` already bypass). These
  * expressions tokenize ONCE per row and resolve each token against a
  * prebuilt hash map carrying a per-language bitmask, so language scores
  * AND the combined stopword count come out of one scan. Observed: the two
  * gate queries on this path dropped from ~11.8 s to sub-second at sf0.1.
  *
  * The stopword table itself lives here (single source of truth); the
  * query layer derives DuckDB oracle SQL from the same constant, and
  * `TextAnalysis.wordHits` keeps the HOF formulation as the executable
  * spec the ScalaTests compare against.
  */
object TextKernels {

  /** Small per-language stopword sets for the n-gram/stopword language-ID
    * heuristic. Deliberately tiny — language ID at corpus scale wants a
    * cheap first pass; anything smarter runs on the disagreement residue.
    * MUST stay in alphabetical language order: argmax ties break toward
    * the first entry.
    */
  val langStopwords: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "und", "das", "ist", "nicht", "ein", "mit", "auf", "von"),
    "en" -> Seq("the", "and", "of", "to", "a", "in", "is", "that", "it", "for"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "un", "por", "con", "para"),
    "fr" -> Seq("le", "la", "et", "les", "des", "en", "un", "du", "une", "est"),
    "zh" -> Seq("的", "了", "是", "我", "不", "在", "人", "有", "他", "这")
  )

  private val langNames: Array[UTF8String] =
    langStopwords.map(l => UTF8String.fromString(l._1)).toArray
  private val nLangs: Int = langStopwords.size

  /** token → bitmask of languages whose stopword set contains it. */
  private val wordMask: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer]()
    langStopwords.zipWithIndex.foreach { case ((_, words), i) =>
      words.foreach { w =>
        val prev = m.get(w)
        m.put(w, Integer.valueOf((if (prev == null) 0 else prev.intValue()) | (1 << i)))
      }
    }
    m
  }

  private val Und = UTF8String.fromString("und")

  /** One tokenize pass → (per-language hit counts, combined-set hits).
    * Token semantics match `TextAnalysis.tokens`: whitespace split of the
    * trimmed text, exact string equality against the word lists.
    */
  private[functions] def scores(text: UTF8String): (Array[Long], Long) = {
    val toks = Sketches.tokenize(text)
    val counts = new Array[Long](nLangs)
    var any = 0L
    var i = 0
    while (i < toks.length) {
      val m = wordMask.get(toks(i))
      if (m != null) {
        any += 1
        var mm = m.intValue()
        var b = 0
        while (mm != 0) {
          if ((mm & 1) != 0) counts(b) += 1
          mm >>>= 1
          b += 1
        }
      }
      i += 1
    }
    (counts, any)
  }

  private[functions] def langIdOf(text: UTF8String): UTF8String = {
    val (counts, _) = scores(text)
    var best = -1
    var bestScore = 0L
    var i = 0
    while (i < nLangs) {
      if (counts(i) > bestScore) { bestScore = counts(i); best = i }
      i += 1
    }
    if (best < 0) Und else langNames(best)
  }

  // ---------------------------------------------------------------- API
  import org.apache.spark.sql.GraftColumnBridge.{toColumn => column, toExpression => expression}

  /** Predicted language: alphabetical-first argmax of per-language
    * stopword hits; 'und' when nothing hits.
    */
  def lang_id(text: Column): Column = column(LangIdExpr(expression(text)))

  /** Count of tokens appearing in the union of all language stopword
    * sets (each matching token counts once).
    */
  def stopword_hits(text: Column): Column = column(StopwordHitsExpr(expression(text)))

  /** Repetition statistics in one tokenize pass:
    * [n_tokens, n_distinct_tokens, top_token_count, n_bigrams,
    * n_distinct_bigrams]. See RepetitionStatsExpr.
    */
  def repetition_stats(text: Column): Column =
    column(RepetitionStatsExpr(expression(text)))
}

/** Language ID in one tokenize+lookup pass (spec: TextAnalysis.langId's
  * HOF formulation — first language in alphabetical order whose score
  * equals the max, 'und' on zero hits).
  */
case class LangIdExpr(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = StringType
  override def nullSafeEval(v: Any): Any =
    TextKernels.langIdOf(v.asInstanceOf[UTF8String])
  override protected def withNewChildInternal(c: Expression): LangIdExpr = copy(child = c)
  override def prettyName: String = "lang_id"
}

/** Repetition signals of a document in ONE tokenize pass — the
  * Gopher/MassiveText-style quality filters (high duplicate-token or
  * duplicate-n-gram fractions mark boilerplate/spam for removal before
  * LLM training): returns ARRAY<LONG>
  * [n_tokens, n_distinct_tokens, top_token_count, n_bigrams,
  * n_distinct_bigrams]. All exact integer counts, so every derived
  * fraction is an int/int division any engine reproduces bit-for-bit.
  * The relational formulation (explode → two grouped counts per doc)
  * shuffles the whole exploded corpus; this kernel is a narrow scan.
  */
case class RepetitionStatsExpr(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(v: Any): Any = {
    val toks = Sketches.tokenize(v.asInstanceOf[UTF8String])
    val counts = new java.util.HashMap[String, Integer]()
    var top = 0L
    var i = 0
    while (i < toks.length) {
      val prev = counts.get(toks(i))
      val c = if (prev == null) 1 else prev.intValue() + 1
      counts.put(toks(i), Integer.valueOf(c))
      if (c > top) top = c
      i += 1
    }
    val grams = new java.util.HashSet[String]()
    i = 0
    while (i < toks.length - 1) {
      grams.add(toks(i) + " " + toks(i + 1))
      i += 1
    }
    val nBigrams = math.max(toks.length - 1, 0).toLong
    new org.apache.spark.sql.catalyst.util.GenericArrayData(Array[Long](
      toks.length.toLong, counts.size.toLong, top, nBigrams, grams.size.toLong))
  }
  override protected def withNewChildInternal(c: Expression): RepetitionStatsExpr =
    copy(child = c)
  override def prettyName: String = "repetition_stats"
}

/** Combined-stopword-set hit count in one tokenize+lookup pass (spec:
  * TextAnalysis.wordHits over the flattened word list).
  */
case class StopwordHitsExpr(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override def nullSafeEval(v: Any): Any = {
    val (_, any) = TextKernels.scores(v.asInstanceOf[UTF8String])
    any
  }
  override protected def withNewChildInternal(c: Expression): StopwordHitsExpr = copy(child = c)
  override def prettyName: String = "stopword_hits"
}
