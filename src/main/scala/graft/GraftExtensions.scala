package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import graft.functions._

/** Registers graft's custom expressions as SQL functions, so
  * `spark.sql("SELECT minhash_sig(text, 3, 64) ...")` works alongside the
  * Scala Column API.
  *
  * Two entry points:
  *  - session build: `.withExtensions(new GraftExtensions)` or
  *    `--conf spark.sql.extensions=graft.GraftExtensions`;
  *  - existing session: `GraftExtensions.register(spark)` (temp
  *    functions).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.builders.foreach { case (name, builder) =>
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo("graft", name),
        builder))
    }
    // maintenance SQL (GRAFT OPTIMIZE/VACUUM/REBUCKET/ADD COLUMNS) —
    // prefix-gated, everything else delegates to Spark's parser
    ext.injectParser((_, delegate) =>
      new graft.sources.GraftSqlParser(delegate))
  }
}

object GraftExtensions {

  private def intArg(e: Expression, name: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$name must be an integer literal, got $other")
  }

  private def longArg(e: Expression, name: String): Long = e match {
    case Literal(v: Long, _) => v
    case Literal(v: Int, _) => v.toLong
    case other => throw new IllegalArgumentException(
      s"$name must be a long literal, got $other")
  }

  private def strArg(e: Expression, name: String): String = e match {
    case Literal(v: org.apache.spark.unsafe.types.UTF8String, _) => v.toString
    case other => throw new IllegalArgumentException(
      s"$name must be a string literal, got $other")
  }

  val builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "dot_product" -> (es => DotProductExpr(es(0), es(1))),
    "sig_agree" -> (es => SigAgreeExpr(es(0), es(1))),
    "poly_hash" -> (es => PolyHashExpr(es(0), longArg(es(1), "mod"))),
    "simhash" -> (es => SimHashExpr(es.head)),
    "repetition_stats" -> (es => RepetitionStatsExpr(es.head)),
    "lang_id" -> (es => LangIdExpr(es.head)),
    "stopword_hits" -> (es => StopwordHitsExpr(es.head)),
    "quantize_stats" -> (es => QuantizeStatsExpr(es.head)),
    "word_ngrams" -> (es => WordNgramsExpr(es(0), intArg(es(1), "n"))),
    "word_shingles" -> (es => WordShinglesExpr(es(0), intArg(es(1), "n"))),
    "minhash_sig" -> (es => MinHashSigExpr(es(0),
      intArg(es(1), "shingleN"), intArg(es(2), "numHashes"))),
    "minhash_bands" -> (es => MinHashBandsExpr(es(0),
      intArg(es(1), "shingleN"), intArg(es(2), "numHashes"), intArg(es(3), "bands"))),
    "minhash_from_shingles" -> (es =>
      MinHashFromShinglesExpr(es(0), intArg(es(1), "numHashes"))),
    "band_hashes" -> (es => SigBandHashesExpr(es(0), intArg(es(1), "bands"))),
    "jaccard" -> (es => JaccardExpr(es(0), es(1))),
    "adjacent_pairs" -> (es => AdjacentPairsExpr(es.head)),
    "char_symbols" -> (es => CharSymbolsExpr(es.head)),
    "bpe_merge" -> (es => BpeMergeExpr(es(0),
      strArg(es(1), "first"), strArg(es(2), "second")))
  )

  /** Register into an already-built session as temp functions. */
  def register(spark: SparkSession): Unit =
    builders.foreach { case (name, builder) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(name, builder, "built-in")
    }
}
