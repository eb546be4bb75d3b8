package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Custom Catalyst expressions for the document-sketching operators
  * (MinHash, SimHash, shingling).
  *
  * Why custom expressions instead of higher-order-function compositions:
  * HOFs evaluate interpreted (no codegen, no common-subexpression
  * elimination), and Catalyst inlines a referenced column expression into
  * every lambda that mentions it — a shingle array feeding 64 minhash
  * lambdas re-tokenizes the document 64×. Each expression here makes ONE
  * imperative pass over the string per row: tokenize once, hash once per
  * (shingle × hash-function). That collapses an observed 10+ CPU-minute
  * stage to sub-second work and removes the need for any materialization
  * barrier between pipeline steps.
  *
  * Hashing matches Spark's built-in `xxhash64`: seed 42, values folded in
  * argument order (so `MinHashSig` element j == `xxhash64(j, shingle)`
  * folded min — verified against the HOF formulation in ScalaTest).
  */
object Sketches {

  /** Exactly Java's regex `\s` class (the spec is `split(trim(s), "\s+")`
    * — ASCII-only: tab..carriage-return plus space). A manual scan, not
    * the regex engine: these kernels run once per row over the whole
    * corpus, and the regex `split` was the largest constant factor left
    * in the sketch pass.
    */
  @inline private def isWs(c: Char): Boolean =
    c == ' ' || (c >= '\t' && c <= '\r')

  private[functions] def tokenize(text: UTF8String): Array[String] = {
    val s = text.toString
    // String.trim semantics first (strips chars <= ' ' at the ends — a
    // SUPERSET of \s; mid-string control chars stay token chars, exactly
    // like the regex spec)
    var lo = 0
    var hi = s.length
    while (lo < hi && s.charAt(lo) <= ' ') lo += 1
    while (hi > lo && s.charAt(hi - 1) <= ' ') hi -= 1
    val out = new scala.collection.mutable.ArrayBuffer[String](16)
    var i = lo
    while (i < hi) {
      while (i < hi && isWs(s.charAt(i))) i += 1
      val start = i
      while (i < hi && !isWs(s.charAt(i))) i += 1
      if (i > start) out += s.substring(start, i)
    }
    out.toArray
  }

  /** Distinct word n-gram shingles; whole text as one shingle when there
    * are fewer than n tokens (mirrors Dedup.wordShingles).
    */
  private[functions] def shingles(text: UTF8String, n: Int): Array[String] = {
    val toks = tokenize(text)
    if (toks.length < n) Array(toks.mkString(" "))
    else {
      val out = new scala.collection.mutable.LinkedHashSet[String]
      var i = 0
      while (i <= toks.length - n) {
        val sb = new java.lang.StringBuilder(toks(i))
        var j = 1
        while (j < n) { sb.append(' ').append(toks(i + j)); j += 1 }
        out += sb.toString
        i += 1
      }
      out.toArray
    }
  }

  /** Min-wise permutation family: ONE xxhash64 per shingle, then k cheap
    * affine maps `a_j·h + b_j` (odd multipliers) — the classic universal-
    * hashing scheme (also what Spark ML's MinHashLSH uses). ~k× fewer
    * string hashes than hashing each shingle k times, same estimator
    * properties. Coefficients derive deterministically from the
    * permutation index, seeds fixed.
    */
  private[functions] def permCoeffs(numHashes: Int): (Array[Long], Array[Long]) = {
    val a = Array.tabulate(numHashes)(j => XxHash64Function.hash(j, IntegerType, 1L) | 1L)
    val b = Array.tabulate(numHashes)(j => XxHash64Function.hash(j, IntegerType, 2L))
    (a, b)
  }

  private[functions] def minhash(text: UTF8String, shingleN: Int,
                                 numHashes: Int): Array[Long] = {
    val sh = shingles(text, shingleN).map(UTF8String.fromString)
    val (a, b) = permCoeffs(numHashes)
    val sig = Array.fill(numHashes)(Long.MaxValue)
    var i = 0
    while (i < sh.length) {
      val h = XxHash64Function.hash(sh(i), StringType, 42L)
      var j = 0
      while (j < numHashes) {
        val p = a(j) * h + b(j)
        if (p < sig(j)) sig(j) = p
        j += 1
      }
      i += 1
    }
    sig
  }

  /** Band hash b = xxhash64 fold of signature rows [b·r, (b+1)·r). */
  private[functions] def bandHashes(sig: Array[Long], bands: Int): Array[Long] = {
    val r = sig.length / bands
    Array.tabulate(bands) { b =>
      var h = XxHash64Function.hash(b.toLong, LongType, 42L)
      var i = b * r
      while (i < (b + 1) * r) {
        h = XxHash64Function.hash(sig(i), LongType, h)
        i += 1
      }
      h
    }
  }

  private[functions] def simhash64(text: UTF8String): Long = {
    val toks = tokenize(text)
    val counters = new Array[Int](64)
    var i = 0
    while (i < toks.length) {
      val h = XxHash64Function.hash(UTF8String.fromString(toks(i)), StringType, 42L)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) counters(b) += 1 else counters(b) -= 1
        b += 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (counters(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }

  /** ALL adjacent word n-grams, with repeats (unlike `shingles`, which
    * dedups and falls back to the whole text): the multiplicity-carrying
    * scan a BPE-style pair-frequency count needs.
    */
  private[functions] def ngrams(text: UTF8String, n: Int): Array[String] = {
    val toks = tokenize(text)
    if (toks.length < n) Array.empty[String]
    else Array.tabulate(toks.length - n + 1) { i =>
      val sb = new java.lang.StringBuilder(toks(i))
      var j = 1
      while (j < n) { sb.append(' ').append(toks(i + j)); j += 1 }
      sb.toString
    }
  }

  // ---------------------------------------------------------------- API
  import org.apache.spark.sql.GraftColumnBridge.{toColumn => column, toExpression => expression}

  def word_shingles(text: Column, n: Int): Column =
    column(WordShinglesExpr(expression(text), n))

  def word_ngrams(text: Column, n: Int): Column =
    column(WordNgramsExpr(expression(text), n))

  def minhash_sig(text: Column, shingleN: Int, numHashes: Int): Column =
    column(MinHashSigExpr(expression(text), shingleN, numHashes))

  def minhash_bands(text: Column, shingleN: Int, numHashes: Int, bands: Int): Column =
    column(MinHashBandsExpr(expression(text), shingleN, numHashes, bands))

  def simhash64(text: Column): Column = column(SimHash64Expr(expression(text)))
}

/** Distinct word n-gram shingles of a string column. */
case class WordShinglesExpr(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullSafeEval(v: Any): Any =
    new GenericArrayData(Sketches.shingles(v.asInstanceOf[UTF8String], n)
      .map(UTF8String.fromString(_: String)).asInstanceOf[Array[Any]])
  override protected def withNewChildInternal(c: Expression): WordShinglesExpr = copy(child = c)
  override def prettyName: String = "word_shingles"
}

/** All adjacent word n-grams with repeats (one tokenize pass — the HOF
  * `transform(sequence(...), element_at(toks, ...))` form re-splits the
  * text per element).
  */
case class WordNgramsExpr(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullSafeEval(v: Any): Any =
    new GenericArrayData(Sketches.ngrams(v.asInstanceOf[UTF8String], n)
      .map(UTF8String.fromString(_: String)).asInstanceOf[Array[Any]])
  override protected def withNewChildInternal(c: Expression): WordNgramsExpr = copy(child = c)
  override def prettyName: String = "word_ngrams"
}

/** MinHash signature (numHashes × min over shingles of xxhash64(j, s)). */
case class MinHashSigExpr(child: Expression, shingleN: Int, numHashes: Int)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(v: Any): Any =
    new GenericArrayData(Sketches.minhash(v.asInstanceOf[UTF8String], shingleN, numHashes))
  override protected def withNewChildInternal(c: Expression): MinHashSigExpr = copy(child = c)
  override def prettyName: String = "minhash_sig"
}

/** LSH band hashes of the MinHash signature: element b is the hash of
  * signature slice [b·r, (b+1)·r). Tokenize→shingle→sign→band in ONE pass.
  */
case class MinHashBandsExpr(child: Expression, shingleN: Int, numHashes: Int,
                            bands: Int) extends UnaryExpression with CodegenFallback {
  require(numHashes % bands == 0, "bands must divide numHashes")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(v: Any): Any =
    new GenericArrayData(Sketches.bandHashes(
      Sketches.minhash(v.asInstanceOf[UTF8String], shingleN, numHashes), bands))
  override protected def withNewChildInternal(c: Expression): MinHashBandsExpr = copy(child = c)
  override def prettyName: String = "minhash_bands"
}

/** 64-bit SimHash over whitespace tokens (bit i = sign of Σ ±1 by bit i of
  * xxhash64(token)).
  */
case class SimHash64Expr(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override def nullSafeEval(v: Any): Any = Sketches.simhash64(v.asInstanceOf[UTF8String])
  override protected def withNewChildInternal(c: Expression): SimHash64Expr = copy(child = c)
  override def prettyName: String = "simhash64"
}
