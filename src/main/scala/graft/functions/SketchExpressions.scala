package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.{aggregate, lit}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
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
  * Hashing is the PORTABLE polynomial family (`(acc·31 + codeunit) mod
  * prime`, primes < 2³⁰), not an engine hash like xxhash64: every
  * intermediate fits exact 64-bit integer arithmetic, so any engine with
  * BIGINTs (the DuckDB oracle, a second Spark cluster, a Python checker)
  * reproduces signatures, band keys, and fingerprints bit-for-bit. That
  * turns the whole sketch pipeline — signatures, LSH candidates, near-dup
  * pairs, duplicate clusters — into hash-verifiable queries instead of
  * trust-me engine internals, at the same O(chars + shingles·k) kernel
  * cost (an affine map per permutation, exactly like the xxhash scheme it
  * replaces).
  */
object Sketches {

  /** Modulus of the portable hash family: prime < 2³⁰, so `a·h + b` with
    * `a, h < P1` stays < 2⁶⁰ — exact in Java longs and DuckDB BIGINTs
    * alike, no wrapping semantics anywhere. (Same value as
    * `TextAnalysis.FingerprintMod` — one portable family across the
    * engine.)
    */
  val P1: Long = 1000000007L

  /** Second prime for the high half of the SimHash fingerprint (two
    * independent 30-bit hashes → 60 usable bits).
    */
  val P2: Long = 998244353L

  /** SimHash width: 30 bits from each of the two hash families, packed
    * into one long (bits 60-63 always zero).
    */
  val SimBits: Int = 60

  /** Left-fold polynomial hash over UTF-16 code units — the portable base
    * hash (mirrors `MathExprs.polyHash` / DuckDB `list_reduce` exactly).
    *
    * The modulo is deferred across 6-char Horner blocks: acc < mod < 2³⁰
    * and 31⁶ < 2³⁰, so `acc·31⁶ + Σ cᵢ·31^j` < 2⁶⁰ + 2⁴¹ — exact in a
    * long, hence bit-identical to the per-char reduction (SketchSpec
    * pins the kernels to the per-char HOF/DuckDB folds). One `%` per 6
    * chars instead of per char — the fold is the dominant kernel cost
    * on every sketch query.
    */
  def polyHash(s: CharSequence, mod: Long): Long = {
    val n = s.length
    var acc = 0L
    var i = 0
    while (i + 6 <= n) {
      var block = acc
      block = block * 31 + s.charAt(i)
      block = block * 31 + s.charAt(i + 1)
      block = block * 31 + s.charAt(i + 2)
      block = block * 31 + s.charAt(i + 3)
      block = block * 31 + s.charAt(i + 4)
      block = block * 31 + s.charAt(i + 5)
      acc = block % mod
      i += 6
    }
    while (i < n) {
      acc = (acc * 31 + s.charAt(i)) % mod
      i += 1
    }
    acc
  }

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

  /** Min-wise permutation family: ONE polyHash per shingle, then k cheap
    * affine maps `(a_j·h + b_j) mod P1` (a_j ≠ 0 — affine mod a prime is
    * a bijection) — the classic universal-hashing scheme (also what Spark
    * ML's MinHashLSH uses). ~k× fewer string hashes than hashing each
    * shingle k times, same estimator properties. Coefficients derive
    * deterministically from the permutation index via the same portable
    * hash, so the DuckDB oracle embeds them as literals from this one
    * source of truth.
    */
  // coefficient derivation is deterministic, so the arrays are cached per
  // numHashes — the previous per-row recomputation hashed 2·k seed
  // strings and allocated two arrays for EVERY document
  private val permCache =
    new java.util.concurrent.ConcurrentHashMap[Int, (Array[Long], Array[Long])]()

  def permCoeffs(numHashes: Int): (Array[Long], Array[Long]) =
    permCache.computeIfAbsent(numHashes, k => (
      // j embedded at the FRONT of the seed: a trailing "-$j" gives
      // CONSECUTIVE coefficients for consecutive j (the fold differs by
      // one final +1), making perm_j(h) = perm_0(h) + j·(h+1) mod P1 —
      // for small h (any shingle ≤4 ASCII chars hashes < 4e6, e.g. char
      // trigrams) the j-shift is tinier than the gaps between permuted
      // values, the per-slot argmin NEVER changes, and every slot of
      // the signature agrees either fully or not at all: banding recall
      // on short-shingle sets collapses to a coin flip on perm_0. A
      // leading digit avalanches through 31^len, so coefficients mix.
      Array.tabulate(k)(j => polyHash(s"$j#graft-minhash-a", P1 - 1) + 1L),
      Array.tabulate(k)(j => polyHash(s"$j#graft-minhash-b", P1))))

  private[functions] def minhashOfShingles(sh: Array[String],
                                           numHashes: Int): Array[Long] = {
    val (a, b) = permCoeffs(numHashes)
    val sig = Array.fill(numHashes)(Long.MaxValue)
    var i = 0
    while (i < sh.length) {
      val h = polyHash(sh(i), P1)
      var j = 0
      while (j < numHashes) {
        val p = (a(j) * h + b(j)) % P1
        if (p < sig(j)) sig(j) = p
        j += 1
      }
      i += 1
    }
    sig
  }

  private[functions] def minhash(text: UTF8String, shingleN: Int,
                                 numHashes: Int): Array[Long] =
    minhashOfShingles(shingles(text, shingleN), numHashes)

  /** Band hash b = polyHash fold of signature rows [b·r, (b+1)·r),
    * seeded with the band index (so equal values in different bands
    * can't collide into one join key by construction).
    */
  private[functions] def bandHashes(sig: Array[Long], bands: Int): Array[Long] = {
    val r = sig.length / bands
    Array.tabulate(bands) { b =>
      var h = b.toLong
      var i = b * r
      while (i < (b + 1) * r) {
        h = (h * 31 + sig(i)) % P1
        i += 1
      }
      h
    }
  }

  private[functions] def simhash(text: UTF8String): Long = {
    val toks = tokenize(text)
    val counters = new Array[Int](SimBits)
    var i = 0
    while (i < toks.length) {
      val h1 = polyHash(toks(i), P1)
      val h2 = polyHash(toks(i), P2)
      var b = 0
      while (b < 30) {
        if (((h1 >>> b) & 1L) == 1L) counters(b) += 1 else counters(b) -= 1
        if (((h2 >>> b) & 1L) == 1L) counters(30 + b) += 1 else counters(30 + b) -= 1
        b += 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < SimBits) {
      if (counters(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }

  /** dHash grid: 8 columns × 9 rows = 72 "pixels", 63 gradient bits —
    * the classic difference-hash shape sized so the fingerprint stays a
    * POSITIVE signed 64-bit value (bit 62 is the highest set bit; DuckDB
    * BIGINT shifts/sums stay exact, no sign wrapping anywhere).
    */
  val DHashGridW: Int = 8
  val DHashGridH: Int = 9
  val DHashBits: Int = (DHashGridW - 1) * DHashGridH // 63

  /** 63-bit perceptual difference hash over an opaque media payload.
    *
    * The payload is box-filtered down to an 8×9 grid — pixel i is the
    * INTEGER mean of the unsigned bytes in [⌊i·len/72⌋, ⌊(i+1)·len/72⌋)
    * (an empty block, only possible for payloads under 72 bytes, reads
    * as 0) — then bit r·7+c is set iff grid[r][c] > grid[r][c+1]
    * (row-major, 7 horizontal gradients per row). Box-filtering is what
    * makes this a NEAR-dup hash: a localized edit moves a handful of
    * block means by O(1/blockLen), so most gradient signs — and hence
    * most bits — survive, exactly the robustness property image dHash
    * gets from downsampling before differencing. Every step is integer
    * algebra on byte values, so the DuckDB oracle reproduces the
    * fingerprint bit-for-bit from the hex encoding of the payload.
    *
    * Operates on the decode stub's byte signal (`Multimodal.decodeStub`);
    * a real codec deployment would swap in the decoded luma plane
    * upstream and this kernel is unchanged.
    */
  def dhash63(bytes: Array[Byte]): Long = {
    val len = bytes.length
    val nPix = DHashGridW * DHashGridH
    val px = new Array[Long](nPix)
    var i = 0
    while (i < nPix) {
      val lo = (i.toLong * len / nPix).toInt
      val hi = ((i + 1).toLong * len / nPix).toInt
      if (hi > lo) {
        var s = 0L
        var j = lo
        while (j < hi) { s += (bytes(j) & 0xFF); j += 1 }
        px(i) = s / (hi - lo)
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < DHashBits) {
      val r = b / (DHashGridW - 1)
      val c = b % (DHashGridW - 1)
      val idx = r * DHashGridW + c
      if (px(idx) > px(idx + 1)) out |= (1L << b)
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

  /** One BPE merge pass: left-to-right, non-overlapping replacement of
    * every adjacent (first, second) symbol pair with the joined symbol
    * `first + " " + second`. A just-merged symbol is strictly longer than
    * `first`, so it can never start another match in the same pass —
    * the greedy scan equals a simple fold (BpeSpec pins this against the
    * run-parity window formulation the DuckDB oracle uses).
    */
  private[functions] def bpeMerge(syms: org.apache.spark.sql.catalyst.util.ArrayData,
                                  first: UTF8String, second: UTF8String,
                                  merged: UTF8String): GenericArrayData = {
    val n = syms.numElements()
    val out = new scala.collection.mutable.ArrayBuffer[AnyRef](n)
    var i = 0
    while (i < n) {
      val cur = syms.getUTF8String(i)
      if (i + 1 < n && cur == first && syms.getUTF8String(i + 1) == second) {
        out += merged
        i += 2
      } else {
        out += cur
        i += 1
      }
    }
    new GenericArrayData(out.toArray)
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

  /** Signature from an already-shingled column — lets a pipeline that
    * also exports the shingles (e.g. for exact-Jaccard verification)
    * tokenize/shingle each document ONCE instead of once per derived
    * column.
    */
  def minhash_from_shingles(shingles: Column, numHashes: Int): Column =
    column(MinHashFromShinglesExpr(expression(shingles), numHashes))

  /** Band hashes from an already-computed signature column — a k-long
    * fold instead of re-running the whole text kernel.
    */
  def band_hashes(sig: Column, bands: Int): Column =
    column(SigBandHashesExpr(expression(sig), bands))

  def jaccard(a: Column, b: Column): Column =
    column(JaccardExpr(expression(a), expression(b)))

  /** One BPE merge pass over an ARRAY<STRING> symbol column (the merge
    * pair arrives as driver-side literals — the broadcast-merge-table
    * shape of tokenizer training, collapsed to the round's single pair).
    */
  def bpe_merge(syms: Column, first: String, second: String): Column =
    column(BpeMergeExpr(expression(syms), first, second))

  def adjacent_pairs(syms: Column): Column =
    column(AdjacentPairsExpr(expression(syms)))

  /** Sennrich char-mode BPE initial symbols: one single-character symbol
    * per code point, the last carrying the end-of-word marker.
    */
  def char_symbols(word: Column): Column =
    column(CharSymbolsExpr(expression(word)))

  def simhash(text: Column): Column = column(SimHashExpr(expression(text)))

  def dhash(media: Column): Column = column(DHashExpr(expression(media)))

  /** Portable scalar digest of an ARRAY<LONG> signature: left fold
    * `(acc·31 + elem) mod P1` — pins the whole array content into one
    * oracle-comparable BIGINT. Safe as a HOF: the array is the
    * aggregate's collection operand (evaluated once per row), not a
    * lambda-body reference, so Catalyst inlining can't multiply the
    * producer.
    */
  def sigDigest(sig: Column): Column =
    aggregate(sig, lit(0L), (acc, x) => (acc * lit(31L) + x) % lit(P1))
}

/** A word as Sennrich char-mode BPE initial symbols: one symbol per
  * CODE POINT (so the engine agrees with character-indexed oracles on
  * any BMP-or-beyond text), with `</w>` appended to the final symbol —
  * the end-of-word marker that keeps merges from crossing word
  * boundaries when words are later re-joined (Sennrich et al. 2016,
  * algorithm 1). Empty input yields an empty array.
  */
case class CharSymbolsExpr(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"char_symbols requires STRING, got ${t.sql}")
    }
  override def nullSafeEval(v: Any): Any = {
    val s = v.asInstanceOf[UTF8String].toString
    val cps = s.codePoints().toArray
    val out = new Array[Any](cps.length)
    var i = 0
    while (i < cps.length) {
      val c = new String(Character.toChars(cps(i)))
      out(i) = UTF8String.fromString(
        if (i == cps.length - 1) c + CharSymbolsExpr.EndOfWord else c)
      i += 1
    }
    new GenericArrayData(out)
  }
  override protected def withNewChildInternal(c: Expression): CharSymbolsExpr =
    copy(child = c)
  override def prettyName: String = "char_symbols"
}

object CharSymbolsExpr {
  val EndOfWord = "</w>"
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

/** MinHash signature: element j = min over shingles of the j-th affine
  * permutation of the shingle's portable polyHash (see Sketches doc).
  */
case class MinHashSigExpr(child: Expression, shingleN: Int, numHashes: Int)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(v: Any): Any =
    new GenericArrayData(Sketches.minhash(v.asInstanceOf[UTF8String], shingleN, numHashes))
  override protected def withNewChildInternal(c: Expression): MinHashSigExpr = copy(child = c)
  override def prettyName: String = "minhash_sig"
}

/** LSH band hashes of the MinHash signature: element b is the seeded
  * polyHash fold of signature slice [b·r, (b+1)·r). Tokenize→shingle→
  * sign→band in ONE pass.
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

/** MinHash signature computed from an ARRAY<STRING> shingle column (one
  * affine-family pass; the shingling/tokenizing happened upstream).
  */
case class MinHashFromShinglesExpr(child: Expression, numHashes: Int)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"minhash_from_shingles requires ARRAY<STRING>, got ${other.sql}")
    }
  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val sh = Array.tabulate(arr.numElements())(i => arr.getUTF8String(i).toString)
    new GenericArrayData(Sketches.minhashOfShingles(sh, numHashes))
  }
  override protected def withNewChildInternal(c: Expression): MinHashFromShinglesExpr =
    copy(child = c)
  override def prettyName: String = "minhash_from_shingles"
}

/** LSH band hashes computed from an ARRAY<LONG> signature column (a
  * bands × r fold over longs; no text kernel re-run).
  */
case class SigBandHashesExpr(child: Expression, bands: Int)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"band_hashes requires ARRAY<BIGINT>, got ${other.sql}")
    }
  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val sig = arr.toLongArray()
    require(sig.length % bands == 0, "bands must divide the signature length")
    new GenericArrayData(Sketches.bandHashes(sig, bands))
  }
  override protected def withNewChildInternal(c: Expression): SigBandHashesExpr =
    copy(child = c)
  override def prettyName: String = "band_hashes"
}

/** Exact Jaccard similarity of two ARRAY<STRING> shingle sets in ONE
  * pass: hash-set the left side, then classify each distinct right
  * element as intersection or right-only — no intermediate
  * intersect/union arrays (the HOF `array_intersect`/`array_union`
  * formulation allocates both per candidate pair, the dominant cost of
  * the near-dup verify join). Inputs need not be pre-deduplicated;
  * empty∪empty follows the HOF convention of jaccard = 1.
  */
case class JaccardExpr(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), ArrayType(StringType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"jaccard requires two ARRAY<STRING>, got ${l.sql} and ${r.sql}")
    }
  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val y = b.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val setA = new java.util.HashSet[UTF8String](x.numElements() * 2)
    var i = 0
    while (i < x.numElements()) { setA.add(x.getUTF8String(i)); i += 1 }
    val seenB = new java.util.HashSet[UTF8String](y.numElements() * 2)
    var inter = 0
    var bOnly = 0
    i = 0
    while (i < y.numElements()) {
      val e = y.getUTF8String(i)
      if (seenB.add(e)) { if (setA.contains(e)) inter += 1 else bOnly += 1 }
      i += 1
    }
    val union = setA.size + bOnly
    if (union > 0) inter.toDouble / union.toDouble else 1.0
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): JaccardExpr =
    copy(left = l, right = r)
  override def prettyName: String = "jaccard"
}

/** 60-bit SimHash over whitespace tokens (bit i = sign of Σ ±1 by bit i
  * of the token's two portable polyHashes — low 30 bits from the P1
  * family, high 30 from P2).
  */
case class SimHashExpr(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override def nullSafeEval(v: Any): Any = Sketches.simhash(v.asInstanceOf[UTF8String])
  override protected def withNewChildInternal(c: Expression): SimHashExpr = copy(child = c)
  override def prettyName: String = "simhash"
}

/** 63-bit perceptual difference hash over a BINARY payload (see
  * `Sketches.dhash63`): one imperative pass over the byte array — O(len)
  * with no per-byte boxing, vs the O(len) string-slicing a
  * hex/substr/conv HOF formulation would pay per block.
  */
case class DHashExpr(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case BinaryType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"dhash requires BINARY, got ${t.sql}")
    }
  override def nullSafeEval(v: Any): Any =
    Sketches.dhash63(v.asInstanceOf[Array[Byte]])
  override protected def withNewChildInternal(c: Expression): DHashExpr = copy(child = c)
  override def prettyName: String = "dhash"
}

/** One left-to-right non-overlapping BPE merge pass over a symbol array
  * (see `Sketches.bpeMerge`). The pair is a pair of literals: BPE training
  * picks one global top pair per round, so the "merge table" of the round
  * is driver-side by construction.
  */
case class BpeMergeExpr(child: Expression, first: String, second: String)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"bpe_merge requires ARRAY<STRING>, got ${t.sql}")
    }
  private lazy val f = UTF8String.fromString(first)
  private lazy val s = UTF8String.fromString(second)
  private lazy val merged = UTF8String.fromString(first + " " + second)
  override def nullSafeEval(v: Any): Any =
    Sketches.bpeMerge(v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      f, s, merged)
  override protected def withNewChildInternal(c: Expression): BpeMergeExpr =
    copy(child = c)
  override def prettyName: String = "bpe_merge"
}

/** Adjacent symbol pairs of an ARRAY<STRING> with multiplicity, as
  * (first, second) structs — the per-round counting scan of BPE
  * training in one kernel pass. The HOF form
  * (`transform(sequence(1, size-1), element_at...)`) re-resolves the
  * array per element through interpreted lambdas; this walks it once.
  */
case class AdjacentPairsExpr(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("first", StringType, nullable = false),
      org.apache.spark.sql.types.StructField("second", StringType, nullable = false))),
    containsNull = false)
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"adjacent_pairs requires ARRAY<STRING>, got ${t.sql}")
    }
  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val n = arr.numElements()
    // input arrays may carry containsNull=true (e.g. split()'s declared
    // type); the output struct fields are declared non-nullable, so a
    // pair touching a null element is skipped rather than emitted — a
    // null symbol can never be a BPE merge participant anyway
    val out = new scala.collection.mutable.ArrayBuffer[Any](math.max(0, n - 1))
    var i = 0
    while (i < n - 1) {
      val a = if (arr.isNullAt(i)) null else arr.getUTF8String(i)
      val b = if (arr.isNullAt(i + 1)) null else arr.getUTF8String(i + 1)
      if (a != null && b != null) {
        out += new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
          Array[Any](a, b))
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }
  override protected def withNewChildInternal(c: Expression): AdjacentPairsExpr =
    copy(child = c)
  override def prettyName: String = "adjacent_pairs"
}
