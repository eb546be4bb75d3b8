package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodegenFallback, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Hot-path numeric expressions with real codegen (`doGenCode`), replacing
  * interpreted higher-order-function chains:
  *
  *  - `DotProductExpr`: Σ aᵢ·bᵢ over two ARRAY<FLOAT> columns. The HOF
  *    form (`aggregate(zip_with(...))`) allocates an intermediate array
  *    and boxes every element per pair — at 4M candidate pairs × 64 dims
  *    that is the entire runtime of the nearest-neighbor query. This
  *    expression is a primitive float loop, and with codegen it inlines
  *    into the generated join-projection code.
  *  - `PolyHashExpr`: left-fold polynomial rolling hash over the string's
  *    UTF-16 code units, identical to the HOF fold
  *    `(acc·31 + ascii(char)) % m` for BMP text (verified in ScalaTest).
  *
  * Both keep left-fold evaluation order, so results are bit-identical to
  * the HOF formulations and to DuckDB's `list_reduce` oracle.
  */
object MathExprs {
  import org.apache.spark.sql.GraftColumnBridge.{toColumn => column, toExpression => expression}

  def dotProduct(a: Column, b: Column): Column =
    column(DotProductExpr(expression(a), expression(b)))

  def polyHash(text: Column, mod: Long): Column =
    column(PolyHashExpr(expression(text), mod))

  def sigAgree(a: Column, b: Column): Column =
    column(SigAgreeExpr(expression(a), expression(b)))

  def quantizeStats(vec: Column): Column =
    column(QuantizeStatsExpr(expression(vec)))

  def int8Quantize(vec: Column): Column =
    column(Int8QuantizeExpr(expression(vec)))

  def int8Dot(a: Column, b: Column): Column =
    column(Int8DotExpr(expression(a), expression(b)))

  def int8ToLongs(a: Column): Column =
    column(Int8ToLongsExpr(expression(a)))

  def qdistSq(q: Column, c: Column): Column =
    column(QDistSqExpr(expression(q), expression(c)))

  def packInt8(a: Column): Column =
    column(PackInt8Expr(expression(a)))
}

/** Pack an ARRAY<INT> of small values (PQ codes) into BINARY, one byte
  * per element — the persisted codes-only form (8 bytes per vector at
  * m=8). Values must fit a signed byte; PQ codes (0 ≤ code < k ≤ 128)
  * do by construction. Inverse bridge is `Int8ToLongsExpr`.
  */
case class PackInt8Expr(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = BinaryType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(IntegerType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"pack_int8 requires ARRAY<INT>, got ${other.sql}")
    }

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val out = new Array[Byte](n)
    var i = 0
    while (i < n) { out(i) = arr.getInt(i).toByte; i += 1 }
    out
  }

  override protected def withNewChildInternal(c: Expression): PackInt8Expr =
    copy(child = c)
  override def prettyName: String = "pack_int8"
}

/** Widen an int8-quantized BINARY vector to ARRAY<LONG> — the bridge
  * from the packed storage form to Spark's array machinery (posexplode
  * for per-dimension integer sums in distributed k-means). Once per row
  * on the aggregation path, so CodegenFallback costs nothing.
  */
case class Int8ToLongsExpr(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case BinaryType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"int8_to_longs requires BINARY, got ${other.sql}")
    }

  override def nullSafeEval(v: Any): Any = {
    val bytes = v.asInstanceOf[Array[Byte]]
    val out = new Array[Long](bytes.length)
    var i = 0
    while (i < bytes.length) { out(i) = bytes(i).toLong; i += 1 }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(c: Expression): Int8ToLongsExpr =
    copy(child = c)
  override def prettyName: String = "int8_to_longs"
}

/** Squared Euclidean distance between an int8-quantized BINARY vector
  * and an ARRAY<DOUBLE> centroid, accumulated as a LEFT FOLD — the
  * k-means assignment kernel, evaluated k times per corpus row per
  * Lloyd iteration. The fold order is the reproducibility contract:
  * the DuckDB oracle's `list_reduce` folds the same terms in the same
  * order over the same deterministic inputs, so the doubles — and the
  * argmin they decide — are bit-identical. Codegen'd for the hot loop.
  */
case class QDistSqExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, ArrayType(DoubleType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"qdist_sq requires (BINARY, ARRAY<DOUBLE>), got ${l.sql} and ${r.sql}")
    }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val q = a.asInstanceOf[Array[Byte]]
    val c = b.asInstanceOf[ArrayData]
    val n = math.min(q.length, c.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      val d = q(i).toDouble - c.getDouble(i)
      acc += d * d
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val d = ctx.freshName("d")
      s"""
         |int $n = java.lang.Math.min($a.length, $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $d = ((double) $a[$i]) - $b.getDouble($i);
         |  $acc += $d * $d;
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): QDistSqExpr =
    copy(left = l, right = r)
  override def prettyName: String = "qdist_sq"
}

/** Symmetric int8 quantization of an ARRAY<FLOAT> vector to BINARY —
  * the STORAGE form of `QuantizeStatsExpr`'s statistics: one signed
  * byte per dimension (4× smaller than float32, the representation a
  * 100 TB vector store scans). Same per-vector scale (max|x|/127) and
  * the same half-away-from-zero rounding as `quantize_stats`, so
  * q ∈ [−127, 127] always fits a byte. The scale itself is NOT stored:
  * every consumer here is cosine-shaped, and per-vector scales cancel
  * out of cosine (sim = Σq_aq_b / (‖q_a‖‖q_b‖)), which is what makes
  * the whole SQ8 search path exact integer arithmetic — reproducible
  * bit-for-bit by the DuckDB oracle. CodegenFallback is fine: this
  * runs once per corpus row in the scan projection, not per pair.
  */
case class Int8QuantizeExpr(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = BinaryType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"int8_quantize requires ARRAY<FLOAT>, got ${other.sql}")
    }

  private def roundHalfAway(v: Double): Long = {
    val f = math.floor(v)
    val diff = v - f // exact for |v| < 2^52
    if (diff > 0.5) f.toLong + 1L
    else if (diff < 0.5) f.toLong
    else if (v >= 0) f.toLong + 1L
    else f.toLong
  }

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    var maxAbs = 0.0
    var i = 0
    while (i < n) {
      val x = math.abs(arr.getFloat(i).toDouble)
      if (x > maxAbs) maxAbs = x
      i += 1
    }
    val scale = maxAbs / 127.0
    val out = new Array[Byte](n)
    i = 0
    while (i < n) {
      val x = arr.getFloat(i).toDouble
      out(i) = if (scale == 0.0) 0 else roundHalfAway(x / scale).toByte
      i += 1
    }
    out
  }

  override protected def withNewChildInternal(c: Expression): Int8QuantizeExpr =
    copy(child = c)
  override def prettyName: String = "int8_quantize"
}

/** Integer dot product over two int8-quantized BINARY vectors — the
  * SQ8 search kernel (self-dot gives the squared quantized norm). The
  * accumulator is exact: |Σ q_aq_b| ≤ dim·127² stays far below 2^63.
  * Codegen'd — this inlines into the generated join projection and
  * runs once per candidate pair.
  */
case class Int8DotExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, BinaryType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"int8_dot requires two BINARY, got ${l.sql} and ${r.sql}")
    }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[Array[Byte]]
    val y = b.asInstanceOf[Array[Byte]]
    val n = math.min(x.length, y.length)
    var acc = 0L
    var i = 0
    while (i < n) {
      acc += x(i).toLong * y(i).toLong
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.length, $b.length);
         |long $acc = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += ((long) $a[$i]) * ((long) $b[$i]);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Int8DotExpr =
    copy(left = l, right = r)
  override def prettyName: String = "int8_dot"
}

/** Symmetric int8 quantization statistics of an ARRAY<FLOAT> vector in
  * ONE pass: returns [scale, q_sum, q_sumsq, mean_abs_err] where
  * scale = max|x|/127 and q_i = round(x_i/scale) half-away-from-zero
  * (the convention Spark's `round` and DuckDB's `round` share — ties
  * are decided on the EXACT binary value: floor-diff arithmetic is
  * exact for |v| < 2^52, so no epsilon ambiguity). A composed-HOF
  * formulation would inline the scale subexpression into every lambda
  * (re-folding max|x| per element — the documented Catalyst trap);
  * this kernel folds everything once per row. CodegenFallback: one
  * virtual call per row around a primitive loop, off the
  * whole-stage-codegen critical path by construction.
  */
case class QuantizeStatsExpr(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  // misuse (e.g. ARRAY<DOUBLE>) must fail at analysis, not silently
  // return garbage from getFloat on the wrong layout. containsNull=true
  // is accepted — parquet list schemas default to nullable elements even
  // when no null ever occurs — and actual null elements read as 0.0f
  // (ArrayData convention), which the quantizer treats as a zero sample.
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"quantize_stats requires ARRAY<FLOAT>, got ${other.sql}")
    }

  private def roundHalfAway(v: Double): Long = {
    val f = math.floor(v)
    val diff = v - f // exact for |v| < 2^52
    if (diff > 0.5) f.toLong + 1L
    else if (diff < 0.5) f.toLong
    else if (v >= 0) f.toLong + 1L
    else f.toLong
  }

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    var maxAbs = 0.0
    var i = 0
    while (i < n) {
      val x = math.abs(arr.getFloat(i).toDouble)
      if (x > maxAbs) maxAbs = x
      i += 1
    }
    val scale = maxAbs / 127.0
    var qSum = 0L
    var qSumSq = 0L
    var err = 0.0
    i = 0
    while (i < n) {
      val x = arr.getFloat(i).toDouble
      val q = if (scale == 0.0) 0L else roundHalfAway(x / scale)
      qSum += q
      qSumSq += q * q
      err += math.abs(q.toDouble * scale - x)
      i += 1
    }
    new GenericArrayData(Array(scale, qSum.toDouble, qSumSq.toDouble,
      if (n > 0) err / n else 0.0))
  }

  override protected def withNewChildInternal(c: Expression): QuantizeStatsExpr =
    copy(child = c)
  override def prettyName: String = "quantize_stats"
}

/** Count of positions where two ARRAY<LONG> signatures agree — the
  * MinHash Jaccard estimator's numerator, evaluated over ~10⁵-10⁷
  * candidate pairs per dedup run (the HOF zip_with+filter form allocates
  * two intermediate arrays per pair).
  */
case class SigAgreeExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = IntegerType

  // same analysis-time guard as QuantizeStatsExpr: getLong on a non-LONG
  // array layout returns garbage, never throws
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"sig_agree requires two ARRAY<BIGINT>, got ${l.sql} and ${r.sql}")
    }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var agree = 0
    var i = 0
    while (i < n) {
      if (x.getLong(i) == y.getLong(i)) agree += 1
      i += 1
    }
    agree
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val agree = ctx.freshName("agree")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |int $agree = 0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.getLong($i) == $b.getLong($i)) $agree++;
         |}
         |${ev.value} = $agree;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): SigAgreeExpr =
    copy(left = l, right = r)
  override def prettyName: String = "sig_agree"
}

case class DotProductExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType

  // getFloat on an ARRAY<DOUBLE> layout reads half a double as a float —
  // garbage, not an error; reject at analysis
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(FloatType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"dot_product requires two ARRAY<FLOAT>, got ${l.sql} and ${r.sql}")
    }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += ((double) $a.getFloat($i)) * ((double) $b.getFloat($i));
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): DotProductExpr =
    copy(left = l, right = r)
  override def prettyName: String = "dot_product"
}

case class PolyHashExpr(child: Expression, mod: Long)
    extends UnaryExpression {
  override def dataType: DataType = LongType

  // the modulo defers across 6-char Horner blocks (acc < mod < 2^30 and
  // 31^6 < 2^30 keep the block < 2^60 + 2^41 — exact in a long, so
  // bit-identical to the per-char fold; see Sketches.polyHash)
  override def nullSafeEval(v: Any): Any =
    graft.functions.Sketches.polyHash(v.asInstanceOf[UTF8String].toString, mod)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      val str = ctx.freshName("str")
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val blk = ctx.freshName("blk")
      s"""
         |java.lang.String $str = $s.toString();
         |int $n = $str.length();
         |long $acc = 0L;
         |int $i = 0;
         |for (; $i + 6 <= $n; $i += 6) {
         |  long $blk = $acc;
         |  $blk = $blk * 31L + (long) $str.charAt($i);
         |  $blk = $blk * 31L + (long) $str.charAt($i + 1);
         |  $blk = $blk * 31L + (long) $str.charAt($i + 2);
         |  $blk = $blk * 31L + (long) $str.charAt($i + 3);
         |  $blk = $blk * 31L + (long) $str.charAt($i + 4);
         |  $blk = $blk * 31L + (long) $str.charAt($i + 5);
         |  $acc = $blk % ${mod}L;
         |}
         |for (; $i < $n; $i++) {
         |  $acc = ($acc * 31L + (long) $str.charAt($i)) % ${mod}L;
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): PolyHashExpr = copy(child = c)
  override def prettyName: String = "poly_hash"
}
