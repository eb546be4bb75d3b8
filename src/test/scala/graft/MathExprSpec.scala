package graft

import org.apache.spark.sql.functions._
import graft.functions.{MathExprs, VectorFunctions}
import graft.ops.TextAnalysis

/** Codegen'd hot-path expressions vs their HOF executable specs. */
class MathExprSpec extends SparkSpec {
  import spark.implicits._

  test("quantize_stats: scale, integer checksums, and tie rounding away from zero") {
    val df = Seq(
      (1L, Seq(1.0f, -2.0f, 0.5f)),
      (2L, Seq(0.0f, 0.0f)), // zero vector → scale 0, all q = 0
      (3L, Seq(2.0f))) // exact max → q = 127, zero error
      .toDF("vec_id", "embedding")
    val got = df.select($"vec_id",
        graft.functions.MathExprs.quantizeStats($"embedding").as("qs"))
      .select($"vec_id", $"qs" (0), $"qs" (1), $"qs" (2), $"qs" (3))
      .as[(Long, Double, Double, Double, Double)].collect()
      .map(t => t._1 -> ((t._2, t._3, t._4, t._5))).toMap
    // vec 1: scale = 2/127; q = round(x·127/2) = (64 [tie → away], -127, 32)
    val (s1, qSum1, qSumSq1, err1) = got(1L)
    assert(s1 == 2.0 / 127.0)
    assert(qSum1 == (64 - 127 + 32).toDouble && qSumSq1 == (64 * 64 + 127 * 127 + 32 * 32).toDouble)
    assert(err1 >= 0.0 && err1 < s1) // reconstruction error under one quant step
    assert(got(2L) == ((0.0, 0.0, 0.0, 0.0)))
    val (s3, qSum3, qSumSq3, err3) = got(3L)
    assert(s3 == 2.0 / 127.0 && qSum3 == 127.0 && qSumSq3 == 127.0 * 127.0 && err3 == 0.0)
  }

  test("int8_quantize + int8_dot: bytes match quantize_stats checksums") {
    // the BINARY form and the stats form share scale + rounding; the
    // self-dot of the bytes must equal quantize_stats' q_sumsq, and the
    // byte sum its q_sum — on every fixture embedding, not toy rows
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val ones = lit(Array.fill(64)(1.toByte)) // Σ q_i = q · 1-vector
    val mismatch = emb.select(
        MathExprs.quantizeStats($"embedding").as("qs"),
        MathExprs.int8Quantize($"embedding").as("q"))
      .select(
        $"qs" (1).as("q_sum"), $"qs" (2).as("q_sumsq"),
        MathExprs.int8Dot($"q", $"q").cast("double").as("self_dot"),
        MathExprs.int8Dot($"q", ones).cast("double").as("byte_sum"))
      .filter($"q_sumsq" =!= $"self_dot" || $"q_sum" =!= $"byte_sum")
      .count()
    assert(mismatch == 0L)
  }

  test("int8_dot: signed bytes, length mismatch, empty") {
    val rows = Seq(
      (Array[Byte](127, -127, 1), Array[Byte](127, 127, -2)),
      (Array[Byte](), Array[Byte]()),
      (Array[Byte](5, 7), Array[Byte](3))) // loop stops at min length
      .toDF("a", "b")
    val got = rows.select(MathExprs.int8Dot($"a", $"b")).as[Long].collect()
    assert(got(0) == 127L * 127 - 127L * 127 - 2L)
    assert(got(1) == 0L)
    assert(got(2) == 15L)
  }

  test("dot_product == HOF fold, bit-identical, incl. length mismatch and empties") {
    val rows = Seq(
      (Seq(1.5f, -2.25f, 3.125f), Seq(0.5f, 4.0f, -1.25f)),
      (Seq.empty[Float], Seq.empty[Float]),
      (Seq(1.0f, 2.0f), Seq(3.0f)) // zip_with pads with null; loop stops at min
    ).toDF("a", "b")
    val both = rows.select(
      VectorFunctions.dot($"a", $"b").as("fast"),
      VectorFunctions.dotHof($"a", $"b").as("spec"))
      .as[(Option[Double], Option[Double])].collect()
    // mismatched lengths: HOF spec nulls out (zip_with pads), fast uses min-len
    assert(both(0)._1 == both(0)._2)
    assert(both(1)._1 == both(1)._2)
    assert(both(0)._1.get == (1.5 * 0.5 + (-2.25) * 4.0 + 3.125 * (-1.25)))
  }

  test("poly_hash == HOF fold on the documents fixture (all 500 docs)") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val mismatch = docs.select(
      TextAnalysis.fingerprint($"text").as("fast"),
      TextAnalysis.fingerprintHof($"text").as("spec"))
      .filter($"fast" =!= $"spec").count()
    assert(mismatch == 0)
  }

  test("poly_hash codegen and interpreted paths agree") {
    val df = Seq("hello world", "", "a").toDF("t")
    val viaExpr = df.select(MathExprs.polyHash($"t", 1000000007L)).as[Long].collect().toSeq
    def fold(s: String) = s.foldLeft(0L)((a, c) => (a * 31 + c) % 1000000007L)
    assert(viaExpr == Seq(fold("hello world"), 0L, fold("a")))
  }

  test("l2Norm via dot matches scala") {
    val got = Seq(Seq(3.0f, 4.0f)).toDF("v")
      .select(VectorFunctions.l2Norm($"v")).as[Double].collect().head
    assert(got == 5.0)
  }

  test("array kernels reject wrong element types at ANALYSIS, not as runtime garbage") {
    // ArrayData.getFloat/getLong on the wrong layout silently misreads
    // bytes — these must die in the analyzer
    val dbl = Seq(Seq(1.0, 2.0)).toDF("v") // ARRAY<DOUBLE>
    val flt = Seq(Seq(1.0f, 2.0f)).toDF("v") // ARRAY<FLOAT>
    def analysisFails(bad: => org.apache.spark.sql.DataFrame, name: String): Unit = {
      val e = intercept[org.apache.spark.sql.AnalysisException](bad.collect())
      assert(e.getMessage.toLowerCase.contains(name), e.getMessage)
    }
    analysisFails(dbl.select(MathExprs.quantizeStats($"v")), "quantize_stats")
    analysisFails(dbl.select(MathExprs.dotProduct($"v", $"v")), "dot_product")
    analysisFails(flt.select(MathExprs.sigAgree($"v", $"v")), "sig_agree")
    // the correct types still pass analysis
    assert(flt.select(MathExprs.quantizeStats($"v")).count() == 1)
  }
}
