package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.queries.ExtendedQueries

/** Pins `ngram_lm_perplexity` (the CCNet-style bigram-LM quality score)
  * against an independent plain-Scala reference model on a corpus small
  * enough to audit by hand: same add-one smoothing, same
  * P(w2|w1) = (c12+1)/(c1+V) with the context total c1 defined as the
  * SUM OF BIGRAM COUNTS for the context word (occurrences as a
  * non-final token) — the definition the oracle SQL uses too.
  */
class LmPerplexitySpec extends SparkSpec {
  import spark.implicits._

  private lazy val dir: String = {
    val d = Files.createTempDirectory("graft-lm").toString
    Seq(
      (1L, "a b a b c"),   // repeated bigram (a,b) ×2
      (2L, "a b"),         // single bigram, shared with doc 1
      (3L, "c c c"),       // self-bigram context
      (4L, "z"),           // one token: no bigrams, must drop out
      (5L, "b a")          // reversed order is a distinct bigram
    ).toDF("doc_id", "text")
      .select(col("doc_id"), col("text"), lit("en").as("lang"),
        lit("t").as("source"), length(col("text")).cast("long").as("n_chars"))
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    d
  }

  private def referenceModel(docs: Seq[(Long, String)]) = {
    val toks = docs.map { case (id, t) => id -> t.trim.split("\\s+").toSeq }
    val bigrams = toks.flatMap { case (id, ts) =>
      ts.zip(ts.drop(1)).map(p => (id, p._1, p._2)) }
    val c12 = bigrams.groupBy(b => (b._2, b._3)).view.mapValues(_.size).toMap
    val c1 = c12.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    val v = toks.flatMap(_._2).distinct.size.toDouble
    docs.flatMap { case (id, _) =>
      val bs = bigrams.filter(_._1 == id)
      if (bs.isEmpty) None
      else {
        val logs = bs.map { case (_, w1, w2) =>
          math.log((c12((w1, w2)) + 1.0) / (c1(w1) + v)) / math.log(2.0) }
        val ce = BigDecimal(-logs.sum / logs.size)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        val ppl = BigDecimal(math.pow(2.0, ce))
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
        Some((id, bs.size.toLong, ce, ppl))
      }
    }.sortBy(_._1)
  }

  test("matches the plain-Scala reference model, bigram counts and all") {
    val got = ExtendedQueries.ngramLmPerplexity(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
      .toSeq
    val want = referenceModel(Seq(
      (1L, "a b a b c"), (2L, "a b"), (3L, "c c c"), (4L, "z"), (5L, "b a")))
    assert(got.map(t => (t._1, t._2)) == want.map(t => (t._1, t._2)))
    got.zip(want).foreach { case (g, w) =>
      assert(math.abs(g._3 - w._3) < 1e-9, s"cross_entropy doc ${g._1}: $g vs $w")
      assert(math.abs(g._4 - w._4) < 1e-9, s"perplexity doc ${g._1}: $g vs $w")
    }
  }

  test("a bigram-free doc drops out; every other doc scores") {
    val ids = ExtendedQueries.ngramLmPerplexity(spark, dir)
      .select("doc_id").as[Long].collect().toSet
    assert(ids == Set(1L, 2L, 3L, 5L))
  }

  test("repeated fluent text scores lower entropy than a one-off bigram") {
    val rows = ExtendedQueries.ngramLmPerplexity(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    // (a,b) appears 3× corpus-wide; (b,a) once — doc 2 (all high-count
    // bigrams) must beat doc 5 (the one-off) on cross-entropy
    assert(rows(2L) < rows(5L))
  }
}
