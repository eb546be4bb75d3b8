package graft

import org.apache.spark.sql.functions._
import graft.ops.{Dedup, TextAnalysis}

/** Exact repeated-substring spans (Lee et al. ExactSubstr) — the Spark
  * pipeline against a brute-force in-memory model on planted documents,
  * plus the classifier kernel against a per-token recomputation.
  */
class SubstringSpanSpec extends SparkSpec {
  import spark.implicits._

  private val w = 4

  // planted corpus: doc 1 and 2 share an exact 6-token run ("the quick
  // brown fox jumps high"), doc 3 repeats its own 4-token run twice,
  // doc 4 is unique, doc 5 is too short to window
  private val docs = Seq(
    (1L, "the quick brown fox jumps high over the old stone wall today"),
    (2L, "yesterday the quick brown fox jumps high again without pause"),
    (3L, "alpha beta gamma delta padding words alpha beta gamma delta"),
    (4L, "completely unrelated text with no repeated runs anywhere here"),
    (5L, "too short")
  ).toDF("doc_id", "text")

  private def bruteModel(): Map[Long, (Long, Long, Long, Long, Long)] = {
    val toks = docs.as[(Long, String)].collect().toMap
      .view.mapValues(_.trim.split("\\s+").toSeq).toMap
    val wins = toks.toSeq.flatMap { case (id, ts) =>
      if (ts.size < w) Seq.empty
      else (0 to ts.size - w).map(p => (id, p, ts.slice(p, p + w).mkString(" ")))
    }
    val counts = wins.groupBy(_._3).view.mapValues(_.size).toMap
    val rep = wins.filter(x => counts(x._3) > 1)
    rep.groupBy(_._1).map { case (id, xs) =>
      val ps = xs.map(_._2).sorted
      // merge positions into spans: break when gap > w
      val spans = ps.foldLeft(List.empty[(Int, Int)]) {
        case (Nil, p)                          => List((p, p))
        case ((s, e) :: t, p) if p - e <= w    => (s, p) :: t
        case (acc, p)                          => (p, p) :: acc
      }.reverse
      val nWin = wins.count(_._1 == id).toLong
      id -> (nWin, xs.size.toLong, spans.size.toLong,
        spans.map { case (s, e) => e - s + w }.max.toLong,
        spans.map { case (s, e) => e - s + w }.sum.toLong)
    }
  }

  test("repeatedSubstringSpans matches the brute-force model on planted docs") {
    val got = Dedup.repeatedSubstringSpans(docs, "doc_id", "text", w)
      .select("id", "n_windows", "n_repeated", "n_spans", "max_span_tokens",
        "n_rep_tokens")
      .as[(Long, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4, r._5, r._6)).toMap
    assert(got == bruteModel())
    // cross-doc dup (1, 2) and the self-repeating doc 3 all surface;
    // unique doc 4 and underlength doc 5 don't
    assert(got.keySet == Set(1L, 2L, 3L))
  }

  test("doc 3's two separated self-repeats stay separate spans") {
    val got = Dedup.repeatedSubstringSpans(docs, "doc_id", "text", w)
      .filter($"id" === 3L).select("n_spans", "max_span_tokens")
      .as[(Long, Long)].head()
    assert(got == ((2L, 4L))) // two 4-token islands, not one merged span
  }

  test("substringDedup cuts exactly the repeated spans and reassembles") {
    // brute model: remove tokens covered by any merged span, rejoin
    val toks = docs.as[(Long, String)].collect().toMap
      .view.mapValues(_.trim.split("\\s+").toSeq.filter(_.nonEmpty)).toMap
    val spansOf = bruteModel() // only used for span membership below
    val wins = toks.toSeq.flatMap { case (id, ts) =>
      if (ts.size < w) Seq.empty
      else (0 to ts.size - w).map(p => (id, p, ts.slice(p, p + w).mkString(" ")))
    }
    val counts = wins.groupBy(_._3).view.mapValues(_.size).toMap
    val covered: Map[Long, Set[Int]] = wins
      .filter(x => counts(x._3) > 1)
      .groupBy(_._1).view
      .mapValues(_.flatMap(x => x._2 until x._2 + w).toSet).toMap
    val expected = toks.map { case (id, ts) =>
      val cov = covered.getOrElse(id, Set.empty)
      val kept = ts.zipWithIndex.collect { case (t, i) if !cov(i) => t }
      id -> (ts.size.toLong, (ts.size - kept.size).toLong,
        kept.size.toLong, kept.mkString(" "))
    }
    val got = Dedup.substringDedup(docs, "doc_id", "text", w)
      .as[(Long, Long, Long, Long, String)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4, r._5)).toMap
    assert(got == expected)
    // all 5 docs survive; untouched docs keep their full text
    assert(got.keySet == Set(1L, 2L, 3L, 4L, 5L))
    assert(got(4L)._2 == 0L && got(4L)._4 == toks(4L).mkString(" "))
    assert(spansOf.keySet.forall(id => got(id)._2 > 0L))
  }

  test("linearClassifierScore == per-token polyHash sum") {
    val expected = docs.as[(Long, String)].collect().map { case (id, t) =>
      val toks = t.trim.split("\\s+", -1).toSeq
      id -> toks.map(tk =>
        graft.functions.Sketches.polyHash(tk, 2001L) - 1000L).sum
    }.toMap
    val got = docs.select($"doc_id",
        TextAnalysis.linearClassifierScore($"text").as("s"))
      .as[(Long, Long)].collect().toMap
    assert(got == expected)
  }
}
