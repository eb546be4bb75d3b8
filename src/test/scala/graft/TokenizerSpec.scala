package graft

import org.apache.spark.sql.functions._
import graft.functions.Sketches
import graft.ops.TextAnalysis

/** Pins the TWO tokenizations the repo ships — they intentionally differ
  * on edge whitespace, and each oracle formula must pair with the right
  * one (round-3's only hash-FAIL was `token_budget_pack` pairing the
  * split-based count with the kernel-style filtered oracle):
  *
  *  - `TextAnalysis.tokenCount` = `size(split(trim(text), "\s+"))`:
  *    Spark `trim` strips ONLY spaces (0x20); `split` (limit -1) keeps
  *    leading AND trailing empty tokens and returns `[""]` (size 1) for
  *    empty input — DuckDB `string_split_regex` matches all three quirks. Its DuckDB
  *    oracle formula is the UNFILTERED
  *    `len(string_split_regex(trim(text), '\s+'))` (token_stats,
  *    token_budget_pack).
  *
  *  - the kernel `Sketches.tokenize` (word_ngrams / minhash / simhash /
  *    repetition_stats / lang_id): Java `String.trim` first (strips all
  *    chars <= ' ' at the ends), then splits skipping empties — no empty
  *    tokens ever. Its DuckDB oracle formula is
  *    `ExtendedQueries.kernelToksSql`: a `[\x00-\x20]` edge strip
  *    (Java-trim equivalent) then the FILTERED
  *    `list_filter(string_split_regex(…, '[ \t-\r]+'), x -> x <> '')`
  *    (bpe_pair_counts, decontamination, doc_repetition, minhash/simhash
  *    CTEs). With the edge strip the two sides agree on EVERY string,
  *    including control chars < 0x09 / in 0x0E..0x1F at the edges.
  */
class TokenizerSpec extends SparkSpec {
  import spark.implicits._

  // leading tab, empty text, whitespace-only, trailing newline, interior
  // vertical-tab: the exact shapes that flipped token_budget_pack in r3
  val edge = Seq(
    (0L, ""),
    (1L, " "),
    (2L, "\ta b"),
    (3L, "a b\n"),
    (4L, " a  b "),
    (5L, "a\u000Bb"),
    (6L, "\n\nplain text here\n")
  ).toDF("doc_id", "text")

  test("split-based tokenCount: space-only trim, leading empty kept, [\"\"] for empty") {
    val got = edge.select($"doc_id", TextAnalysis.tokenCount($"text").as("n"))
      .as[(Long, Long)].collect().toMap
    assert(got(0L) == 1L) // "" -> [""]
    assert(got(1L) == 1L) // " " -> trim -> "" -> [""]
    assert(got(2L) == 3L) // "\ta b" -> leading \t survives trim -> ["","a","b"]
    assert(got(3L) == 3L) // Spark split (limit -1) KEEPS the trailing empty
    assert(got(4L) == 2L) // edge spaces trimmed
    assert(got(5L) == 2L) // \x0B is \s in Java regex
    assert(got(6L) == 5L) // leading \n survives space-only trim; both edge empties kept
  }

  test("kernel tokenize (via word_ngrams n=1): Java trim, no empty tokens") {
    val got = edge.select($"doc_id", Sketches.word_ngrams($"text", 1).as("t"))
      .as[(Long, Seq[String])].collect().toMap
    assert(got(0L) == Seq())
    assert(got(1L) == Seq())
    assert(got(2L) == Seq("a", "b")) // Java trim strips the leading \t
    assert(got(3L) == Seq("a", "b"))
    assert(got(4L) == Seq("a", "b"))
    assert(got(5L) == Seq("a", "b")) // interior \x0B splits (isWs: \t..\r)
    assert(got(6L) == Seq("plain", "text", "here"))
  }

  test("the two tokenizations disagree exactly where documented") {
    val both = edge.select(
      TextAnalysis.tokenCount($"text").as("a"),
      size(Sketches.word_ngrams($"text", 1)).cast("long").as("b"))
      .as[(Long, Long)].collect()
    // empty/whitespace-only and edge-\t/\n docs differ; clean docs agree
    assert(both.count { case (a, b) => a != b } == 5)
  }

  test("tokenBudgetPack nt column uses the split-based count (oracle pairing)") {
    // the query derives nt via TextAnalysis.tokenCount; pin that choice so
    // a refactor to the kernel tokenizer forces this spec (and the oracle
    // formula) to change together
    val df = edge.withColumn("source", lit("s"))
    val nt = df.select(TextAnalysis.tokenCount($"text").as("nt"))
      .as[Long].collect().sorted
    assert(nt.toSeq == Seq(1L, 1L, 2L, 2L, 3L, 3L, 5L))
  }
}
