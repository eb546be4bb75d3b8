package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.queries.ExtendedQueries

/** Scale rehearsal under the exact degenerate shape the mega-bucket star
  * and partial-aggregation guards exist for: the sf0.1 documents table
  * unioned with ONE boilerplate block planted 50,000 times (the
  * "same footer on every page" corpus — the distribution crawl dedup
  * actually faces).
  *
  * Without the guards this corpus is quadratic: 50k identical docs share
  * every LSH band bucket (~2.5e9 candidate pairs materialized from one
  * bucket) and every 15-token window of the block repeats 50k times (a
  * gram-partition window would hand a single task 800k rows of one key).
  * With them, candidate volume per band collapses to a min-id-hub star
  * (~50k edges) and the repeated-gram count is absorbed by map-side
  * partial aggregation — so each query's wall time must stay within ~2×
  * of its clean-corpus run even though the corpus has 11× the rows.
  *
  * Timing assertions use the min of two measured runs (after a warmup)
  * and a small absolute slack so JIT/GC noise on the shared local[4]
  * session can't flake the bound; the real failure mode this guards
  * against is catastrophic (minutes, not milliseconds).
  */
class DegenerateCorpusSpec extends SparkSpec {

  private val cleanDir = "/root/testdata/sf0.1"

  private lazy val degenerateDir: String = {
    val dir = Files.createTempDirectory("graft-degenerate-sf01").toString
    val clean = graft.model.Tables.documents(spark, cleanDir)
    val boiler = "all rights reserved contact us subscribe to our newsletter " +
      "for updates terms of service privacy policy cookie settings follow " +
      "us on social media copyright twenty twenty four example corporation"
    import spark.implicits._
    val planted = spark.range(50000)
      .select(
        (col("id") + lit(10000000L)).as("doc_id"),
        lit(boiler).as("text"),
        lit("en").as("lang"),
        lit("boilerplate").as("source"),
        lit(boiler.length.toLong).as("n_chars"))
    clean.unionByName(planted)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  /** Wall time of the full query (collect forces execution), min of two
    * runs. The caller warms the code path first.
    */
  private def timed(run: => Unit): Double =
    (1 to 2).map { _ =>
      val t0 = System.nanoTime()
      run
      (System.nanoTime() - t0) / 1e9
    }.min

  private def rehearse(name: String,
                       query: (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame): Unit = {
    query(spark, cleanDir).collect() // warmup: JIT + codegen cache
    val clean = timed(query(spark, cleanDir).collect())
    val degenerate = timed(query(spark, degenerateDir).collect())
    val bound = 2.0 * clean + 3.0
    info(f"$name: clean $clean%.2fs, degenerate $degenerate%.2fs (bound $bound%.2fs)")
    assert(degenerate <= bound,
      f"$name degenerate run $degenerate%.2fs exceeds 2x clean ($clean%.2fs) + 3s slack — " +
        "a quadratic guard (mega-bucket star / partial-agg absorption) regressed")
  }

  test("minhash_top_pairs survives a 50k-copy boilerplate block within ~2x of clean") {
    rehearse("minhash_top_pairs", ExtendedQueries.minhashTopPairs)
  }

  test("dedup_clusters survives a 50k-copy boilerplate block within ~2x of clean") {
    rehearse("dedup_clusters", ExtendedQueries.dedupClusters)
  }

  test("substring_spans survives a 50k-copy boilerplate block within ~2x of clean") {
    rehearse("substring_spans", ExtendedQueries.substringSpans)
  }

  test("incremental_dedup survives a 50k-copy boilerplate block within ~2x of clean") {
    // 40k copies land in the index, 10k arrive as the probed batch: the
    // cross leg's hub cap and the intra leg's mega-bucket star both fire
    rehearse("incremental_dedup", ExtendedQueries.all("incremental_dedup"))
  }

  test("ngram_lm_perplexity survives a 50k-copy boilerplate block within ~2x of clean") {
    // 50k identical docs multiply a handful of bigram KEYS by 50k
    // occurrences each — map-side partial aggregation absorbs the
    // repeats before the term shuffle, and the scoring join fans the
    // tiny probability table back out without a wide-key blowup
    rehearse("ngram_lm_perplexity", ExtendedQueries.ngramLmPerplexity)
  }

  test("soft_dedup_weights survives a 50k-copy boilerplate block within ~2x of clean") {
    // one 50k-member cluster: the size window sees a single 50k-row
    // partition (linear), and every upstream stage is the dedup_clusters
    // funnel already rehearsed above
    rehearse("soft_dedup_weights", ExtendedQueries.softDedupWeights)
  }

  test("degenerate corpus results stay structurally sound (one 50k cluster, star-bounded pairs)") {
    import spark.implicits._
    // the planted block forms exactly one 50k-member exact-dup cluster
    val clusters = ExtendedQueries.dedupClusters(spark, degenerateDir)
      .as[(Long, Long)].collect().toMap
    assert(clusters.getOrElse(50000L, 0L) >= 1L,
      s"expected a 50k-member cluster, got $clusters")
    // and every planted doc is fully repeated-span covered
    val spans = ExtendedQueries.substringSpans(spark, degenerateDir)
      .filter(col("doc_id") >= 10000000L)
    val n = spans.count()
    assert(n == 50000L, s"all 50k planted docs must report repeated spans, got $n")
    val fullyCovered = spans.filter(col("n_rep_tokens") === col("n_windows") + lit(14)).count()
    assert(fullyCovered == 50000L, "planted docs must be wall-to-wall repeated spans")
  }
}
