package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}

/** Runtime-reuse pins for the plans whose scale claims live in the
  * EXECUTED plan, not the static one. `PlanPinSpec` guards static
  * invariant-op histograms, but `bm25_search`'s single-corpus-shuffle
  * property (and `source_overlap`'s) is delivered by ADAPTIVE exchange
  * reuse: the static plan legitimately shows repeated scan+explode+agg
  * legs (PLANS.md), and AQE collapses them into ReusedExchange at
  * runtime. A regression that breaks reusability on one leg — e.g. a
  * non-canonicalizable expression slipping into one copy of the shared
  * aggregation — would keep the static histogram identical while
  * silently re-running the corpus pipeline per leg; only an assertion
  * over the final adaptive plan catches it (VERDICT r10 #2).
  *
  * The walk descends through AdaptiveSparkPlanExec/QueryStageExec into
  * the materialized stages, so the counts are over the plan that
  * actually ran.
  */
class ExecutedPlanSpec extends SparkSpec {

  private def nodes(p: SparkPlan): Seq[SparkPlan] = {
    val kids = p match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case q: QueryStageExec => Seq(q.plan)
      case other => other.children
    }
    p +: kids.flatMap(nodes)
  }

  private def executedCounts(name: String): (Int, Int) = {
    val df = SparkEntry.benchQueries(name)(spark, sfDir)
    df.collect() // materialize: the final adaptive plan exists only after the run
    val ns = nodes(df.queryExecution.executedPlan)
    (ns.count(_.getClass.getSimpleName == "ReusedExchangeExec"),
      ns.count(_.getClass.getSimpleName == "FileSourceScanExec"))
  }

  test("bm25_search: runtime exchange reuse collapses the derived legs onto one corpus pass") {
    val (reused, scans) = executedCounts("bm25_search")
    assert(reused >= 2,
      s"bm25_search must reuse the shared tf exchange (got $reused " +
        "ReusedExchange) — a leg stopped deduplicating and the corpus " +
        "pipeline now runs per derived shape")
    // 4 static corpus legs; reuse leaves ≤ 3 physical scans (docs for
    // tf, docs for the N scalar, and at most one non-collapsed leg)
    assert(scans <= 3,
      s"bm25_search executed $scans file scans — expected ≤ 3 after reuse")
  }

  test("events_funnel: the layered-window shape holds at ONE corpus scan") {
    // the pre-r11 per-stage groupBy+join formulation executed 5 scans;
    // the layered-window rewrite must stay at one
    val (_, scans) = executedCounts("events_funnel")
    assert(scans == 1,
      s"events_funnel executed $scans scans — the funnel must read the " +
        "corpus once")
  }

  test("dsir_weights: the (doc,bucket) exchange deduplicates across all derived legs") {
    // the static plan shows 6 scan+explode+agg legs (db feeds bs, tot,
    // the per-doc join, and the rank-cutoff branch repeats the stack);
    // AQE must collapse every repeat onto ONE materialized db exchange
    val (reused, scans) = executedCounts("dsir_weights")
    assert(reused >= 4,
      s"dsir_weights must reuse the shared (doc,bucket) exchange (got " +
        s"$reused ReusedExchange) — a leg stopped deduplicating and the " +
        "feature explode now runs per derived shape")
    assert(scans <= 2,
      s"dsir_weights executed $scans file scans — expected ≤ 2 after reuse")
  }

  test("bm25_rescore: stage 2 rides stage 1's exchanges — the corpus is not re-exploded per stage") {
    // stage 2 must add exactly ONE corpus pass (the candidate text
    // fetch) on top of stage 1's ≤ 3: the shared qterms plan rides
    // stage 1's tf exchange, and the min-cover is a single fold over
    // the per-doc occurrence array — the first relational formulation
    // self-joined the position set and AQE's broadcast conversion of
    // those tiny joins re-ran the corpus scan per leg (measured 8)
    val (reused, scans) = executedCounts("bm25_rescore")
    assert(reused >= 2,
      s"bm25_rescore must reuse the shared tf exchange (got $reused " +
        "ReusedExchange) — a stage stopped deduplicating")
    assert(scans <= 4,
      s"bm25_rescore executed $scans file scans — expected ≤ 4 " +
        "(stage-1's ≤ 3 + the one candidate text fetch)")
  }

  test("source_overlap: the shared shingle exchange deduplicates at runtime") {
    val (reused, scans) = executedCounts("source_overlap")
    assert(reused >= 2,
      s"source_overlap must reuse its shared exchanges (got $reused)")
    assert(scans <= 1,
      s"source_overlap executed $scans file scans — expected 1 after reuse")
  }

  test("ann_topk_pq_refined: one quantized projection feeds ADC and the exact re-rank") {
    // the r20 materialization point: corpusQ (quantize + repartition)
    // must deduplicate at runtime so the corpus is scanned+quantized
    // once for both stages — the static plan legitimately inlines the
    // subtree per consumer (Exchange count rose 12 → 16), and only the
    // executed plan proves the collapse
    val (reused, scans) = executedCounts("ann_topk_pq_refined")
    assert(reused >= 1,
      s"ann_topk_pq_refined must reuse the shared quantized-projection " +
        s"exchange (got $reused ReusedExchange)")
    assert(scans <= 3,
      s"ann_topk_pq_refined executed $scans file scans — expected ≤ 3 " +
        "(corpusQ + the query slice + at most one uncollapsed leg)")
  }

  test("hybrid_index_search: fusion adds no corpus pass — scans stay index-bound") {
    // the two-probe endpoint reads ONLY: the postings buckets (text
    // probe), the coded lists buckets (vector probe), and the queries
    // slice — fusion itself is a list-bound join over the two top-c
    // outputs and must touch no further files
    val (_, scans) = executedCounts("hybrid_index_search")
    assert(scans <= 4,
      s"hybrid_index_search executed $scans file scans — expected <= 4 " +
        "(postings probe + lists probe + queries slice + at most one " +
        "uncollapsed leg); more means fusion re-read an index or corpus")
  }
}
