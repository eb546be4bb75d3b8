package graft

import java.nio.file.{Files, Paths}
import graft.tools.DumpPlans

/** Staleness guard for the committed plan pins: every headline plan is
  * REGENERATED here and its invariant-op histogram (Exchange count, scan
  * multiplicity, join strategies, row-multiplying ops — see
  * `DumpPlans.invariantOps`) diffed against the parsed PLANS.md. A code
  * change that silently alters a headline plan's scale shape fails
  * `sbt test` until `DumpPlans` is re-run and the diff reviewed — the
  * same role CoverageSpec's analysis guard plays for schemas. (Added
  * after a round-9 review found a hand-written plan pin stale following
  * a rewrite of the query it pinned.)
  *
  * Plans are built over the SAME dir and session shape DumpPlans uses
  * (sf0.01, 4 shuffle partitions): file statistics feed broadcast
  * decisions, so regenerating at a different scale could legitimately
  * differ — that would be a false alarm, not a drift.
  */
class PlanPinSpec extends SparkSpec {

  private val plansPath = Paths.get("PLANS.md")
  private val planDir = "/root/testdata/sf0.01"

  /** name → plan text, parsed from PLANS.md's `## name` + fenced block. */
  private lazy val committed: Map[String, String] = {
    val text = Files.readString(plansPath)
    """(?s)## (\S+)\n\n```\n(.*?)```""".r
      .findAllMatchIn(text).map(m => m.group(1) -> m.group(2)).toMap
  }

  test("PLANS.md sections cover exactly the headline set") {
    assert(committed.keySet === DumpPlans.headline.toSet,
      s"missing from PLANS.md: ${DumpPlans.headline.toSet -- committed.keySet}; " +
        s"stale sections: ${committed.keySet -- DumpPlans.headline.toSet} — " +
        "re-run graft.tools.DumpPlans")
  }

  test("committed plan pins match regenerated plans (invariant ops)") {
    val drifts = DumpPlans.headline.flatMap { name =>
      val df = SparkEntry.benchQueries(name)(spark, planDir)
      val fresh = DumpPlans.planSignature(df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))
      val pinned = DumpPlans.planSignature(committed.getOrElse(name, ""))
      if (fresh != pinned)
        Some(s"$name: pinned=$pinned fresh=$fresh")
      else None
    }
    assert(drifts.isEmpty,
      "plan drift vs PLANS.md — review the change, then re-run " +
        s"graft.tools.DumpPlans to refresh the pins:\n${drifts.mkString("\n")}")
  }
}
