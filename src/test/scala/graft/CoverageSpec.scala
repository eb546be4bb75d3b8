package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the prose in COVERAGE.md to the code: the "ALL N queries" count
  * must equal `SparkEntry.queries.size` (it drifted 81 vs 82 in round 5
  * when two queries landed after the count was written). Every query must
  * also carry an oracle — the suite has had zero rows-only entries since
  * round 4 and this keeps it that way mechanically.
  */
class CoverageSpec extends AnyFunSuite {

  /** Round-8 regression guard: the driver regenerated events.parquet with a
    * different physical timestamp encoding and ten oracled queries silently
    * dropped out of the gate set (they failed at ANALYSIS, so no spec that
    * didn't touch the events table noticed). Analyzing every declared bench
    * query against the real fixtures catches any fixture/schema drift at
    * `sbt test` time — no execution needed, analysis alone resolves the
    * loaded parquet schema against every expression in the plan.
    */
  test("every benchQueries entry analyzes against the sf0.001 fixtures") {
    val spark = SparkSpec.session
    val failures = SparkEntry.benchQueries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        try { fn(spark, "/root/testdata/sf0.001").queryExecution.analyzed; None }
        catch {
          case e: Throwable =>
            Some(s"$name: ${e.getClass.getSimpleName}: ${Option(e.getMessage).getOrElse("").linesIterator.take(2).mkString(" | ")}")
        }
    }
    assert(failures.isEmpty,
      s"${failures.size} queries fail analysis on the current fixtures:\n  " +
        failures.mkString("\n  "))
  }

  test("COVERAGE.md query count matches SparkEntry.queries") {
    val text = java.nio.file.Files.readString(java.nio.file.Paths.get("COVERAGE.md"))
    val m = "Oracle-registered: ALL (\\d+) queries".r.findFirstMatchIn(text)
      .getOrElse(fail("COVERAGE.md lost its 'Oracle-registered: ALL N queries' line"))
    assert(m.group(1).toInt == SparkEntry.queries.size,
      s"COVERAGE.md says ${m.group(1)} but SparkEntry.queries has " +
        s"${SparkEntry.queries.size} — update COVERAGE.md")
  }

  test("every query has an oracle and every oracle has a query") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert((q -- o).isEmpty, s"queries without oracle SQL: ${(q -- o).toSeq.sorted}")
    assert((o -- q).isEmpty, s"oracle SQL without a query: ${(o -- q).toSeq.sorted}")
  }
}
