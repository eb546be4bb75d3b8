package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import graft.SparkEntry

/** Executes one named query and prints the FINAL adaptive physical plan
  * (what AQE actually ran — `DumpPlans` shows only the static plan) plus
  * wall time. The diagnostic loop for "why didn't AQE demote this
  * exchange": run, read the executedPlan, fix, re-run.
  *
  * Usage: sbt "runMain graft.tools.ExplainRun <query> [sfDir] [cpus]"
  */
object ExplainRun {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val cpus = args.lift(2).getOrElse("32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.sparkContext.setCheckpointDir(
      s"${System.getProperty("java.io.tmpdir")}/graft-checkpoints")

    def once(): Double = {
      val t0 = System.nanoTime()
      SparkEntry.benchQueries(name)(spark, sfDir)
        .write.mode("overwrite").format("noop").save()
      (System.nanoTime() - t0) / 1e9
    }
    val cold = once() // codegen+JIT warmup
    val warm = once()
    // the noop write runs a CLONED QueryExecution, so read the final
    // adaptive plan from a frame executed via its OWN QueryExecution
    // (collect) — otherwise this prints the initial plan, pre-AQE
    val df = SparkEntry.benchQueries(name)(spark, sfDir)
    df.collect()
    val executed = df.queryExecution.executedPlan
    val finalPlan = executed match {
      case a: AdaptiveSparkPlanExec => a.executedPlan.toString
      case p                        => p.toString
    }
    println(s"=== $name: cold ${f"$cold%.2f"}s warm ${f"$warm%.2f"}s ===")
    println(finalPlan)
    spark.stop()
  }
}
