package graft.tools

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession
import graft.SparkEntry

/** Dumps `explain("formatted")` of the named bench queries to
  * `<outDir>/<query>_<suffix>.txt` — the per-change before/after plan
  * evidence (`plans/r19/…`). DumpPlans regenerates the whole PLANS.md
  * artifact; this writes one file per query so a change's plan diff is
  * reviewable in isolation.
  *
  * Usage: sbt "runMain graft.tools.DumpOne <suffix> <outDir> <q1> [q2 ...]
  *             [sfDir=<dir>]"
  */
object DumpOne {
  def main(args: Array[String]): Unit = {
    val suffix = args(0)
    val outDir = args(1)
    // data dir as a trailing sfDir=<dir> arg (ADVICE r19: the hardcoded
    // fixture made the tool unusable on other checkouts/scales),
    // mirroring StageMeter's optional-arg handling
    val sfDir = args.drop(2).collectFirst {
      case a if a.startsWith("sfDir=") => a.stripPrefix("sfDir=")
    }.getOrElse("/root/testdata/sf0.01")
    val names = args.drop(2).filterNot(_.startsWith("sfDir="))
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Files.createDirectories(Paths.get(outDir))
    names.foreach { name =>
      val df = SparkEntry.benchQueries(name)(spark, sfDir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      val p = Paths.get(outDir, s"${name}_$suffix.txt")
      Files.writeString(p, plan)
      println(s"wrote $p")
    }
    spark.stop()
  }
}
