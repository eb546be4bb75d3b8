package graft

import org.apache.spark.sql.SparkSession

/** Driver-run benchmark: one JSON line with per-query seconds over the
  * SPARK_GRAFT_SF_DIR fixtures.
  *
  * Measurement notes:
  *  - the action is a `noop`-format write, which executes the FULL plan
  *    (a bare `count()` lets Catalyst drop sorts and projections — it
  *    would under-measure every query);
  *  - a full warmup pass (uncounted) runs every query once first: each
  *    DISTINCT plan pays its own whole-stage-codegen compile + JIT
  *    (~0.5-4 s in a fresh JVM — measured 4.3 s for a trivial groupBy as
  *    the JVM's first job vs 0.6 s warm), which is classloading cost,
  *    not query cost;
  *  - the reported time is the MIN of two measured passes per query:
  *    62 queries in one JVM see ±10% total noise from GC pauses and
  *    task-scheduling jitter, and min-of-N is the standard steady-state
  *    estimator for that noise shape (it can't hide real cost — every
  *    pass still executes the full plan).
  */
object Bench {

  /** Machine-state watermark: (1/5/15-min load averages, running JVM
    * count) from /proc. Five host-variance incidents in six rounds
    * (r6/r8/r9/r12/r13) were diagnosable only by re-running on a
    * provably idle box — the artifact itself recorded no machine state.
    * Stamped at start AND end of the run: the start stamp is the
    * external-load signal (a 1-min load > 0.5 before this JVM has done
    * anything means something else is, or just was, running — a
    * just-exited verify JVM leaves load ~1.5 and still inflates); the
    * end stamp mostly reflects the bench's own work and is kept for
    * the trail.
    */
  private def envStamp(): (Seq[Double], Int) = {
    val load =
      try java.nio.file.Files.readString(
          java.nio.file.Paths.get("/proc/loadavg"))
        .trim.split("\\s+").take(3).toSeq.map(_.toDouble)
      catch { case _: Throwable => Seq.empty[Double] }
    val jvms =
      try {
        val s = java.nio.file.Files.list(java.nio.file.Paths.get("/proc"))
        try {
          import scala.jdk.CollectionConverters._
          s.iterator().asScala.count { p =>
            p.getFileName.toString.forall(_.isDigit) &&
              (try java.nio.file.Files.readString(p.resolve("comm"))
                 .trim == "java"
               catch { case _: Throwable => false })
          }
        } finally s.close()
      } catch { case _: Throwable => -1 }
    (load, jvms)
  }

  private def envJson(start: (Seq[Double], Int),
                      end: (Seq[Double], Int)): String = {
    val loaded = start._1.headOption.exists(_ > 0.5)
    s"""{"load_start":${start._1.mkString("[", ",", "]")},""" +
      s""""jvms_start":${start._2},""" +
      s""""load_end":${end._1.mkString("[", ",", "]")},""" +
      s""""jvms_end":${end._2},"loaded":$loaded}"""
  }

  def main(args: Array[String]): Unit = {
    val envStart = envStamp()
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      // let AQE coalesce CACHED plans too (guide §2.2): the iterative
      // operators (BPE training, label-propagation dedup) persist their
      // loop state, and with this off (the compatibility default) every
      // cached round is pinned at the static shuffle-partition count —
      // measured 32 scheduler tasks per round over kilobyte partitions
      // at sf0.1. Scale-neutral: AQE decides from actual sizes at any
      // scale factor or core count, so it's a conf default here, not a
      // local tuning (overridable via SPARK_GRAFT_CACHED_AQE).
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
        sys.env.getOrElse("SPARK_GRAFT_CACHED_AQE", "true"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // reliable checkpoint dir — same setup as Verify, so the benched
    // dedup_clusters runs the branch a real cluster would
    spark.sparkContext.setCheckpointDir(
      s"${System.getProperty("java.io.tmpdir")}/graft-checkpoints")

    // optional arg: regex filter over query names (local profiling; the
    // driver always runs argless = the full set)
    val nameFilter = args.headOption.map(_.r).getOrElse(".*".r)
    val queryNames = SparkEntry.benchQueries.keys.filter(nameFilter.matches(_)).toSeq

    def execute(name: String): Unit =
      SparkEntry.benchQueries(name)(spark, sfDir)
        .write.mode("overwrite").format("noop").save()

    // warmup: every plan once, uncounted
    queryNames
      .foreach { q => try execute(q) catch { case _: Throwable => () } }

    // a failed pass records NO timing (min over failures would report a
    // fast crash as a fast query); failed queries are listed separately
    def measuredPass(): Map[String, Either[String, Double]] =
      queryNames.map { name =>
        val t0 = System.nanoTime()
        try {
          execute(name)
          name -> Right((System.nanoTime() - t0) / 1e9)
        } catch {
          case e: Throwable => name -> Left(s"${e.getClass.getSimpleName}: ${e.getMessage}")
        }
      }.toMap

    val (p1, p2) = (measuredPass(), measuredPass())
    val results = queryNames.flatMap { k =>
      (p1(k), p2(k)) match {
        case (Right(a), Right(b)) => Some(k -> math.min(a, b))
        case (Right(a), Left(_))  => Some(k -> a)
        case (Left(_), Right(b))  => Some(k -> b)
        case (Left(_), Left(_))   => None
      }
    }.toMap
    val failed = queryNames
      .filter(k => p1(k).isLeft && p2(k).isLeft).toSeq.sorted
    // a query that succeeded in ONE pass but failed the other is flaky —
    // its single timing is reported, but min-of-two must not silently
    // absorb the failure (a fast crash is not a fast query)
    val flaky = queryNames
      .filter(k => p1(k).isLeft != p2(k).isLeft).toSeq.sorted
      .map { k =>
        val msg = (p1(k).left.toSeq ++ p2(k).left.toSeq).head
        s"\"" + k + "\":\"" + msg.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
      }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    // both raw pass timings per query, alongside the min the headline
    // uses: a tight [2.2,2.3] and a noisy [2.2,3.1] report the same min
    // but mean different things — three host-variance false alarms in
    // four rounds (r6/r8/r9 postmortems) were diagnosable only by
    // rerunning; with the spread in the artifact they self-diagnose
    val passes = queryNames.flatMap { k =>
      val ts = Seq(p1(k), p2(k)).collect { case Right(t) => t }
      if (ts.isEmpty) None
      else Some(s"\"" + k + "\":" + ts.mkString("[", ",", "]"))
    }.mkString("{", ",", "}")
    val errs = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    val env = envJson(envStart, envStamp())
    val json =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"passes":$passes,"errors":$errs,"flaky":${flaky.mkString("{", ",", "}")},"env":$env,"sf":"$sfDir"}"""
    println(json)
    // stdout of a driver-run sbt process gets tail-truncated (~11 of 73
    // per-query timings were lost in round 3) — the file is the durable,
    // machine-readable copy for round-over-round regression tracking
    java.nio.file.Files.writeString(java.nio.file.Paths.get("bench_out.json"), json + "\n")
    spark.stop()
  }
}
