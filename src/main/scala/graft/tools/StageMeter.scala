package graft.tools

import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession
import graft.SparkEntry

/** Local profiling only (not part of the driver contract): runs named
  * bench queries and reports, per query, the warm wall time plus the
  * scheduler-side shape of the run — jobs, stages, tasks, summed task
  * time, shuffle bytes — so "is this query compute-bound or
  * stage-count-bound?" is answered with numbers instead of plan reading.
  *
  * Usage: sbt "runMain graft.tools.StageMeter <regex> [sfDir] [cpus]"
  */
object StageMeter {
  def main(args: Array[String]): Unit = {
    val nameFilter = args.headOption.map(_.r).getOrElse(".*".r)
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

    val detail = sys.env.contains("STAGEMETER_DETAIL")
    val jobs = new AtomicInteger
    val stages = new AtomicInteger
    val tasks = new AtomicInteger
    val taskNanos = new AtomicLong
    val shufWrite = new AtomicLong
    val shufReadW = new AtomicLong
    val stageInfo =
      new java.util.concurrent.ConcurrentHashMap[Int, (String, Int)]()
    val stageMs = new java.util.concurrent.ConcurrentHashMap[Int, AtomicLong]()
    val listener = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        stages.incrementAndGet()
        if (detail)
          stageInfo.put(s.stageInfo.stageId,
            (s.stageInfo.name.takeWhile(_ != '\n').take(90),
              s.stageInfo.numTasks))
      }
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        tasks.incrementAndGet()
        val m = t.taskMetrics
        if (m != null) {
          taskNanos.addAndGet(m.executorRunTime * 1000000L)
          shufWrite.addAndGet(m.shuffleWriteMetrics.bytesWritten)
          shufReadW.addAndGet(m.shuffleReadMetrics.totalBytesRead)
          if (detail)
            stageMs.computeIfAbsent(t.stageId, _ => new AtomicLong)
              .addAndGet(m.executorRunTime)
        }
      }
    }

    val names = SparkEntry.benchQueries.keys
      .filter(nameFilter.matches(_)).toSeq.sorted
    def execute(name: String): Unit =
      SparkEntry.benchQueries(name)(spark, sfDir)
        .write.mode("overwrite").format("noop").save()

    // warm pass: NonFatal only (swallowing OOM/interrupts silently
    // profiled a failed query as cold — ADVICE r19), and name the
    // failure so a cold profile is explained
    names.foreach { q =>
      try execute(q)
      catch { case scala.util.control.NonFatal(e) =>
        println(s"$q warmup failed: $e") }
    }

    println(f"${"query"}%-34s ${"sec"}%7s ${"jobs"}%5s ${"stage"}%5s ${"tasks"}%6s ${"taskSec"}%8s ${"shufMB"}%7s")
    names.foreach { name =>
      jobs.set(0); stages.set(0); tasks.set(0)
      taskNanos.set(0); shufWrite.set(0); shufReadW.set(0)
      spark.sparkContext.addSparkListener(listener)
      val t0 = System.nanoTime()
      try execute(name) catch { case e: Throwable => println(s"$name FAILED: $e") }
      val sec = (System.nanoTime() - t0) / 1e9
      // listener events are queued; give the bus a moment to drain
      // before reading the counters (local profiling tool — a fixed
      // settle beats reaching into the private listenerBus API)
      Thread.sleep(300)
      spark.sparkContext.removeSparkListener(listener)
      println(f"$name%-34s $sec%7.2f ${jobs.get}%5d ${stages.get}%5d ${tasks.get}%6d ${taskNanos.get / 1e9}%8.2f ${shufWrite.get / 1e6}%7.1f")
      if (detail) {
        import scala.jdk.CollectionConverters._
        stageMs.asScala.toSeq.sortBy(-_._2.get).take(8).foreach {
          case (sid, ms) =>
            val (nm, nt) = stageInfo.getOrDefault(sid, ("?", -1))
            println(f"    stage $sid%4d ${ms.get / 1000.0}%7.2fs tasks=$nt%-4d $nm")
        }
        stageMs.clear(); stageInfo.clear()
      }
    }
    spark.stop()
  }
}
