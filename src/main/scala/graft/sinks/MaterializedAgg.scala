package graft.sinks

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incrementally-maintained AGGREGATE VIEWS over a manifest table's
  * append log — the Delta/Databricks materialized-view shape on this
  * engine's own storage: the view is ITSELF a manifest table (keyed by
  * the group key, so it inherits snapshot isolation, time travel, the
  * DSv2 exchange-free reads, zone maps — a dashboard query against the
  * view is a keyed point read, not a 100 TB aggregation), and `refresh`
  * folds in ONLY the source versions committed since the last refresh:
  *
  *  1. the source manifest diff names the delta directories — O(new
  *     data), the same version arithmetic as the streaming source;
  *  2. the delta partial-aggregates by group (map-side combine, one
  *     shuffle of group-cardinality rows);
  *  3. current states for EXACTLY the touched groups come back through
  *     the probe-side bucket read (`readBuckets` — the incremental-dedup
  *     SPJ shape: view buckets the probe keys miss are never opened);
  *  4. merged states land via [[ManifestTable.upsertOnce]] — the upsert
  *     and the consumed-source-version watermark are ONE atomic commit,
  *     so a crashed refresh replays without double-counting (the
  *     exactly-once discipline streaming appends already had).
  *
  * Supported aggregates are the MERGEABLE ones (count, sum, min, max —
  * avg derives as sum/count at read time); that is what makes step 4 a
  * state merge instead of a recompute. A NON-APPEND source change
  * (upsert/delete/compact/equality-delete tombstones) cannot be folded
  * incrementally — refresh detects it from the manifest diff and
  * demands [[rebuild]] (full recompute, atomic with its watermark),
  * exactly the contract Delta's incremental MVs enforce.
  *
  * Group keys: the key column is `to_json(struct(groupCols*))` with
  * null fields KEPT (`ignoreNullFields=false`), so NULL group values
  * form their own group deterministically, engine-independent of
  * column order (the struct fixes it) — and the view key is one string
  * column, which the manifest bucket hash and bloom sidecars already
  * serve.
  */
object MaterializedAgg {

  private val AppId = "graft-mv-refresh"
  private val DefFile = "_view.json"
  private[graft] val GroupKeyCol = "gkey"

  /** One mergeable aggregate: `fn` ∈ count | sum | min | max; `col` is
    * ignored for count. Output column is `<fn>_<col>` (`count_all`).
    */
  final case class AggSpec(fn: String, col: String = "*") {
    require(Set("count", "sum", "min", "max")(fn), s"unsupported agg: $fn")
    def out: String = if (fn == "count") "count_all" else s"${fn}_$col"
  }

  private final case class ViewDef(sourcePath: String, groupCols: Seq[String],
                                   aggs: Seq[AggSpec], nBuckets: Int)

  private def renderDef(d: ViewDef): String = {
    // agg columns are embedded in the same quoted-JSON def as the group
    // columns — an unchecked '"' there would write a def parseDef then
    // silently mis-parses on every later refresh (ADVICE r10)
    (d.groupCols ++ d.aggs.map(_.col) :+ d.sourcePath)
      .foreach(s => require(!s.contains('"'), s"not view-def-safe: $s"))
    val aggs = d.aggs.map(a => s"""{"fn":"${a.fn}","col":"${a.col}"}""")
      .mkString(",")
    s"""{"sourcePath":"${d.sourcePath}","nBuckets":${d.nBuckets},""" +
      s""""groupCols":[${d.groupCols.map(c => s""""$c"""").mkString(",")}],""" +
      s""""aggs":[$aggs]}"""
  }

  private def parseDef(s: String): ViewDef = {
    def strField(k: String) =
      s"""\"$k\":\"([^\"]*)\"""".r.findFirstMatchIn(s).get.group(1)
    val nB = """"nBuckets":(\d+)""".r.findFirstMatchIn(s).get.group(1).toInt
    val gBody = s.substring(s.indexOf('[', s.indexOf("\"groupCols\"")) + 1,
      s.indexOf(']', s.indexOf("\"groupCols\"")))
    val groupCols = "\"([^\"]+)\"".r.findAllMatchIn(gBody).map(_.group(1)).toSeq
    val aBody = s.substring(s.indexOf("\"aggs\""))
    val aggs = """\{"fn":"([a-z]+)","col":"([^"]*)"\}""".r
      .findAllMatchIn(aBody).map(m => AggSpec(m.group(1), m.group(2))).toSeq
    ViewDef(strField("sourcePath"), groupCols, aggs, nB)
  }

  private def fs(spark: SparkSession, path: String) =
    new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def readDef(spark: SparkSession, viewPath: String): ViewDef = {
    val f = fs(spark, viewPath)
    val in = f.open(new Path(viewPath, DefFile))
    try parseDef(new String(
      org.apache.commons.io.IOUtils.toByteArray(in), "UTF-8"))
    finally in.close()
  }

  private def gkeyExpr(groupCols: Seq[String]): Column =
    to_json(struct(groupCols.map(col): _*),
      Map("ignoreNullFields" -> "false").asJava)
  private implicit class MapOps[A, B](m: Map[A, B]) {
    def asJava: java.util.Map[A, B] = {
      val j = new java.util.HashMap[A, B]()
      m.foreach { case (k, v) => j.put(k, v) }
      j
    }
  }

  /** Partial (mergeable) aggregate of `rows` by group, keyed by gkey. */
  private def partialAgg(rows: DataFrame, d: ViewDef): DataFrame = {
    val aggCols = d.aggs.map {
      case a @ AggSpec("count", _) => count(lit(1)).as(a.out)
      case a @ AggSpec("sum", c)   => sum(col(c)).as(a.out)
      case a @ AggSpec("min", c)   => min(col(c)).as(a.out)
      case a @ AggSpec("max", c)   => max(col(c)).as(a.out)
    }
    rows.withColumn(GroupKeyCol, gkeyExpr(d.groupCols))
      .groupBy((GroupKeyCol +: d.groupCols).map(col): _*)
      .agg(aggCols.head, aggCols.tail: _*)
  }

  /** Merge two partial states for one aggregate (either side NULL when
    * the group is new to that side). count/sum: null-aware addition;
    * min/max: `least`/`greatest`, which skip nulls.
    */
  private def mergeExpr(a: AggSpec, cur: Column, nw: Column): Column = a.fn match {
    case "count" | "sum" =>
      when(cur.isNull, nw).when(nw.isNull, cur).otherwise(cur + nw)
    case "min" => least(cur, nw)
    case "max" => greatest(cur, nw)
  }

  /** Define the view and run the initial full compute, atomic with the
    * source version it reflects. The definition file is create-only.
    */
  def create(spark: SparkSession, viewPath: String, sourcePath: String,
             groupCols: Seq[String], aggs: Seq[AggSpec],
             nBuckets: Int = 16): Unit = {
    require(groupCols.nonEmpty && aggs.nonEmpty, "need group cols and aggs")
    val d = ViewDef(sourcePath, groupCols, aggs, nBuckets)
    val rendered = renderDef(d) // validate BEFORE any file exists
    val f = fs(spark, viewPath)
    f.mkdirs(new Path(viewPath))
    val defPath = new Path(viewPath, DefFile)
    val out = f.create(defPath, false) // create-only: a view is defined once
    try out.write(rendered.getBytes("UTF-8")) finally out.close()
    fullCompute(spark, viewPath, d)
  }

  /** Full recompute at the source head — CREATE's initial load, and the
    * escape hatch refresh demands after a non-append source change.
    */
  def rebuild(spark: SparkSession, viewPath: String): Unit =
    fullCompute(spark, viewPath, readDef(spark, viewPath))

  private def fullCompute(spark: SparkSession, viewPath: String, d: ViewDef): Unit = {
    val srcHead = ManifestTable.headVersion(spark, d.sourcePath).getOrElse(
      throw new IllegalArgumentException(s"no committed source at ${d.sourcePath}"))
    val full = partialAgg(
      ManifestTable.readVersion(spark, d.sourcePath, srcHead), d)
    ManifestTable.writeWithTxn(full, viewPath, GroupKeyCol, d.nBuckets,
      AppId, srcHead.toLong)
  }

  /** Fold in the source versions committed since the last refresh.
    * Returns true when new data landed; false when already current.
    * O(delta) IO end-to-end; crash-safe replay via the view's txn
    * watermark ([[ManifestTable.upsertOnce]]).
    */
  def refresh(spark: SparkSession, viewPath: String): Boolean = {
    val d = readDef(spark, viewPath)
    val last = ManifestTable.txnVersion(spark, viewPath, AppId).getOrElse(
      throw new IllegalStateException(
        s"view at $viewPath has no refresh watermark — run create/rebuild")).toInt
    val srcHead = ManifestTable.headVersion(spark, d.sourcePath).getOrElse(0)
    if (srcHead <= last) return false
    val mFrom = ManifestTable.readManifest(spark, d.sourcePath, last)
    val mTo = ManifestTable.readManifest(spark, d.sourcePath, srcHead)
    val (before, after) = (mFrom.buckets.values.flatten.toSet,
      mTo.buckets.values.flatten.toSet)
    val removed = before -- after
    if (removed.nonEmpty || mFrom.tombstones != mTo.tombstones)
      throw new IllegalStateException(
        s"source at ${d.sourcePath} changed non-append between versions " +
          s"$last and $srcHead (rewrite or equality delete): incremental " +
          "refresh cannot fold row removal — run MaterializedAgg.rebuild")
    val newDirs = (after -- before).toSeq.sorted
    if (newDirs.isEmpty) return false // watermark-only versions (txn updates)
    val delta = spark.read.parquet(newDirs.map(r => s"${d.sourcePath}/$r"): _*)
    val partial = partialAgg(delta, d)
    // current states for exactly the touched groups: probe-side bucket
    // read — untouched view buckets are never opened
    val current = ManifestTable.readBuckets(spark, viewPath,
        partial.select(GroupKeyCol))
      .join(partial.select(GroupKeyCol), Seq(GroupKeyCol), "left_semi")
    val mergedAggs = d.aggs.map(a =>
      mergeExpr(a, col(s"c.${a.out}"), col(s"n.${a.out}")).as(a.out))
    val groupVals = d.groupCols.map(c => col(s"n.$c").as(c))
    val merged = partial.alias("n")
      .join(current.alias("c"), Seq(GroupKeyCol), "left_outer")
      .select((col(GroupKeyCol) +: groupVals) ++ mergedAggs: _*)
    ManifestTable.upsertOnce(spark, viewPath, merged, GroupKeyCol,
      AppId, srcHead.toLong)
  }

  /** CONTINUOUS refresh — the streaming materialized view: the source
    * table's manifest stream is the trigger signal (its offsets are
    * source versions, so a trigger fires exactly when new commits
    * exist), and each micro-batch folds the delta via [[refresh]].
    * The batch's own rows are deliberately untouched — refresh reads
    * the delta from the manifest with its own exactly-once watermark,
    * so a replayed trigger after a restart is a no-op regardless of the
    * stream's checkpoint state (two independent idempotence layers).
    * A non-append source commit fails the stream with the same rebuild
    * contract as batch refresh. `Trigger.AvailableNow` drains pending
    * versions and stops — the scheduled-refresh shape.
    */
  def startContinuous(spark: SparkSession, viewPath: String,
                      checkpoint: String,
                      trigger: org.apache.spark.sql.streaming.Trigger =
                        org.apache.spark.sql.streaming.Trigger.ProcessingTime("10 seconds"))
      : org.apache.spark.sql.streaming.StreamingQuery = {
    val d = readDef(spark, viewPath)
    graft.sources.ManifestIndexSource.ensureRegistered(spark)
    spark.readStream
      .option("startingVersion", "latest")
      .table(s"${graft.sources.ManifestIndexSource.CatalogName}.`${d.sourcePath}`")
      .writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch((_: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) => {
        refresh(spark, viewPath); ()
      })
      .trigger(trigger)
      .start()
  }

  /** The view's current contents: group columns + aggregate columns. */
  def read(spark: SparkSession, viewPath: String): DataFrame = {
    val d = readDef(spark, viewPath)
    ManifestTable.read(spark, viewPath)
      .select((d.groupCols ++ d.aggs.map(_.out)).map(col): _*)
  }
}
