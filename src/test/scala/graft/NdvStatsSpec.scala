package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.{Join, LogicalPlan}
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation
import org.apache.spark.sql.functions._

import graft.sinks.ManifestTable
import graft.sources.ManifestIndexSource

/** Per-dir HLL NDV sketches in the manifest → merged per scan → DSv2
  * column statistics → catalyst ColumnStat → CBO. The chain is pinned
  * end to end: sketch honesty under cross-dir duplicate keys (union of
  * registers, not a sum of estimates), visibility in the optimized
  * plan's attribute stats, and the payoff — a 3-table join whose ORDER
  * flips when cardinalities are available (VERDICT r10 #3).
  */
class NdvStatsSpec extends SparkSpec {
  import spark.implicits._

  private def tmp() = s"${Files.createTempDirectory("graft-ndv")}/tbl"

  test("per-dir sketches union honestly: duplicated appends do not double-count") {
    val path = tmp()
    ManifestTable.write(
      (0 until 1000).map(i => (i.toLong, s"n-$i")).toDF("id", "name"),
      path, "id", 4)
    // append the SAME keys (append permits duplicates): per-dir NDVs
    // would SUM to ~2000; the register union must stay ~1000
    ManifestTable.append(spark, path,
      (0 until 1000).map(i => (i.toLong, s"dup-$i")).toDF("id", "name"), "id")
    val m = ManifestTable.currentManifest(spark, path)
    val dirs = m.buckets.values.flatten.toSeq
    assert(dirs.nonEmpty && dirs.forall(d =>
      m.dirNdv.get(d).exists(_.contains("id"))),
      s"every dir needs an id sketch: ${m.dirNdv.keySet} vs $dirs")

    ManifestIndexSource.ensureRegistered(spark)
    val df = ManifestIndexSource.read(spark, path)
    val stats = df.queryExecution.optimizedPlan.stats
    val idStat = stats.attributeStats.toSeq
      .find(_._1.name == "id").map(_._2)
    assert(idStat.exists(_.distinctCount.isDefined),
      s"id distinctCount must reach catalyst stats, got $stats")
    val ndv = idStat.get.distinctCount.get.toLong
    assert(ndv >= 850 && ndv <= 1150,
      s"true NDV 1000, 6.5%-RSE sketch reported $ndv")
  }

  test("the conf dial and pre-NDV degradation both fall back to size-only stats") {
    val path = tmp()
    ManifestTable.write(
      (0 until 100).map(i => (i.toLong, s"n-$i")).toDF("id", "name"),
      path, "id", 2)
    ManifestIndexSource.ensureRegistered(spark)
    spark.conf.set("spark.graft.ndvStats.enabled", "false")
    try {
      val stats = ManifestIndexSource.read(spark, path)
        .queryExecution.optimizedPlan.stats
      assert(stats.attributeStats.isEmpty,
        "disabled dial must drop column stats (size stats remain)")
    } finally spark.conf.unset("spark.graft.ndvStats.enabled")

    // a manifest stripped of sketches (pre-NDV table) degrades the same
    // way instead of erroring
    val m = ManifestTable.currentManifest(spark, path)
    ManifestTable.publish(spark, path, m.copy(version = m.version + 1,
      dirNdv = Map.empty))
    val stats2 = ManifestIndexSource.read(spark, path)
      .queryExecution.optimizedPlan.stats
    assert(stats2.attributeStats.isEmpty)
  }

  test("write dial off: commits skip the sketch job; a rewrite backfills") {
    val path = tmp()
    spark.conf.set("spark.graft.ndvStats.write.enabled", "false")
    try {
      ManifestTable.write(
        (0 until 200).map(i => (i.toLong, s"n-$i")).toDF("id", "name"),
        path, "id", 2)
      (0 until 3).foreach(i => ManifestTable.append(spark, path,
        Seq((500L + i, s"a-$i")).toDF("id", "name"), "id"))
      assert(ManifestTable.currentManifest(spark, path).dirNdv.isEmpty,
        "dial off must skip sketching")
    } finally spark.conf.unset("spark.graft.ndvStats.write.enabled")
    // MAINTAIN's policy notices the gap and ANALYZE backfills WITHOUT
    // a rewrite: one column-pruned read + a metadata-only commit
    assert(ManifestTable.maintenanceAdvice(spark, path)
      .exists(a => a.action == "analyze" && a.reason.contains("NDV")),
      "unsketched dirs must be advised for ANALYZE")
    val pre = ManifestTable.currentManifest(spark, path)
    spark.sql(s"GRAFT ANALYZE '$path'")
    val m = ManifestTable.currentManifest(spark, path)
    assert(m.buckets == pre.buckets, "ANALYZE must not move data pointers")
    assert(m.buckets.values.flatten.forall(d =>
      m.dirNdv.get(d).exists(_.contains("id"))),
      s"ANALYZE must backfill sketches: ${m.dirNdv.keySet}")
    // idempotent: nothing missing → no commit
    spark.sql(s"GRAFT ANALYZE '$path'")
    assert(ManifestTable.currentManifest(spark, path).version == m.version)
    // a rewrite with the dial back on also sketches its new dirs (the
    // appends above fragmented the buckets, so bin-pack has work)
    ManifestTable.optimize(spark, path)
    val m2 = ManifestTable.currentManifest(spark, path)
    assert(m2.buckets.values.flatten.forall(d =>
      m2.dirNdv.get(d).exists(_.contains("id"))))
  }

  /** The payoff pin, engineered so the NDV SIGNAL ITSELF — not leaf
    * row counts or byte sizes, which the scan already reported before
    * this round — is what decides: `lowCard` and `highCard` are
    * row-count twins (5000 rows each) differing in the cardinality of
    * their join column (10 vs 5000 distinct). Joined as (big ⋈
    * highCard) ⋈ lowCard on `big.v`, join estimation with NDV prices
    * big⋈highCard at rows²/5000 = 10k intermediate rows and
    * big⋈lowCard at rows²/max(100,10) = 500k, so the reorder keeps the
    * SELECTIVE join innermost. With the dial off there are no
    * cardinalities: every candidate's rowCount is unknown, cost
    * comparison degenerates, and the DP's stats-blind enumeration
    * lands on the other order (observed deterministic on this Spark
    * build — the point is that it is NOT cardinality-driven). The two
    * dials produce different join orders, and only the NDV one is the
    * order a 100 TB star join needs.
    */
  test("CBO join reorder flips a 3-table join when NDV stats are on") {
    val big = tmp(); val lowCard = tmp(); val highCard = tmp()
    // join columns are bloom columns → they carry NDV sketches
    ManifestTable.write(
      (0 until 10000).map(i => (i.toLong, (i % 100).toLong)).toDF("id", "v"),
      big, "id", 4, bloomCols = Seq("v"))
    // identical shape and payload except the join column's cardinality:
    // w has 10 distinct values (dictionary-compresses SMALLER on disk),
    // u has 5000 — so size-only costing can only prefer lowCard, and a
    // highCard-first plan proves the cardinality signal decided
    ManifestTable.write(
      (0 until 5000).map(i => (i.toLong, (i % 10).toLong, 0L))
        .toDF("id", "w", "pad"), lowCard, "id", 4, bloomCols = Seq("w"))
    ManifestTable.write(
      (0 until 5000).map(i => (i.toLong, (i % 5000).toLong, 0L))
        .toDF("id", "u", "pad"), highCard, "id", 4, bloomCols = Seq("u"))
    ManifestIndexSource.ensureRegistered(spark)

    def joined(): LogicalPlan = {
      val a = ManifestIndexSource.read(spark, big).select("id", "v")
      val b = ManifestIndexSource.read(spark, lowCard).select("id", "w")
      val c = ManifestIndexSource.read(spark, highCard).select("id", "u")
      a.join(c.drop("id"), col("v") === col("u"))
        .join(b.drop("id"), col("v") === col("w"))
        .select("id", "v", "w", "u")
        .queryExecution.optimizedPlan
    }

    /** Tables under the DEEPEST join, identified by scan path. */
    def innermostTables(p: LogicalPlan): Set[String] = {
      val joins = p.collect { case j: Join => j }
      val inner = joins.last // collect is pre-order: last = deepest
      inner.collect {
        case s: DataSourceV2ScanRelation => s.relation.table.name()
      }.toSet
    }

    val confs = Seq("spark.sql.cbo.enabled" -> "true",
      "spark.sql.cbo.joinReorder.enabled" -> "true",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val withNdv = innermostTables(joined())
      assert(withNdv == Set(big, highCard),
        s"with NDV stats the selective (high-NDV) join must stay " +
          s"innermost, got $withNdv (big=$big high=$highCard low=$lowCard)")

      spark.conf.set("spark.graft.ndvStats.enabled", "false")
      try {
        val without = innermostTables(joined())
        assert(without != withNdv,
          s"without NDV stats the order must no longer be " +
            s"cardinality-driven, got $without both ways")
        assert(without == Set(big, lowCard),
          s"stats-blind enumeration pins the other order on this " +
            s"build, got $without")
      } finally spark.conf.unset("spark.graft.ndvStats.enabled")
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }
}
