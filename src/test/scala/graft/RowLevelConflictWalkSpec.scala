package graft

import java.nio.file.Files

import graft.sinks.ManifestTable
import graft.sources.ManifestIndexSource

/** Seeded random-schedule concurrency walk for the DSv2 row-level
  * path: every case races one SQL statement (UPDATE / MERGE INTO /
  * non-key DELETE) against one concurrent API writer (upsert /
  * deleteKeys / API merge) landed in the stage→commit window via
  * [[ManifestTable.deltaPreCommitHook]], and asserts the ONLY two
  * legal outcomes of `commitStagedDelta`'s conflict rule:
  *
  *  - COMMIT: the concurrent writer touched none of the statement's
  *    written buckets — the two write sets commute, and the final
  *    state must equal the concurrent effect plus the statement's
  *    snapshot-decided delta (≡ either serial order);
  *  - REFUSE (`ConcurrentModificationException`): a touched bucket
  *    moved under the statement's read snapshot — the statement must
  *    leave NO trace (state ≡ concurrent effect alone), and a user
  *    re-run (re-scan, re-decide) against the moved state must then
  *    land exactly its re-decided effect.
  *
  * Anything else — a half-applied statement, a silently swallowed
  * concurrent commit, a duplicate key from a rebased insert (write
  * skew) — diverges from the model map and fails the walk. Key
  * uniqueness is asserted on every read. The directed single-schedule
  * tests live in RowLevelSqlSpec; this walk covers the schedule space
  * (300 seeded cases, both outcomes exercised, statement kinds ×
  * concurrent kinds mixed, with periodic OPTIMIZE/VACUUM interleaved
  * so the walk also runs atop folded tombstones and trimmed history).
  */
class RowLevelConflictWalkSpec extends SparkSpec {
  import spark.implicits._

  private type State = Map[Long, (String, Double)]

  private def chain(t: Throwable): Seq[Throwable] =
    if (t == null) Seq.empty else t +: chain(t.getCause)

  /** The statement's committed delta (decided against `snapshot`)
    * applied on top of `base`: deletions and changed/inserted keys from
    * snapshot→decided, everything else keeping base's values. On a
    * COMMIT outcome the write sets are bucket-disjoint, so this equals
    * both serial orders.
    */
  private def applyDelta(base: State, snapshot: State, decided: State): State = {
    val deleted = snapshot.keySet -- decided.keySet
    val changed = decided.filter { case (k, v) => !snapshot.get(k).contains(v) }
    (base -- deleted) ++ changed
  }

  test("conflict walk: 300 interleaved schedules all serialize or refuse (seeded)") {
    val rnd = new scala.util.Random(1405)
    ManifestIndexSource.ensureRegistered(spark)
    val cat = ManifestIndexSource.CatalogName
    val path = s"${Files.createTempDirectory("graft-conflict-walk")}/tbl"
    val K = 48L // small key space → frequent genuine key/bucket collisions
    val nBuckets = 4

    var model: State = (0L until 24L).map(i => i -> (s"n$i", i * 1.0)).toMap
    ManifestTable.write(
      model.toSeq.map { case (k, (n, s)) => (k, n, s) }.toDF("id", "name", "score"),
      path, "id", nBuckets)

    def readState(at: String): State = {
      val rows = ManifestTable.read(spark, path)
        .select("id", "name", "score").as[(Long, String, Double)].collect()
      assert(rows.map(_._1).distinct.length == rows.length,
        s"key uniqueness violated $at: ${rows.groupBy(_._1).filter(_._2.length > 1).keys.take(3)}")
      rows.map(t => t._1 -> (t._2, t._3)).toMap
    }

    var refused = 0
    var committedInterleaved = 0
    (1 to 300).foreach { step =>
      // ---- the SQL statement + its semantics as a state function ----
      val (sqlText, effect): (String, State => State) = rnd.nextInt(10) match {
        case 0 | 1 | 2 | 3 => // single-key UPDATE (1 bucket touched)
          val k = rnd.nextLong(K)
          (s"UPDATE $cat.`$path` SET name = 'u$step', score = $step.0 WHERE id = $k",
            st => if (st.contains(k)) st + (k -> (s"u$step", step.toDouble)) else st)
        case 4 | 5 | 6 => // MERGE INTO, 1-3 keys (update-matched/insert-unmatched)
          val ks = Seq.fill(1 + rnd.nextInt(3))(rnd.nextLong(K)).distinct
          ks.map(k => (k, s"m$step-$k", step * 2.0)).toDF("id", "name", "score")
            .createOrReplaceTempView("conflict_walk_src")
          (s"""MERGE INTO $cat.`$path` t
              |USING (SELECT id, name, score, $cat.bucket($nBuckets, id) AS bucket
              |       FROM conflict_walk_src) s
              |ON t.id = s.id
              |WHEN MATCHED THEN UPDATE SET *
              |WHEN NOT MATCHED THEN INSERT *""".stripMargin,
            st => ks.foldLeft(st)((acc, k) => acc + (k -> (s"m$step-$k", step * 2.0))))
        case 7 | 8 => // narrow non-key DELETE (row-level, not metadata path)
          val c = (rnd.nextInt(920) - 310).toDouble
          (s"DELETE FROM $cat.`$path` WHERE score >= $c AND score < ${c + 25}",
            st => st.filterNot { case (_, (_, s)) => s >= c && s < c + 25 })
        case _ => // broad UPDATE — touches many buckets, conflict-prone
          val c = (rnd.nextInt(920) - 310).toDouble
          (s"UPDATE $cat.`$path` SET name = 'w$step' WHERE score < $c",
            st => st.map { case (k, (n, s)) =>
              if (s < c) k -> (s"w$step", s) else k -> (n, s) })
      }

      // ---- the concurrent API writer (fires in the commit window) ----
      var fired = false
      val concKind = rnd.nextInt(4)
      val (hookBody, concEffect): (() => Unit, State => State) = concKind match {
        case 0 => (() => (), identity[State] _) // no interleave
        case 1 =>
          val ks = Seq.fill(1 + rnd.nextInt(2))(rnd.nextLong(K)).distinct
          val rows = ks.map(k => (k, s"c$step-$k", -step.toDouble))
          val df = rows.toDF("id", "name", "score")
          (() => ManifestTable.upsert(spark, path, df, "id"),
            st => rows.foldLeft(st)((acc, r) => acc + (r._1 -> (r._2, r._3))))
        case 2 =>
          val ks = Seq.fill(1 + rnd.nextInt(3))(rnd.nextLong(K)).distinct
          val df = ks.toDF("id")
          (() => ManifestTable.deleteKeys(spark, path, df, "id"),
            st => st -- ks)
        case _ =>
          val ks = Seq.fill(1 + rnd.nextInt(2))(rnd.nextLong(K)).distinct
          val rows = ks.map(k => (k, s"g$step-$k", -step * 2.0))
          val df = rows.toDF("id", "name", "score")
          (() => ManifestTable.merge(spark, path, df, "id"),
            st => rows.foldLeft(st)((acc, r) => acc + (r._1 -> (r._2, r._3))))
      }

      ManifestTable.deltaPreCommitHook = () => if (!fired) { fired = true; hookBody() }
      val outcome =
        try { spark.sql(sqlText).collect(); None }
        catch {
          case e: Exception if chain(e).exists(
            _.isInstanceOf[java.util.ConcurrentModificationException]) => Some(e)
        }
        finally ManifestTable.deltaPreCommitHook = () => ()

      val afterConc = if (fired) concEffect(model) else model
      outcome match {
        case None => // COMMIT: concurrent effect + snapshot-decided delta
          if (fired && concKind != 0) committedInterleaved += 1
          model = applyDelta(afterConc, model, effect(model))
          val got = readState(s"step $step (committed)")
          assert(got == model,
            s"step $step diverged after commit: " +
              s"missing=${(model.keySet -- got.keySet).take(3)} " +
              s"extra=${(got.keySet -- model.keySet).take(3)} " +
              s"wrong=${model.keySet.intersect(got.keySet).filter(k => model(k) != got(k)).take(3)}")
        case Some(_) => // REFUSE: statement left no trace...
          refused += 1
          assert(fired && concKind != 0,
            s"step $step refused without a concurrent commit")
          model = afterConc
          assert(readState(s"step $step (refused)") == model,
            s"step $step: refused statement left a trace")
          // ...and the user re-run lands its re-decided effect
          spark.sql(sqlText).collect()
          model = effect(model)
          assert(readState(s"step $step (re-run)") == model,
            s"step $step: re-run after refusal diverged")
      }

      if (step % 30 == 0) { // fold tombstones, trim history; model-invisible
        ManifestTable.optimize(spark, path)
        ManifestTable.vacuum(spark, path, keepVersions = 2)
        assert(readState(s"step $step (upkeep)") == model,
          s"step $step: OPTIMIZE/VACUUM changed visible state")
      }
    }

    info(s"refused $refused, committed-with-interleave $committedInterleaved of 300 cases")
    assert(refused >= 20, s"seed exercised only $refused refusals — reseed")
    assert(committedInterleaved >= 20,
      s"seed exercised only $committedInterleaved disjoint interleaves — reseed")
  }
}
