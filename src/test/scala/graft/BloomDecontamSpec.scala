package graft

import graft.queries.ExtendedQueries

/** Pins the Bloom decontamination variant against the exact check on the
  * same fixture: no false negatives (the safe direction — a truly shared
  * gram always sets all its bits), and a measured false-positive rate
  * within the m=16n / k=3 design point's budget.
  */
class BloomDecontamSpec extends SparkSpec {

  private lazy val exact = ExtendedQueries.decontamination(spark, sfDir)
    .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
  private lazy val bloom = ExtendedQueries.decontaminationBloom(spark, sfDir)
    .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap

  test("no false negatives: every exact-contaminated doc flags, never with fewer grams") {
    assert(exact.keySet.subsetOf(bloom.keySet),
      s"docs lost by bloom: ${(exact.keySet -- bloom.keySet).toSeq.sorted}")
    exact.foreach { case (id, (nGrams, nShared)) =>
      val (bGrams, bFlagged) = bloom(id)
      assert(bGrams == nGrams, s"doc $id gram universe drifted")
      assert(bFlagged >= nShared,
        s"doc $id: bloom flagged $bFlagged < exact $nShared")
    }
  }

  test("false-positive rate stays inside the m=16n, k=3 budget") {
    // clean grams = all training grams minus truly-shared ones; the
    // design point predicts FP ~ fill^3 ~ 0.5%; assert an order louder
    val totalGrams = bloom.values.map(_._1).sum.toDouble
    val flagged = bloom.values.map(_._2).sum.toDouble
    val shared = exact.values.map(_._2).sum.toDouble
    val fpRate = (flagged - shared) / (totalGrams - shared)
    assert(fpRate >= 0.0 && fpRate < 0.05,
      f"fp rate $fpRate%.4f outside [0, 0.05)")
  }
}
