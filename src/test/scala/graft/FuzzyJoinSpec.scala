package graft

import graft.queries.ExtendedQueries

/** The LSH fuzzy join is the brute join's scale path, not a different
  * operator: for every probe whose true best match sits in the banding's
  * high-recall zone (J ≥ 0.2 with 64 bands of r=1 → miss probability
  * (1-J)^64 ≤ 1e-6, i.e. recall ≥ 0.99999 per probe — the
  * `fuzzyNameJoinLsh` tuning), the banded variant returns the identical
  * (match, score) row, and it can never report a better-scoring match
  * than brute (its candidates are a subset).
  */
class FuzzyJoinSpec extends SparkSpec {
  import spark.implicits._

  test("fuzzy_name_join_lsh == brute wherever the best match is in the high-recall zone") {
    def toMap(df: org.apache.spark.sql.DataFrame) =
      df.as[(Long, Long, Double)].collect()
        .map(t => t._1 -> (t._2, t._3)).toMap
    val brute = toMap(ExtendedQueries.fuzzyNameJoin(spark, sfDir))
    val lsh = toMap(ExtendedQueries.fuzzyNameJoinLsh(spark, sfDir))
    assert(brute.nonEmpty)
    val strong = brute.filter(_._2._2 >= 0.2)
    assert(strong.nonEmpty, "fixture has no high-recall-zone matches — pin is vacuous")
    strong.foreach { case (c, best) =>
      assert(lsh.get(c).contains(best),
        s"probe $c: lsh=${lsh.get(c)} brute=$best")
    }
    // subset property: lsh can never beat brute's score
    lsh.foreach { case (c, (_, j)) =>
      assert(brute.contains(c) && j <= brute(c)._2 + 1e-9,
        s"probe $c: lsh score $j exceeds brute ${brute.get(c)}")
    }
  }
}
