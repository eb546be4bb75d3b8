package graft

import java.sql.Timestamp
import graft.ops.AsOf

class AsOfSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("backward as-of: latest right row ≤ left time per key; no match → null") {
    val left = Seq(
      (1L, ts("2024-01-10 00:00:00"), "e1"),
      (1L, ts("2024-01-20 00:00:00"), "e2"),
      (1L, ts("2024-01-05 00:00:00"), "e0"), // before any right row
      (2L, ts("2024-01-15 00:00:00"), "e3")
    ).toDF("k", "t", "ev")
    val right = Seq(
      (1L, ts("2024-01-08 00:00:00"), 100L),
      (1L, ts("2024-01-15 00:00:00"), 200L),
      (2L, ts("2024-01-15 00:00:00"), 300L) // equal time: '<=' matches
    ).toDF("k", "rt", "v")
    val got = AsOf.joinBackward(left, right, "k", "t", "rt", Seq("v"))
      .select($"ev", $"asof_v").as[(String, Option[Long])].collect().toMap
    assert(got("e0").isEmpty)       // nothing at or before
    assert(got("e1").contains(100L)) // latest ≤ Jan 10 is Jan 8
    assert(got("e2").contains(200L)) // latest ≤ Jan 20 is Jan 15
    assert(got("e3").contains(300L)) // equal timestamps match (<=)
  }

  test("simultaneous right rows: tiebreak column decides deterministically") {
    val left = Seq((1L, ts("2024-01-10 00:00:00"), "e")).toDF("k", "t", "ev")
    val right = Seq(
      (1L, ts("2024-01-08 00:00:00"), 7L),
      (1L, ts("2024-01-08 00:00:00"), 9L)
    ).toDF("k", "rt", "v")
    val got = AsOf.joinBackward(left, right, "k", "t", "rt", Seq("v"),
        rightTiebreak = Some("v"))
      .select($"asof_v").as[Long].collect().head
    assert(got == 9L) // highest tiebreak wins
  }
}
