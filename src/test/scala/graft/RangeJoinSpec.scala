package graft

import graft.ops.RangeJoin

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  test("bucketed tolerance join == brute-force pairs (seeded random)") {
    val rnd = new scala.util.Random(5)
    val rows = (1 to 300).map(i =>
      (rnd.nextInt(5).toLong, rnd.nextInt(100000).toLong, i.toLong))
    val df = rows.toDF("k", "tm", "id")
    val tol = 5000L
    val got = RangeJoin.withinTolerance(df, df, "k", "tm", "tm", "id", "id", tol)
      .select($"id_l", $"id_r").as[(Long, Long)].collect().toSet
    val exp = (for {
      (k1, t1, i1) <- rows; (k2, t2, i2) <- rows
      if k1 == k2 && i1 < i2 && math.abs(t1 - t2) <= tol
    } yield (i1, i2)).toSet
    assert(got == exp, s"got ${got.size} exp ${exp.size}")
  }

  test("boundary: exactly-tolerance pairs included, tolerance+1 excluded") {
    val df = Seq((1L, 0L, 1L), (1L, 5000L, 2L), (1L, 10001L, 3L), (1L, 10000L, 4L))
      .toDF("k", "tm", "id")
    val got = RangeJoin.withinTolerance(df, df, "k", "tm", "tm", "id", "id", 5000L)
      .select($"id_l", $"id_r").as[(Long, Long)].collect().toSet
    // in: (1,2) gap 5000 (inclusive), (2,4) gap 5000, (3,4) gap 1
    // out: (1,3) 10001, (1,4) 10000, (2,3) gap 5001 (just over)
    assert(got == Set((1L, 2L), (2L, 4L), (3L, 4L)))
  }
}
