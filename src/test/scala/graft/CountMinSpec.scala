package graft

import org.apache.spark.sql.functions._
import graft.ops.CountMin

/** Count-Min sketch invariants: cell-wise mergeability (the property
  * that makes the distributed build correct — partial per-task sketches
  * sum into the corpus sketch) and the one-sided error guarantee.
  */
class CountMinSpec extends SparkSpec {
  import spark.implicits._

  private val d = 3
  private val w = 16 // tiny width forces collisions — the estimate must
                     // still never undercount

  private val partA = Seq.fill(7)("alpha") ++ Seq.fill(4)("beta") ++
    Seq("gamma", "delta", "epsilon")
  private val partB = Seq.fill(5)("alpha") ++ Seq.fill(9)("zeta") ++
    Seq("beta", "eta")

  test("sketch(A ++ B) == cellwise sum of sketch(A) and sketch(B)") {
    val sa = CountMin.buildSketch(partA.toDF("tok"), "tok", d, w)
    val sb = CountMin.buildSketch(partB.toDF("tok"), "tok", d, w)
    val merged = sa.select($"j", $"bucket", $"n")
      .union(sb.select($"j", $"bucket", $"n"))
      .groupBy("j", "bucket").agg(sum("n").as("n"))
      .as[(Int, Long, Long)].collect().toSet
    val whole = CountMin.buildSketch((partA ++ partB).toDF("tok"), "tok", d, w)
      .as[(Int, Long, Long)].collect().toSet
    assert(merged == whole)
  }

  test("estimates never undercount, and are exact absent collisions") {
    val all = partA ++ partB
    val trueCounts = all.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val queries = trueCounts.keys.toSeq.toDF("tok")
    val sketch = CountMin.buildSketch(all.toDF("tok"), "tok", d, w)
    val est = CountMin.estimate(sketch, queries, "tok", d, w)
      .as[(String, Long)].collect().toMap
    trueCounts.foreach { case (tok, n) =>
      assert(est(tok) >= n, s"undercount for $tok")
    }
    // with a roomy width there are no collisions and estimates are exact
    val wide = CountMin.estimate(
      CountMin.buildSketch(all.toDF("tok"), "tok", d, 4096),
      queries, "tok", d, 4096).as[(String, Long)].collect().toMap
    assert(wide == trueCounts)
  }
}
