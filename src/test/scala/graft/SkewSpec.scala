package graft

import org.apache.spark.sql.functions._
import graft.ops.Skew

class SkewSpec extends SparkSpec {
  import spark.implicits._

  // one hot key (90% of rows) + a tail
  private def skewed() =
    ((1 to 9000).map(i => ("hot", i)) ++ (1 to 1000).map(i => (s"k${i % 50}", i)))
      .toDF("k", "v").repartition(8)

  test("saltedAgg: collect_set spread over salts equals plain aggregation") {
    val df = skewed()
    val plain = df.groupBy($"k").agg(countDistinct($"v").as("nd"))
      .as[(String, Long)].collect().toMap
    val salted = Skew.saltedAgg(df, $"k", saltBuckets = 8,
        partials = Seq(collect_set($"v").as("vs")),
        merges = Seq(size(array_distinct(flatten(collect_list($"vs")))).cast("long").as("nd")))
      .as[(String, Long)].collect().toMap
    assert(salted == plain)
  }

  test("saltedJoin: equals plain join, spreads the hot key") {
    val fact = skewed()
    val dim = (Seq("hot") ++ (0 until 50).map(i => s"k$i")).zipWithIndex
      .toDF("dk", "dval")
    val plain = fact.join(dim, $"k" === $"dk")
      .groupBy($"k").agg(count(lit(1)).as("n"), first($"dval").as("d"))
      .as[(String, Long, Int)].collect().toSet
    val salted = Skew.saltedJoin(fact, dim, "k", "dk", saltBuckets = 8,
        factHashCols = Seq($"v"))
      .groupBy($"k").agg(count(lit(1)).as("n"), first($"dval").as("d"))
      .as[(String, Long, Int)].collect().toSet
    assert(salted == plain)
  }
}
