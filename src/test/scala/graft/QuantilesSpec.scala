package graft

import org.apache.spark.sql.functions._
import graft.ops.Quantiles

class QuantilesSpec extends SparkSpec {
  import spark.implicits._

  test("groupRanked: dense 1-based ranks follow the value order per group") {
    val df = Seq(("a", 3.0), ("a", 1.0), ("a", 2.0), ("b", 5.0), ("b", 4.0))
      .toDF("g0", "v0")
    val got = Quantiles.groupRanked(df, "g0", "v0")
      .orderBy("g", "rn")
      .as[(String, Double, Long)].collect().toSeq
    assert(got == Seq(("a", 1.0, 1L), ("a", 2.0, 2L), ("a", 3.0, 3L),
      ("b", 4.0, 1L), ("b", 5.0, 2L)))
  }

  test("exactQuantiles equals the buffering percentile() bit-for-bit on orders") {
    val orders = graft.model.Tables.orders(spark, sfDir)
    val viaBuiltin = orders.groupBy("o_orderstatus")
      .agg(expr("percentile(o_totalprice, 0.5)").as("p50"),
        expr("percentile(o_totalprice, 0.9)").as("p90"))
      .orderBy("o_orderstatus")
      .as[(String, Double, Double)].collect().toSeq
    val q = Quantiles.exactQuantiles(orders, "o_orderstatus", "o_totalprice",
      Seq("p50" -> 0.5, "p90" -> 0.9))
    val viaScalable = q.groupBy("o_orderstatus")
      .agg(min(when(col("qname") === "p50", col("value"))).as("p50"),
        min(when(col("qname") === "p90", col("value"))).as("p90"))
      .orderBy("o_orderstatus")
      .as[(String, Double, Double)].collect().toSeq
    assert(viaScalable == viaBuiltin) // exact double equality, no tolerance
  }

  test("property (seeded): exactQuantiles ≡ percentile() on random grouped data") {
    val rnd = new scala.util.Random(13)
    (1 to 8).foreach { trial =>
      val n = 1 + rnd.nextInt(400)
      val rows = Seq.fill(n)(
        (s"g${rnd.nextInt(3)}", (rnd.nextDouble() - 0.5) * 2e6))
      val q = rnd.nextDouble()
      val df = rows.toDF("g0", "v0")
      val builtin = df.groupBy("g0")
        .agg(expr(s"percentile(v0, $q)").as("p"))
        .orderBy("g0").as[(String, Double)].collect().toSeq
      val scalable = Quantiles.exactQuantiles(df, "g0", "v0", Seq("p" -> q))
        .select(col("g0"), col("value")).orderBy("g0")
        .as[(String, Double)].collect().toSeq
      assert(scalable == builtin, s"trial $trial, q=$q") // exact, no tolerance
    }
  }

  test("NULL contract: null values dropped; an all-NULL group disappears (vs percentile's NULL row)") {
    val df = Seq(("a", Some(1.0)), ("a", None), ("a", Some(3.0)),
      ("b", None), ("b", None)).toDF("g0", "v0")
    val got = Quantiles.exactQuantiles(df, "g0", "v0", Seq("p50" -> 0.5))
      .select($"g0", $"value").as[(String, Double)].collect().toMap
    assert(got == Map("a" -> 2.0)) // b has no non-null values -> no row
    // the buffering built-in emits b with a NULL quantile — the
    // documented divergence; callers needing those groups left-join the
    // result back to the distinct keys
    val builtin = df.groupBy("g0").agg(expr("percentile(v0, 0.5)").as("p"))
      .orderBy("g0").as[(String, Option[Double])].collect().toSeq
    assert(builtin == Seq(("a", Some(2.0)), ("b", None)))
    // the recovery recipe from the scaladoc restores parity
    val recovered = df.select($"g0").distinct()
      .join(Quantiles.exactQuantiles(df, "g0", "v0", Seq("p50" -> 0.5))
        .select($"g0", $"value"), Seq("g0"), "left")
      .orderBy("g0").as[(String, Option[Double])].collect().toSeq
    assert(recovered == builtin)
  }

  test("exactQuantiles releases its sorted cache (no RDD accumulation across calls)") {
    // other suites share this session and persist/unpersist concurrently,
    // so assert on exactQuantiles' NAMED cache only, not global counts
    val df = Seq(("g", 10.0), ("g", 20.0), ("g", 30.0)).toDF("k", "x")
    (1 to 3).foreach { _ =>
      Quantiles.exactQuantiles(df, "k", "x", Seq("p50" -> 0.5)).collect()
    }
    val leaked = spark.sparkContext.getPersistentRDDs.values
      .filter(_.name == "graft-quantiles-sorted")
    assert(leaked.isEmpty, s"sorted cache not released: $leaked")
  }

  test("exactQuantiles: interpolation and exact-hit cases on a known vector") {
    // values 10,20,30,40 → p25: h = 0.25·3 = 0.75 → 10 + 0.75·10 = 17.5;
    // p50: h = 1.5 → 25.0; p100 exact hit → 40
    val df = Seq(("g", 10.0), ("g", 20.0), ("g", 30.0), ("g", 40.0)).toDF("k", "x")
    val got = Quantiles.exactQuantiles(df, "k", "x",
      Seq("p25" -> 0.25, "p50" -> 0.5, "p100" -> 1.0))
      .select("qname", "value").as[(String, Double)].collect().toMap
    assert(got("p25") == 17.5 && got("p50") == 25.0 && got("p100") == 40.0)
  }
}
