package graft

import org.apache.spark.sql.functions._
import graft.ops.Distribution

class DistributionSpec extends SparkSpec {
  import spark.implicits._

  private def run(nCompanies: Int, nWebhooks: Int, capacity: Int) = {
    val companies = (1 to nCompanies).map(i => (i.toLong, f"c$i%04d"))
    val webhooks = (1 to nWebhooks).map(i => (i.toLong, f"w$i%02d"))
    val ranked = Distribution
      .rankGlobal(companies.toDF("id", "name"), Seq($"name", $"id"))
      .withColumn("capacity", lit(capacity.toLong))
    val widx = Distribution.indexWebhooks(webhooks.toDF("wid", "wname"), Seq($"wid"))
    val got = Distribution.assign(ranked, widx)
      .select($"name", $"wname").as[(String, String)].collect().sorted.toSeq
    val gotUnassigned = Distribution.unassigned(ranked, nWebhooks)
      .select($"name").as[String].collect().sorted.toSeq
    val (expAssign, expUn) = Distribution.greedyReference(
      companies.map(_._2).sorted, webhooks.map(_._2).sorted, capacity)
    (got, gotUnassigned, expAssign.sorted, expUn.sorted)
  }

  test("assignment matches the reference greedy loop (property, seeded)") {
    val rnd = new scala.util.Random(42)
    (1 to 8).foreach { _ =>
      val (nc, nw, cap) = (rnd.nextInt(61), 1 + rnd.nextInt(7), 1 + rnd.nextInt(9))
      val (got, gotUn, exp, expUn) = run(nc, nw, cap)
      assert(got == exp, s"assign mismatch nc=$nc nw=$nw cap=$cap")
      assert(gotUn == expUn, s"unassigned mismatch nc=$nc nw=$nw cap=$cap")
    }
  }

  test("invariants: disjoint cover, bucket size ≤ capacity, order respected") {
    val companies = (1 to 37).map(i => (i.toLong, f"c$i%04d")).toDF("id", "name")
    val ranked = Distribution.rankGlobal(companies, Seq($"name", $"id"))
      .withColumn("capacity", lit(5L))
    val widx = Distribution.indexWebhooks(
      (1 to 4).map(i => (i.toLong, s"w$i")).toDF("wid", "wname"), Seq($"wid"))
    val assigned = Distribution.assign(ranked, widx).cache()
    // every assigned company in exactly one bucket
    assert(assigned.groupBy("id").count().filter($"count" > 1).count() == 0)
    // bucket size ≤ capacity
    assert(assigned.groupBy("wname").count().filter($"count" > 5).count() == 0)
    // assigned ∪ unassigned = input
    val un = Distribution.unassigned(ranked, 4)
    assert(assigned.count() + un.count() == 37)
    assert(assigned.count() == 20) // 4 webhooks × cap 5
    // first webhook gets the first `capacity` companies in order
    val w1 = assigned.filter($"wname" === "w1").select($"name")
      .as[String].collect().sorted.toSeq
    assert(w1 == Seq("c0001", "c0002", "c0003", "c0004", "c0005"))
  }

  test("rankGlobalScalable produces the same ranking as the window version") {
    val df = Tables()
    val byWindow = Distribution.rankGlobal(df, Seq($"name", $"id"))
      .select($"id", $"rn").as[(Long, Long)].collect().toMap
    val byZip = Distribution.rankGlobalScalable(df, Seq($"name", $"id"))
      .select($"id", $"rn").as[(Long, Long)].collect().toMap
    assert(byWindow == byZip)
  }

  private def Tables() = {
    // names collide on purpose: the unique id tiebreaker must keep ranks stable
    (1 to 500).map(i => (i.toLong, s"name${i % 50}")).toDF("id", "name")
      .repartition(7)
  }
}
