package graft

import org.apache.spark.sql.functions.col
import graft.ops.Dedup
import graft.queries.ExtendedQueries

/** The fingerprint-keyed shuffle variants (`fingerprintKeys = true`) are
  * the 100 TB shapes of `line_dedup` and `source_overlap`: the big
  * shuffle key is a 128-bit xxhash64 pair instead of the raw
  * line/gram string. They carry no DuckDB oracle (engine-internal
  * hashes aren't portable SQL), so equality with the oracled raw-key
  * queries is pinned here, and the plan shape — fingerprints computed
  * BELOW the exchange, raw strings absent from the wide shuffle — is
  * pinned alongside.
  */
class FingerprintKeySpec extends SparkSpec {

  test("line_dedup_fp ≡ line_dedup on the fixtures") {
    import spark.implicits._
    // fixture with cross-document boilerplate plus the sf corpus
    val docs = Seq(
      (9001L, "keep me\nCOMMON FOOTER\nunique line a"),
      (9002L, "COMMON FOOTER\nunique line b"),
      (9003L, "COMMON FOOTER"),
      (9004L, "all\nmine\nalone")).toDF("doc_id", "text")
    val raw = Dedup.lineDedup(docs, "doc_id", "text")
      .orderBy("doc_id").collect().toSeq
    val fp = Dedup.lineDedup(docs, "doc_id", "text", fingerprintKeys = true)
      .orderBy("doc_id").collect().toSeq
    assert(fp == raw)

    val qRaw = ExtendedQueries.all("line_dedup")(spark, sfDir).collect().toSeq
    val qFp = ExtendedQueries.benchOnly("line_dedup_fp")(spark, sfDir).collect().toSeq
    assert(qFp == qRaw)
  }

  test("source_overlap_fp ≡ source_overlap on the fixtures") {
    val raw = ExtendedQueries.sourceOverlap(spark, sfDir).collect().toSeq
    val fp = ExtendedQueries.sourceOverlap(spark, sfDir, fingerprintKeys = true)
      .collect().toSeq
    assert(fp == raw)
  }

  test("fp variants shuffle fingerprints, not raw strings") {
    // source_overlap_fp: the gram text is pruned before the wide
    // shuffle — no exchange carries the raw gram; the xxhash64 kernels
    // sit below the aggregate
    val po = ExtendedQueries.sourceOverlap(spark, sfDir, fingerprintKeys = true)
      .queryExecution.executedPlan.toString
    assert(po.contains("xxhash64"), po.take(600))
    assert(!po.split("\n").exists(l =>
      l.contains("Exchange hashpartitioning(g0")), po.take(1200))

    // line_dedup_fp: the frequency-count aggregation groups on the
    // fingerprint struct, not the line string
    val pl = Dedup.lineDedup(
        graft.model.Tables.documents(spark, sfDir), "doc_id", "text",
        fingerprintKeys = true)
      .queryExecution.executedPlan.toString
    assert(pl.contains("xxhash64"), pl.take(600))
    assert(!pl.split("\n").exists(l =>
      l.contains("Exchange hashpartitioning(line")), pl.take(1200))
  }
}
