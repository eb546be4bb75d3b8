package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Core relational operators of the reference, re-expressed declaratively
  * so Catalyst plans them (SURVEY.md §2.1-§2.5).
  *
  * The reference emulated several of these in application code (its §4.2
  * de-optimizations: materialized NOT-IN, chunked IN re-fetch, N+1 grouped
  * counts). Here each is the single canonical Spark operator; at scale the
  * anti/semi joins shuffle on the join key once, and Catalyst/AQE picks
  * broadcast-hash when one side is small.
  */
object Relational {

  /** J1 — companies not yet sent: left-anti equi-join.
    * Reference emulation: fetch all sent ids then `NOT IN` URL param
    * (companies/route.ts:29-36). `company_id` is NOT NULL in the ledger
    * DDL (supabase-schema.sql:17) so anti-join ≡ NOT EXISTS ≡ the
    * reference's NOT IN here; oracle SQL uses NOT EXISTS to match
    * anti-join NULL semantics exactly (SURVEY §7.4.3).
    */
  def excludeSent(companies: DataFrame, sends: DataFrame,
                  companyKey: String, sendKey: String): DataFrame =
    companies.join(sends.select(col(sendKey)),
      companies(companyKey) === col(sendKey), "left_anti")

  /** J2 — re-fetch companies by id batch: left-semi join. The reference's
    * 100-id chunking (send/route.ts:33-54) was a URL-length workaround;
    * one semi-join replaces N/100 round trips.
    */
  def fetchByIds(companies: DataFrame, ids: DataFrame,
                 companyKey: String, idKey: String): DataFrame =
    companies.join(ids.select(col(idKey)),
      companies(companyKey) === col(idKey), "left_semi")

  /** A1 bucketization — the reference's fixed 11-bucket count loop
    * (companies/route.ts:55-79): NULL → 'unknown', fuzzy substring
    * 'not sure' bucket (ilike '%not sure%'), everything else keeps its
    * raw value. One `when` cascade replaces 11 sequential count queries.
    */
  def rangeBucket(c: Column): Column =
    when(c.isNull, lit("unknown"))
      .when(lower(c).contains("not sure"), lit("not sure"))
      .otherwise(c)

  /** F6 — conditional predicate assembly (companies/route.ts:18-37):
    * filters appended only when the parameter is present. Spark plans are
    * lazily composable the same way the PostgREST builder is.
    */
  def conditionalFilter(df: DataFrame, preds: Seq[Option[Column]]): DataFrame =
    preds.flatten.foldLeft(df)((d, p) => d.filter(p))

  /** Stats-gated broadcast hint: hint `df` for broadcast ONLY when a
    * provable upper bound on its size — the optimized-plan estimate of
    * `bound` (file size × column-pruning ratio for a scan) — is under
    * the threshold. The caller supplies `bound` = a plan whose size the
    * output of `df` cannot exceed (e.g. the fact side of an FK join
    * against a unique key: output rows ≤ fact rows).
    *
    * Why not let the planner decide? Without CBO, Spark estimates a join
    * output as the BYTE PRODUCT of its inputs, so a join branch can
    * never win static build-side selection against a small pruned scan —
    * at small SF the static planner broadcasts the FACT table instead
    * (round 3's region_revenue regression). This helper makes the
    * decision a real-stats one at plan-construction time: under the
    * bound → broadcast (the plan a CBO would pick); over it — any real
    * cluster scale — no hint, so the shuffle join stands and AQE still
    * gets to demote from true runtime sizes.
    */
  def broadcastIfBounded(df: DataFrame, bound: DataFrame): DataFrame = {
    // gate on the session's own broadcast threshold (-1 disables), so
    // the hint obeys the same knob every other broadcast decision does
    val raw = df.sparkSession.conf
      .get("spark.sql.autoBroadcastJoinThreshold", (10L << 20).toString)
    val threshold =
      if (raw.startsWith("-")) -1L
      else org.apache.spark.network.util.JavaUtils.byteStringAsBytes(raw)
    if (threshold > 0 &&
        bound.queryExecution.optimizedPlan.stats.sizeInBytes <= BigInt(threshold))
      broadcast(df)
    else df
  }

  /** O3 — deterministic pagination: ORDER BY + OFFSET/LIMIT
    * (companies/route.ts:39-41). The reference orders by a non-unique
    * column; we always append a unique tiebreaker so pages are stable
    * (SURVEY §7.4.2). `limit(offset+n).offset(offset)` keeps the plan a
    * single CollectLimit — no full sort materialization beyond the first
    * offset+n rows.
    */
  def page(df: DataFrame, order: Seq[Column], offset: Int, n: Int): DataFrame =
    df.orderBy(order: _*).limit(offset + n).offset(offset)
}
