package graft.queries

/** DuckDB oracle SQL for the IVF family — the oracle RETRAINS the index
  * from scratch, CTE for CTE against `Ivf.train`'s arithmetic:
  *
  *   1. `emb`: vectors as DOUBLE lists (exact widenings of the floats)
  *      with their squared-norm fold — the sample, in ascending-id order
  *      (the portable processing order `train` uses; the affine sample
  *      hash never selects when the corpus fits `maxSample`, as the gate
  *      fixtures do).
  *   2. `c1..ck` / `m2..mk`: deterministic farthest-point init — c1 is
  *      the lowest-id row; each next pick minimizes the max train-cosine
  *      to the already-chosen set (ties → lowest id, the `minBy`
  *      first-occurrence order).
  *   3. `asg_t` / `newc_t` / `cent_t`: Lloyd iterations — nearest
  *      centroid by train-cosine (strict `>`, first index wins ties ≡
  *      row_number sim DESC, cid ASC), then per-dimension means summed
  *      as a LEFT FOLD IN ID ORDER (`list(val ORDER BY id)` reduced
  *      sequentially — bit-equal to the Scala accumulation loop) and
  *      rounded through FLOAT exactly like the stored `Array[Float]`
  *      centroids; empty lists keep their previous centroid.
  *   4. `cidx` / `prb` / ranked scoring: the search path, mirroring the
  *      Column-side arithmetic (`dot / (sqrt(ssq(v)) · sqrt(ssq(c)))` —
  *      note the TWO sqrts, unlike the train cosine's single
  *      `sqrt(na·nb)`; the ulp difference between those forms is why
  *      each is mirrored exactly as written).
  *
  * Every fold is sequential and every comparison sees bit-identical
  * doubles on both engines, so the trained centroids, list assignments,
  * probe sets, candidates, and rankings agree exactly — the "same corpus
  * ⇒ same index" determinism claim of `Ivf` is driver-enforced, not just
  * asserted.
  */
object IvfOracle {

  private def dotS(a: String, b: String): String =
    s"list_reduce(list_prepend(CAST(0 AS DOUBLE), list_transform(range(1, len($a) + 1), i -> $a[i] * $b[i])), (x, y) -> x + y)"

  private def ssq(a: String): String =
    s"list_reduce(list_prepend(CAST(0 AS DOUBLE), list_transform($a, x -> x * x)), (x, y) -> x + y)"

  /** Train-path cosine (`Ivf.cosineSim`): single sqrt over the product,
    * -1 on a zero norm. `ass`/`bss` are precomputed squared norms.
    */
  private def trainCos(av: String, ass: String, bv: String, bss: String): String =
    s"(CASE WHEN $ass = 0 OR $bss = 0 THEN -1.0 ELSE ${dotS(av, bv)} / sqrt($ass * $bss) END)"

  /** Search/index-path similarity (`Ivf.index`/`probeLists`): product of
    * two sqrts, no zero guard (the guard lives at scoring time).
    */
  private def idxSim(av: String, ass: String, bv: String, bss: String): String =
    s"(${dotS(av, bv)} / (sqrt($ass) * sqrt($bss)))"

  /** CTE chain ending in `cent$iterations(cid, v, css)` — the trained
    * centroids as float-rounded DOUBLE lists with squared norms.
    */
  private def centroidCtes(k: Int, iterations: Int, dim: Int): String = {
    val sb = new StringBuilder
    sb ++= s"""emb AS (
              |  SELECT vec_id AS id,
              |         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
              |  FROM embeddings),
              |embn AS MATERIALIZED (SELECT id, v, ${ssq("v")} AS vss FROM emb),
              |c1 AS MATERIALIZED (SELECT v AS cv, vss AS cvss FROM embn ORDER BY id LIMIT 1)""".stripMargin
    for (j <- 2 to k) {
      val cosines = (1 until j).map(i =>
        trainCos("e.v", "e.vss", s"c$i.cv", s"c$i.cvss"))
      val ms = if (cosines.size == 1) cosines.head
               else s"greatest(${cosines.mkString(", ")})"
      val froms = (1 until j).map(i => s"c$i").mkString(", ")
      sb ++= s""",
                |m$j AS MATERIALIZED (SELECT e.id, e.v, e.vss, $ms AS ms FROM embn e, $froms),
                |c$j AS MATERIALIZED (SELECT v AS cv, vss AS cvss FROM m$j ORDER BY ms ASC, id ASC LIMIT 1)""".stripMargin
    }
    val centInit = (1 to k)
      .map(j => s"SELECT ${j - 1} AS cid, cv AS v, cvss AS css FROM c$j")
      .mkString("\n  UNION ALL ")
    sb ++= s""",
              |cent0 AS MATERIALIZED (
              |  $centInit)""".stripMargin
    for (t <- 1 to iterations) {
      val prev = s"cent${t - 1}"
      sb ++= s""",
                |asg$t AS MATERIALIZED (
                |  SELECT id, v, cid FROM (
                |    SELECT e.id, e.v, c.cid,
                |           row_number() OVER (PARTITION BY e.id
                |             ORDER BY ${trainCos("e.v", "e.vss", "c.v", "c.css")} DESC, c.cid ASC) AS rk
                |    FROM embn e, $prev c) WHERE rk = 1),
                |newc$t AS MATERIALIZED (
                |  SELECT cid, d,
                |         CAST(CAST(list_reduce(list_prepend(CAST(0 AS DOUBLE),
                |                list(val ORDER BY id)), (x, y) -> x + y)
                |              / count(*) AS FLOAT) AS DOUBLE) AS cval
                |  FROM (SELECT a.cid, a.id, dd.d, a.v[dd.d] AS val
                |        FROM asg$t a, (SELECT unnest(range(1, ${dim + 1})) AS d) dd)
                |  GROUP BY cid, d),
                |cent$t AS MATERIALIZED (
                |  SELECT cid, v, ${ssq("v")} AS css FROM (
                |    SELECT p.cid, coalesce(n.nv, p.v) AS v
                |    FROM $prev p LEFT JOIN (SELECT cid, list(cval ORDER BY d) AS nv
                |                            FROM newc$t GROUP BY cid) n ON n.cid = p.cid))""".stripMargin
    }
    sb.toString
  }

  /** CTE chain `cidx` (corpus list assignment) + `prb` (query probes) +
    * `ivfrk` (exact-scored, ranked candidates) over the trained
    * centroids; rank on the RAW sim exactly like `searchTopK` (both
    * engines' sims are bit-identical folds, so raw-sim ranking agrees).
    * `candPred` mirrors the filtered-ANN pre-filter: candidates whose
    * id fails the embeddings-table predicate are dropped BEFORE the
    * rank window, exactly where `Ivf.searchTopK`'s `allowed` semi-join
    * sits, so filtered ranks are dense over the allowed docs on both
    * engines.
    */
  private def searchCtes(cent: String, nProbe: String, queryPred: String,
                         candPred: String = "TRUE",
                         matchJoin: String = ""): String =
    s"""cidx AS MATERIALIZED (
       |  SELECT id AS neighbor_id, v AS cv, sqrt(vss) AS cn, cid AS list_id FROM (
       |    SELECT e.id, e.v, e.vss, c.cid,
       |           row_number() OVER (PARTITION BY e.id
       |             ORDER BY ${idxSim("e.v", "e.vss", "c.v", "c.css")} DESC, c.cid ASC) AS rk
       |    FROM embn e, $cent c) WHERE rk = 1),
       |prb AS MATERIALIZED (
       |  SELECT id AS query_id, v AS qv, sqrt(vss) AS qn, cid AS probe FROM (
       |    SELECT e.id, e.v, e.vss, c.cid,
       |           row_number() OVER (PARTITION BY e.id
       |             ORDER BY ${idxSim("e.v", "e.vss", "c.v", "c.css")} DESC, c.cid ASC) AS rk
       |    FROM embn e, $cent c WHERE $queryPred) WHERE rk <= $nProbe),
       |ivfsc AS MATERIALIZED (
       |  SELECT p.query_id, x.neighbor_id,
       |         CASE WHEN p.qn * x.cn > 0
       |              THEN ${dotS("p.qv", "x.cv")} / (p.qn * x.cn) END AS sim
       |  FROM prb p JOIN cidx x
       |    ON x.list_id = p.probe AND p.query_id <> x.neighbor_id
       |  $matchJoin
       |  WHERE x.neighbor_id IN
       |    (SELECT vec_id FROM embeddings WHERE $candPred)),
       |ivfrk AS MATERIALIZED (
       |  SELECT query_id, neighbor_id, sim,
       |         row_number() OVER (PARTITION BY query_id
       |           ORDER BY sim DESC NULLS LAST, neighbor_id) AS rank
       |  FROM ivfsc)""".stripMargin

  /** ann_topk_ivf: k=8 lists, 5 Lloyd iterations, queries vec_id<10,
    * nProbe=2, top-5 — mirrors `ExtendedQueries.annTopkIvf` end to end.
    */
  def annTopkIvfSql(k: Int = 8, iterations: Int = 5, dim: Int = 64,
                    nProbe: Int = 2, topK: Int = 5): String =
    s"""WITH ${centroidCtes(k, iterations, dim)},
       |${searchCtes(s"cent$iterations", nProbe.toString, "e.id < 10")}
       |SELECT query_id, neighbor_id, round(sim, 6) AS sim_r,
       |       CAST(rank AS BIGINT) AS rank
       |FROM ivfrk WHERE rank <= $topK ORDER BY query_id, rank""".stripMargin

  /** ann_topk_ivf_filtered: the same trained index and probes, with the
    * filtered-ANN pre-filter `label = 2` — candidate rows failing the
    * predicate drop BEFORE ranking, so ranks are dense over allowed
    * docs (rank-then-filter would instead under-fill the top-k). Same
    * queries (vec_id < 10 — queries need not satisfy the filter),
    * nProbe=2, top-5.
    */
  def annTopkIvfFilteredSql(k: Int = 8, iterations: Int = 5, dim: Int = 64,
                            nProbe: Int = 2, topK: Int = 5,
                            candPred: String = "label = 2"): String =
    s"""WITH ${centroidCtes(k, iterations, dim)},
       |${searchCtes(s"cent$iterations", nProbe.toString, "e.id < 10", candPred)}
       |SELECT query_id, neighbor_id, round(sim, 6) AS sim_r,
       |       CAST(rank AS BIGINT) AS rank
       |FROM ivfrk WHERE rank <= $topK ORDER BY query_id, rank""".stripMargin

  /** ann_topk_ivf_filtered_auto: filtered ANN with PROBE AUTO — the
    * effective probe is computed IN SQL from the same two exact counts
    * the engine reads (corpus rows, allowed rows), replaying
    * `Ivf.autoProbe`'s all-integer ceiling division bit-for-bit:
    * p_eff = least(nLists, greatest(pBase,
    * (pBase·corpus + allowed − 1) // allowed)). The ranked-probe
    * window then cuts at the scalar subquery instead of a literal —
    * the rest of the trained index, probes, and filtered ranking is
    * `annTopkIvfFilteredSql` unchanged.
    */
  def annTopkIvfFilteredAutoSql(k: Int = 8, iterations: Int = 5,
                                dim: Int = 64, pBase: Int = 2,
                                topK: Int = 5,
                                candPred: String = "label <= 4"): String =
    s"""WITH ${centroidCtes(k, iterations, dim)},
       |pe AS MATERIALIZED (
       |  SELECT least($k, greatest($pBase,
       |    ($pBase * (SELECT count(*) FROM embeddings)
       |     + (SELECT count(*) FROM embeddings WHERE $candPred) - 1)
       |    // (SELECT count(*) FROM embeddings WHERE $candPred))) AS p_eff),
       |${searchCtes(s"cent$iterations", "(SELECT p_eff FROM pe)",
                     "e.id < 10", candPred)}
       |SELECT query_id, neighbor_id, round(sim, 6) AS sim_r,
       |       CAST(rank AS BIGINT) AS rank
       |FROM ivfrk WHERE rank <= $topK ORDER BY query_id, rank""".stripMargin

  /** ann_topk_ivf_matched_auto: per-query MATCHED ANN with PROBE AUTO —
    * the multi-tenant idiom end to end (VERDICT r18 next #2). The
    * oracle derives BOTH halves independently:
    *
    *  - p_eff replays the MATCH-aware widening
    *    (`SearchRelations.matchMinCount` → `Ivf.autoProbe`): the
    *    per-value corpus counts of the matched attribute (`label % 2`),
    *    joined to the batch's DISTINCT values, min-aggregated — the
    *    worst-case per-tenant eligible size — then the same all-integer
    *    ceiling division, clamped [pBase, k];
    *  - eligibility is PER QUERY: a candidate survives only when its
    *    attribute equals the QUERY row's (the attrs self-join in
    *    `ivfsc`), applied BEFORE the rank window exactly where the
    *    engine's candidate-bound [[graft.ops.MatchFilter]] sits, so
    *    each query's top-k is dense over ITS tenant's docs.
    *
    * The trained index, probes, and scoring arithmetic are the shared
    * CTEs; the engine side runs the whole thing through the PERSISTED
    * IvfIndex + SearchRelations.vector (build-then-search ≡ in-query
    * searchTopK is spec-pinned, so one oracle covers both).
    */
  def annTopkIvfMatchedAutoSql(k: Int = 8, iterations: Int = 5,
                               dim: Int = 64, pBase: Int = 2,
                               topK: Int = 5): String =
    s"""WITH ${centroidCtes(k, iterations, dim)},
       |attrs AS MATERIALIZED (
       |  SELECT vec_id AS id, label % 2 AS grp FROM embeddings),
       |mm AS MATERIALIZED (
       |  SELECT min(n) AS m FROM
       |    (SELECT grp, count(*) AS n FROM attrs GROUP BY grp) c
       |    JOIN (SELECT DISTINCT grp FROM attrs WHERE id < 10) b USING (grp)),
       |pe AS MATERIALIZED (
       |  SELECT least($k, greatest($pBase,
       |    ($pBase * (SELECT count(*) FROM embeddings) + m - 1) // m)) AS p_eff
       |  FROM mm),
       |${searchCtes(s"cent$iterations", "(SELECT p_eff FROM pe)",
                     "e.id < 10",
                     matchJoin = "JOIN attrs qa ON qa.id = p.query_id\n" +
                       "  JOIN attrs xa ON xa.id = x.neighbor_id " +
                       "AND xa.grp = qa.grp")}
       |SELECT query_id, neighbor_id, round(sim, 6) AS sim_r,
       |       CAST(rank AS BIGINT) AS rank
       |FROM ivfrk WHERE rank <= $topK ORDER BY query_id, rank""".stripMargin

  /** ivf_recall: recall@5 of the IVF path (nProbe=5) against the exact
    * brute-force top-5 (round-before-rank, the ann_topk_brute recipe) —
    * mirrors `ExtendedQueries.ivfRecall`.
    */
  def ivfRecallSql(k: Int = 8, iterations: Int = 5, dim: Int = 64,
                   nProbe: Int = 5, topK: Int = 5): String =
    s"""WITH ${centroidCtes(k, iterations, dim)},
       |${searchCtes(s"cent$iterations", nProbe.toString, "e.id < 10")},
       |ivf5 AS MATERIALIZED (SELECT query_id, neighbor_id FROM ivfrk WHERE rank <= $topK),
       |flat AS (
       |  SELECT vec_id, unnest(embedding) AS x,
       |         generate_subscripts(embedding, 1) AS i
       |  FROM embeddings),
       |norms AS (
       |  SELECT vec_id, sqrt(sum(CAST(x AS DOUBLE) * CAST(x AS DOUBLE))) AS nrm
       |  FROM flat GROUP BY vec_id),
       |dots AS (
       |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
       |         sum(CAST(q.x AS DOUBLE) * CAST(c.x AS DOUBLE)) AS dot
       |  FROM flat q JOIN flat c ON q.i = c.i
       |  WHERE q.vec_id < 10 AND q.vec_id <> c.vec_id
       |  GROUP BY 1, 2),
       |bscored AS (
       |  SELECT query_id, neighbor_id,
       |         round(dot / (nq.nrm * nc.nrm), 6) AS sim_r
       |  FROM dots
       |  JOIN norms nq ON nq.vec_id = query_id
       |  JOIN norms nc ON nc.vec_id = neighbor_id),
       |brute5 AS (
       |  SELECT query_id, neighbor_id FROM (
       |    SELECT *, row_number() OVER (PARTITION BY query_id
       |      ORDER BY sim_r DESC, neighbor_id) AS rk FROM bscored)
       |  WHERE rk <= $topK),
       |hits AS (
       |  SELECT b.query_id, count(*) AS n
       |  FROM brute5 b JOIN ivf5 i
       |    ON i.query_id = b.query_id AND i.neighbor_id = b.neighbor_id
       |  GROUP BY b.query_id)
       |SELECT q.query_id, CAST(coalesce(h.n, 0) AS DOUBLE) / 5.0 AS recall_at_5
       |FROM (SELECT vec_id AS query_id FROM embeddings WHERE vec_id < 10) q
       |LEFT JOIN hits h ON h.query_id = q.query_id
       |ORDER BY q.query_id""".stripMargin

  /** semantic_dedup: the same retrained centroids + cidx list assignment,
    * then the SemDeDup drop rule — a vector is dropped iff a PRECEDING
    * member of its cluster sits at rounded cosine ≥ tau, where
    * precedence is min-id (engine default) or the paper's ascending
    * rounded centroid-similarity with id tiebreak
    * (`keepLeastCentral = true`, `Similarity.semanticDedup`'s flag).
    * Sim arithmetic is the scoring form (`dot / (cn·cn)`, two sqrts via
    * the stored norms) rounded to 6; the centroid similarity reuses the
    * EXACT `idxSim` expression of the winning rk=1 row, so the ordering
    * key is bit-identical to the Column-side `centroid_sim`.
    */
  def semanticDedupSql(k: Int = 8, iterations: Int = 5, dim: Int = 64,
                       tau: Double = 0.4,
                       keepLeastCentral: Boolean = false): String = {
    val precedes =
      if (keepLeastCentral)
        "(b.csim < a.csim OR (b.csim = a.csim AND b.id < a.id))"
      else "b.id < a.id"
    s"""WITH ${centroidCtes(k, iterations, dim)},
       |cidx AS MATERIALIZED (
       |  SELECT id, v AS cv, sqrt(vss) AS cn, cid AS list_id,
       |         round(isim, 6) AS csim FROM (
       |    SELECT e.id, e.v, e.vss, c.cid,
       |           ${idxSim("e.v", "e.vss", "c.v", "c.css")} AS isim,
       |           row_number() OVER (PARTITION BY e.id
       |             ORDER BY ${idxSim("e.v", "e.vss", "c.v", "c.css")} DESC, c.cid ASC) AS rk
       |    FROM embn e, cent$iterations c) WHERE rk = 1),
       |dropped AS (
       |  SELECT DISTINCT a.id
       |  FROM cidx a JOIN cidx b
       |    ON b.list_id = a.list_id AND $precedes
       |  WHERE round(CASE WHEN a.cn * b.cn > 0
       |              THEN ${dotS("a.cv", "b.cv")} / (a.cn * b.cn) END, 6) >= $tau)
       |SELECT c.id AS vec_id, CAST(c.list_id AS BIGINT) AS cluster,
       |       (d.id IS NULL) AS kept
       |FROM cidx c LEFT JOIN dropped d ON d.id = c.id
       |ORDER BY vec_id""".stripMargin
  }

  /** ivf_recall_gate: the 0.8-mean-recall threshold as a row-or-nothing
    * gate (mean rounded to 6 decimals — double SUM order differs across
    * engines in the last ulp; rounding heals it).
    */
  def ivfRecallGateSql(): String =
    s"""WITH recall AS (${ivfRecallSql()})
       |SELECT * FROM (
       |  SELECT CAST(count(*) AS BIGINT) AS n_queries,
       |         round(avg(recall_at_5), 6) AS mean_recall_r
       |  FROM recall)
       |WHERE mean_recall_r >= 0.8""".stripMargin
}
