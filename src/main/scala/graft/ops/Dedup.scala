package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deduplication operators for LLM training-data pipelines: exact,
  * MinHash+LSH, SimHash, and n-gram Jaccard — each expressed as
  * shuffle-lean DataFrame programs.
  *
  * Scale design: signatures/fingerprints are computed in a single narrow
  * projection (no shuffle); candidate generation shuffles ONLY on band/
  * bucket keys (tiny vs. all-pairs); exact verification runs on the
  * candidate set, never the cross product. At 100 TB the cross product is
  * 10²³ pairs — banding is what makes near-dedup feasible at all.
  */
object Dedup {

  // ------------------------------------------------------------------
  // Exact dedup
  // ------------------------------------------------------------------

  /** Exact dedup via hash-groupBy: first row per key wins (here: lowest
    * id, deterministic — `dropDuplicates` keeps an arbitrary row, which
    * is fine in practice but not oracle-testable).
    */
  def exactCanonical(df: DataFrame, keyCol: String, idCol: String): DataFrame =
    df.groupBy(col(keyCol))
      .agg(min(col(idCol)).as("canonical_id"), count(lit(1)).as("n_copies"))

  /** C4-style LINE-level dedup: a line occurring more than `maxOccur`
    * times across the whole corpus is removed from EVERY document
    * (boilerplate navigation, cookie banners, licence headers — the
    * C4 paper removed any span occurring more than once), and each
    * document is reassembled from its surviving lines in order.
    *
    * Returns (idCol, n_lines, n_kept, cleaned).
    *
    * Scale shape: two natural shuffles — the global line-frequency
    * count (map-side partial aggregation, so the shuffle carries one
    * row per distinct line per map partition) and the per-document
    * reassembly. The exploded lines join the over-limit counts on the
    * line key. `fingerprintKeys = true` is the 100 TB shape: the
    * count/join key becomes a 128-bit line fingerprint (two
    * independent xxhash64 lanes) so the frequency shuffle carries 16
    * bytes per distinct line instead of the full string; the default
    * raw-string key keeps the operator hash-verifiable against the
    * DuckDB oracle with zero collision caveats (engine-internal
    * hashes aren't portable SQL), and FingerprintKeySpec pins the two
    * variants equal on the fixtures.
    */
  def lineDedup(df: DataFrame, idCol: String, textCol: String,
                maxOccur: Long = 1L, fingerprintKeys: Boolean = false): DataFrame = {
    val lines = df.select(col(idCol),
        posexplode(split(col(textCol), "\n", -1)).as(Seq("pos", "line")))
      .withColumn("lk",
        if (fingerprintKeys)
          struct(xxhash64(col("line")).as("h1"),
            xxhash64(col("line"), lit(1)).as("h2"))
        else col("line"))
    val counts = lines.groupBy("lk")
      .agg(count(lit(1)).as("line_n"))
    val kept = lines.join(counts, Seq("lk"))
      .filter(col("line_n") <= maxOccur)
    val reassembled = kept.groupBy(col(idCol))
      .agg(count(lit(1)).as("n_kept"),
        concat_ws("\n",
          transform(array_sort(collect_list(struct(col("pos"), col("line")))),
            s => s.getField("line"))).as("cleaned"))
    // docs whose every line was boilerplate survive with empty cleaned
    // text (they'd otherwise vanish from the groupBy)
    df.select(col(idCol),
        size(split(col(textCol), "\n", -1)).cast("long").as("n_lines"))
      .join(reassembled, Seq(idCol), "left")
      .select(col(idCol), col("n_lines"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        coalesce(col("cleaned"), lit("")).as("cleaned"))
  }

  // ------------------------------------------------------------------
  // Shingling
  // ------------------------------------------------------------------

  /** Distinct word n-gram shingles of the text. */
  def wordShingles(text: Column, n: Int): Column = {
    val toks = TextAnalysis.tokens(text)
    array_distinct(
      when(size(toks) >= n,
        transform(sequence(lit(0), size(toks) - n),
          i => concat_ws(" ", slice(toks, i + 1, lit(n)))))
        .otherwise(array(concat_ws(" ", toks))))
  }

  /** Distinct character n-gram shingles (for short/dense text). */
  def charShingles(text: Column, n: Int): Column =
    array_distinct(
      when(length(text) >= n,
        transform(sequence(lit(1), length(text) - n + 1),
          i => text.substr(i, lit(n))))
        .otherwise(array(text)))

  // ------------------------------------------------------------------
  // MinHash + LSH
  // ------------------------------------------------------------------

  /** Estimated Jaccard from two signatures: fraction of agreeing
    * positions (codegen'd count — runs per candidate pair).
    */
  def estJaccard(sigA: Column, sigB: Column, numHashes: Int): Column =
    graft.functions.MathExprs.sigAgree(sigA, sigB).cast("double") / numHashes

  /** Exact Jaccard of two shingle sets — HOF executable spec of the
    * single-pass `JaccardExpr` kernel (SketchSpec pins equality); the
    * pipelines use the kernel, which skips the per-pair
    * intersect/union array allocations.
    */
  def jaccard(a: Column, b: Column): Column =
    when(size(array_union(a, b)) > 0,
      size(array_intersect(a, b)).cast("double") /
        size(array_union(a, b)).cast("double"))
      .otherwise(lit(1.0))

  /** Candidate pairs via LSH banding: pos-explode the band-hash array
    * (position = band index), group by (band, bandhash), and expand each
    * multi-doc bucket into its ordered pairs (id_l < id_r), distinct.
    *
    * The bucket aggregation (one shuffle of docs × bands rows) drops
    * singleton buckets BEFORE any pair exists — a direct self-join of
    * the raw exploded set would shuffle it twice and probe the ~all-
    * singleton buckets for nothing. Multi-member buckets then re-explode
    * and self-join within the bucket key: the k(k-1)/2 combinations per
    * bucket stream through the join iterator into distinct(), and no
    * operator ever holds a quadratic (or even linear-in-bucket)
    * candidate array in one value.
    *
    * Skew guard: a bucket larger than `maxBucketSize` is BY CONSTRUCTION
    * a mass-duplicate cluster (≥ cap docs agreeing on a band hash — the
    * boilerplate-duplicated-10⁶-times shape that web-scale dedup exists
    * to catch), and its k² pair expansion on one task is the one
    * genuine scale-killer in the family. Those buckets short-circuit to
    * a linear STAR around the min-id hub: k−1 edges that preserve
    * exactly the connectivity the downstream cluster step needs.
    * Downstream exact verification still checks every emitted edge, so
    * a rare heterogeneous mega-bucket (hash collision) degrades to
    * possibly missing some cross-pairs — it cannot produce a false
    * positive.
    */
  def candidatePairs(df: DataFrame, idCol: String, bandHashesCol: String,
                     maxBucketSize: Int = 4096): DataFrame = {
    val exploded = df.select(col(idCol).as("id"),
      posexplode(col(bandHashesCol)).as(Seq("band", "bh")))
    val buckets = exploded.groupBy("band", "bh")
      .agg(collect_list(col("id")).as("ids"))
      .filter(size(col("ids")) > 1)
    val ids = col("ids")
    // NORMAL buckets: within-bucket self-join — the k(k-1)/2 pair
    // combinations per bucket stream through the sort-merge-join
    // iterator straight into the distinct() shuffle, instead of first
    // materializing O(k) candidate structs per member row (O(k²) per
    // bucket; the array-building dominated this operator's cost on
    // dense near-dup corpora).
    val normMembers = buckets.filter(size(ids) <= maxBucketSize)
      .select(col("band"), col("bh"), explode(ids).as("id"))
    val nl = normMembers.alias("l")
    val nr = normMembers.alias("r")
    val normal = nl.join(nr,
        col("l.band") === col("r.band") && col("l.bh") === col("r.bh") &&
          col("l.id") < col("r.id"))
      .select(col("l.id").as("id_l"), col("r.id").as("id_r"))
    // hub computed ONCE per bucket in its own projection, then explode —
    // NEVER inside a lambda: interpreted HOFs re-evaluate a referenced
    // array_min per element (no CSE), turning the linear star back into
    // the O(k²) blowup it exists to avoid (50k-member bucket ≈ 40×10⁹
    // element visits; caught by DegenerateCorpusSpec).
    val mega = buckets.filter(size(ids) > maxBucketSize)
      .withColumn("hub", array_min(ids))
      .select(col("hub"), explode(ids).as("m"))
      .filter(col("m") =!= col("hub"))
      .select(col("hub").as("id_l"), col("m").as("id_r"))
    normal.union(mega)
      .distinct()
  }

  /** Shingle → signature → band keys in ONE projection of custom
    * single-pass expressions (graft.functions.Sketches).
    *
    * The HOF composition of the same pipeline is quadratic in practice:
    * Catalyst inlines a referenced column expression into every lambda
    * that mentions it (reference count is 1 even when the enclosing
    * `transform` evaluates the lambda 64×), and interpreted HOFs have no
    * common-subexpression elimination — each row re-tokenized thousands
    * of times (observed: one verify task burning 10+ CPU-minutes on 500
    * docs). The custom expressions tokenize once per row per column, so
    * no materialization barrier is needed at any scale.
    */
  def prepareMinhash(df: DataFrame, idCol: String, textCol: String,
                     shingleN: Int, numHashes: Int, bands: Int): DataFrame = {
    import graft.functions.Sketches
    // chained narrow projections so each document is tokenized/shingled
    // ONCE and hashed ONCE: text → shingles → sig → bands, each stage
    // deriving from the previous column. CollapseProject cannot inline
    // the producers (each is a non-cheap custom expression referenced
    // both as an output column and as the next stage's input), so the
    // per-row work is exactly one kernel pass per stage — the previous
    // flat select ran the tokenize+shingle pass three times and the
    // full hash pass twice per row.
    df.select(col(idCol).as("id"),
        Sketches.word_shingles(col(textCol), shingleN).as("shingles"))
      .withColumn("sig", Sketches.minhash_from_shingles(col("shingles"), numHashes))
      .withColumn("bands", Sketches.band_hashes(col("sig"), bands))
  }

  /** Banded candidates verified by the signature estimate — the shared
    * middle of every est-thresholded pipeline (`dedup_clusters`,
    * `leakage_safe_split`, the incremental probe's batch-internal leg):
    * `candidatePairs` (singleton drop + mega-bucket star) over a
    * `prepareMinhash` frame, signatures joined back, agreeing-position
    * estimate attached. Returns (id_l, id_r, est_jaccard) ≥ threshold.
    */
  def estVerifiedPairs(prepared: DataFrame, numHashes: Int,
                       threshold: Double): DataFrame = {
    val sigs = prepared.select(col("id"), col("sig"))
    candidatePairs(prepared, "id", "bands")
      .join(sigs.withColumnRenamed("id", "id_l").withColumnRenamed("sig", "sig_l"), "id_l")
      .join(sigs.withColumnRenamed("id", "id_r").withColumnRenamed("sig", "sig_r"), "id_r")
      .withColumn("est_jaccard", estJaccard(col("sig_l"), col("sig_r"), numHashes))
      .filter(col("est_jaccard") >= threshold)
      .select("id_l", "id_r", "est_jaccard")
  }

  /** Full MinHash near-dup pipeline: shingle → sign → band → candidates →
    * verify with exact Jaccard on shingle sets. Returns (id_l, id_r,
    * jaccard) for pairs ≥ threshold.
    */
  def minhashNearDupPairs(df: DataFrame, idCol: String, textCol: String,
                          shingleN: Int = 3, numHashes: Int = 64,
                          bands: Int = 16, threshold: Double = 0.5): DataFrame = {
    val prepared = prepareMinhash(df, idCol, textCol, shingleN, numHashes, bands)
    val cands = candidatePairs(prepared, "id", "bands")
    val side = prepared.select(col("id"), col("shingles"))
    cands
      .join(side.withColumnRenamed("id", "id_l").withColumnRenamed("shingles", "sh_l"), "id_l")
      .join(side.withColumnRenamed("id", "id_r").withColumnRenamed("shingles", "sh_r"), "id_r")
      .withColumn("jaccard", graft.functions.Sketches.jaccard(col("sh_l"), col("sh_r")))
      .filter(col("jaccard") >= threshold)
      .select("id_l", "id_r", "jaccard")
  }

  // ------------------------------------------------------------------
  // Duplicate clusters (connected components over near-dup pairs)
  // ------------------------------------------------------------------

  /** Connected components over an undirected pair list by iterative
    * minimum-label propagation WITH POINTER DOUBLING: each iteration a
    * node adopts the min label among itself and its neighbors (one
    * edge join + min-aggregation), then labels compress through one
    * label-of-label lookup (`cluster := min(cluster, label(cluster))`)
    * — the hash-to-min/pointer-jumping step that makes convergence
    * O(log diameter) instead of O(diameter). A plain 1-hop loop
    * needs as many iterations as the longest chain: a 235-member
    * Hamming-chain cluster in the sf0.01 fixture (empty/boilerplate
    * docs) has diameter far over any sane iteration bound, and an
    * unconverged loop silently SPLITS clusters.
    *
    * Returns (id, cluster) where cluster = min id of the component —
    * singletons keep their own id. This is the step AFTER near-dup pair
    * detection in a dedup pipeline: pairs → clusters → keep one canonical
    * doc per cluster.
    *
    * Two physical strategies behind one result, picked by a materialized
    * edge count (never a guess): at or below `driverEdgeLimit` LONG-keyed
    * edges the component problem is solved with union-find on the driver
    * (one collect of broadcast-scale data instead of O(log diameter)
    * multi-stage jobs); above it, or for non-long ids, the distributed
    * pointer-doubling loop runs. Set `driverEdgeLimit = 0` to force the
    * loop.
    */
  def connectedComponents(nodes: DataFrame, idCol: String,
                          pairs: DataFrame, maxIter: Int = 10,
                          checkpointInterval: Int = 3,
                          driverEdgeLimit: Long = 4000000L): DataFrame = {
    import org.apache.spark.sql.functions.{col => c}
    val spark = pairs.sparkSession
    val reliable = spark.sparkContext.getCheckpointDir.isDefined
    // Durable materialization: a reliable checkpoint (HDFS/object store)
    // when the session has a checkpoint dir — survives executor loss, the
    // requirement for long chains on a real cluster — else an
    // executor-local checkpoint (fine in local mode / short loops).
    def durable(df: DataFrame): DataFrame =
      if (reliable) df.checkpoint(eager = true) else df.localCheckpoint(eager = true)

    // Canonical undirected edge list (src < dst, self-loops dropped),
    // durably materialized ONCE: the pair pipeline upstream (shingle →
    // sign → band join) is the expensive part; everything below — the
    // size probe, the driver fast path's collect, or every loop
    // iteration — reads this checkpoint, never the pipeline.
    val undirected = durable(
      pairs.select(least(c("id_l"), c("id_r")).as("src"),
          greatest(c("id_l"), c("id_r")).as("dst"))
        .where(c("src") =!= c("dst"))
        .distinct())
    val edgeCount = undirected.count() // scans the checkpoint, not the pipeline

    // SMALL-GRAPH FAST PATH (the common case, even at 100 TB): after
    // LSH/banded candidate generation the duplicate-pair graph is a
    // vanishing fraction of the corpus — typically well under the size
    // of a broadcastable join side. Solving it with union-find on the
    // driver replaces O(log diameter) distributed jobs (each several
    // shuffle stages of scheduling overhead) with one collect of data
    // we could have broadcast anyway. Same stats-gated philosophy as
    // Relational.broadcastIfBounded: take the cheap plan only when a
    // MATERIALIZED count proves it safe, fall back to the scalable
    // loop otherwise. 4M edges ≈ 64 MB of packed longs — the same
    // order as spark.sql.autoBroadcastJoinThreshold'd build sides.
    val longIds = undirected.schema.fields.forall(_.dataType ==
      org.apache.spark.sql.types.LongType)
    val labels: DataFrame =
      if (longIds && edgeCount <= driverEdgeLimit)
        driverUnionFindLabels(spark, undirected)
      else
        loopLabels(undirected, maxIter, checkpointInterval, reliable, durable)

    // singletons (no edges) keep their own id as cluster
    nodes.select(c(idCol).as("id"))
      .join(labels.withColumnRenamed("cluster", "_c"), Seq("id"), "left")
      .select(c("id"), coalesce(c("_c"), c("id")).as("cluster"))
  }

  /** Driver-side union-find over a proven-small edge list. Union-by-min
    * (the smaller root adopts the larger) keeps the invariant that every
    * root IS the minimum id of its set, so labels match the distributed
    * loop's min-label fixpoint exactly. Path compression bounds the find
    * chains. Emits only non-root mappings — roots and singletons coalesce
    * to their own id in the caller's final left join.
    */
  private def driverUnionFindLabels(spark: SparkSession,
                                    undirected: DataFrame): DataFrame = {
    val parent = new scala.collection.mutable.LongMap[Long]()
    def find(x: Long): Long = {
      var r = x
      while (parent.getOrElse(r, r) != r) r = parent(r)
      var cur = x // compress the chain we just walked
      while (parent.getOrElse(cur, cur) != cur) {
        val nxt = parent(cur); parent(cur) = r; cur = nxt
      }
      r
    }
    val it = undirected.toLocalIterator() // streams the checkpoint partition-at-a-time
    while (it.hasNext) {
      val row = it.next()
      val ra = find(row.getLong(0)); val rb = find(row.getLong(1))
      if (ra != rb) {
        if (ra < rb) parent(rb) = ra else parent(ra) = rb
      }
    }
    val out = parent.keysIterator.map(id => (id, find(id))).toSeq
    import spark.implicits._
    out.toDF("id", "cluster")
  }

  /** Distributed min-label propagation with pointer doubling — the
    * large-graph path; see connectedComponents for the iteration
    * invariants. `undirected` must be durably materialized by the caller.
    */
  private def loopLabels(undirected: DataFrame, maxIter: Int,
                         checkpointInterval: Int, reliable: Boolean,
                         durable: DataFrame => DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.{col => c}
    // both directions, derived from the checkpointed undirected list
    // (a map-side union — no distinct needed, src<dst keeps the halves
    // disjoint)
    val edges = undirected.union(
      undirected.select(c("dst").as("src"), c("src").as("dst")))
    // Iterate ONLY over nodes that touch an edge: a node with no edges
    // is its own cluster from the start (a fixed point of the loop), so
    // carrying it through every join+agg wastes |V|/|V(edges)|× the
    // work — in dedup the pair graph is sparse (most documents are
    // unique), so this is the dominant constant factor of the loop.
    // Singletons rejoin in the caller's final left join.
    var labels = edges.select(c("src").as("id")).distinct()
      .select(c("id"), c("id").as("cluster"))
    var cached: Option[DataFrame] = None
    var converged = false
    var iter = 0
    while (!converged && iter < maxIter) {
      // min neighbor label per node, pre-aggregated (map-side combine on
      // the edge join output keeps the shuffle narrow)
      val neighborMin = edges
        .join(labels, edges("src") === labels("id"))
        .select(c("dst").as("id"), c("cluster"))
        .groupBy("id").agg(min("cluster").as("ncluster"))
      // 1-hop step: min of own and neighbor labels
      val hop = labels.join(neighborMin, Seq("id"), "left")
        .select(c("id"), c("cluster").as("old_cluster"),
          least(c("cluster"), coalesce(c("ncluster"), c("cluster"))).as("hcluster"))
      // pointer doubling: look the label up as a node id and take ITS
      // label too — every label value is a node id present in `labels`
      // (labels are mins over edge-node ids), so the lookup is a self
      // equi-join on the same small set. One pass computes both the
      // compressed label and the changed flag; the single
      // materialization below is the only real job per iteration — the
      // convergence probe scans the cached result, recomputing nothing.
      val byId = hop.select(c("id").as("lid"), c("hcluster").as("lcluster"))
      val step = hop.join(byId, hop("hcluster") === byId("lid"), "left")
        .select(hop("id"),
          least(c("hcluster"), coalesce(c("lcluster"), c("hcluster"))).as("cluster"),
          (least(c("hcluster"), coalesce(c("lcluster"), c("hcluster")))
            < c("old_cluster")).as("changed"))
      // checkpoint-INTERVAL pattern (GraphX-style): a durable checkpoint
      // every `checkpointInterval`-th iteration bounds both the recompute
      // window after executor loss and the lineage the analyzer carries;
      // iterations in between land in a spillable cache, which is what
      // feeds the probe and the next join — per-iteration durable writes
      // would pay distributed-FS IO on every step for no extra safety.
      val next =
        if (reliable && (iter + 1) % checkpointInterval != 0)
          step.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        else durable(step)
      // full-scan probe (no limit): the one job per iteration that both
      // materializes EVERY partition of `next` (checkpoint write or cache
      // fill — a limit(1) probe would early-exit and leave the cache
      // partial, pushing recompute through already-unpersisted parents)
      // and returns the convergence flag
      val probe = next.agg(org.apache.spark.sql.functions.max(c("changed"))).head()
      converged = probe.isNullAt(0) || !probe.getBoolean(0)
      // the previous iteration's cache fed `next`'s materialization; once
      // the probe has run, nothing re-reads it
      cached.foreach(_.unpersist(blocking = false))
      cached = if (next ne step) None else Some(next)
      labels = next.select("id", "cluster")
      iter += 1
    }
    labels
  }

  // ------------------------------------------------------------------
  // SimHash
  // ------------------------------------------------------------------

  /** 60-bit SimHash over tokens — the HOF executable spec of
    * `Sketches.simhash` (test-only; interpreted, re-hashes per bit): bit
    * i is the sign of Σ_tokens ±1 where the sign is bit i of the token's
    * portable polyHash (low half P1 family, high half P2). Bit masks are
    * a literal array (HOF lambda variables can't be shift amounts).
    */
  def simhash(toks: Column): Column = {
    import graft.functions.{MathExprs, Sketches}
    val masks = typedlit((0 until 30).map(1L << _))
    def half(mod: Long): Column = {
      val bitSums = transform(sequence(lit(0), lit(29)), i =>
        aggregate(toks, lit(0L), (acc, t) =>
          acc + when(MathExprs.polyHash(t, mod)
            .bitwiseAND(element_at(masks, i + 1)) =!= 0, 1L).otherwise(-1L)))
      aggregate(
        zip_with(bitSums, masks, (s, m) => when(s > 0, m).otherwise(lit(0L))),
        lit(0L), (acc, v) => acc.bitwiseOR(v))
    }
    half(Sketches.P1).bitwiseOR(shiftleft(half(Sketches.P2), 30))
  }

  /** Hamming distance between two 64-bit fingerprints. */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** SimHash near-dup pairs with Hamming ≤ maxDist, candidates from
    * 15-bit band equality over the 60-bit fingerprint (any doc pair
    * within Hamming ≤ 3 shares at least one of 4 bands — pigeonhole).
    *
    * Memory/skew guards: normal buckets pair via a within-bucket
    * self-join whose candidates stream through the join iterator (the
    * Hamming test is a residual join predicate — no O(|bucket|²)
    * intermediate ever materializes), and buckets over `maxBucketSize`
    * short-circuit to a min-id-hub star — identical fingerprints
    * collide on ALL bands, so the degenerate mass-duplicate shape lands
    * here too, and its star edges are at distance 0 (kept).
    */
  def simhashNearDupPairs(df: DataFrame, idCol: String, textCol: String,
                          maxDist: Int = 3, maxBucketSize: Int = 4096,
                          approximate: Boolean = false): DataFrame =
    bandedHammingPairs(
      df.select(col(idCol).as("id"),
        graft.functions.Sketches.simhash(col(textCol)).as("sh")),
      nBands = 4, bandBits = 15, maxDist = maxDist,
      maxBucketSize = maxBucketSize, approximate = approximate)

  /** Near-dup pairs at Hamming ≤ maxDist over ANY integer fingerprint
    * column, candidates from band equality: the fingerprint splits into
    * `nBands` bands of `bandBits` bits, and a pair within Hamming ≤
    * nBands−1 shares at least one unchanged band (pigeonhole), so band
    * buckets are an EXACT candidate set for any `maxDist ≤ nBands−1`.
    * Input must have columns `(id, sh)`; the same bucket/skew guards as
    * documented above apply (this IS the simhash join, parametrized —
    * `media_near_dup` reuses it over the 63-bit perceptual dHash with
    * 9×7-bit bands).
    */
  def bandedHammingPairs(withFp: DataFrame, nBands: Int, bandBits: Int,
                         maxDist: Int, maxBucketSize: Int = 4096,
                         approximate: Boolean = false): DataFrame = {
    // EXACTNESS is conditional: candidates are provably complete only
    // for maxDist <= nBands-1 (pigeonhole); a larger maxDist is the
    // standard APPROXIMATE simhash-LSH trade — band collisions as a
    // recall-oriented candidate filter, every emitted pair still
    // Hamming-verified. The approximate regime is OPT-IN (ADVICE r10):
    // a caller relying on the old exact-candidate contract fails loudly
    // here instead of silently losing recall.
    require(approximate || maxDist <= nBands - 1,
      s"bandedHammingPairs: maxDist=$maxDist > nBands-1=${nBands - 1} is " +
        "only complete as a recall-oriented approximation — pass " +
        "approximate = true to opt into the LSH recall regime, or raise " +
        "nBands for exact candidates")
    val bandMask = (1L << bandBits) - 1
    val banded = withFp.select(col("id"), col("sh"),
      explode(array((0 until nBands).map(b =>
        struct(lit(b).as("band"),
          shiftright(col("sh"), b * bandBits).bitwiseAND(bandMask).as("bh"))): _*)).as("bk"))
      .select(col("id"), col("sh"), col("bk.band"), col("bk.bh"))
    // same bucket-aggregation shape as candidatePairs: one shuffle,
    // singleton buckets dropped before any pair exists
    val buckets = banded.groupBy("band", "bh")
      .agg(collect_list(struct(col("id"), col("sh"))).as("ms"))
      .filter(size(col("ms")) > 1)
    val ms = col("ms")
    // NORMAL buckets (≤ maxBucketSize): within-bucket self-join on the
    // bucket key with id-order + Hamming as codegen'd residual
    // predicates. The k(k-1)/2 candidate combinations per bucket STREAM
    // through the sort-merge-join iterator — no per-member candidate
    // arrays (the previous transform+filter shape built O(k²) structs
    // per dense bucket: ~5.4M for the fixture's hamming-chain cluster
    // at sf0.1, which alone cost ~3 s); only pairs that survive the
    // Hamming test ever materialize as rows.
    val normMembers = buckets.filter(size(ms) <= maxBucketSize)
      .select(col("band"), col("bh"), explode(ms).as("m"))
      .select(col("band"), col("bh"),
        col("m.id").as("id"), col("m.sh").as("sh"))
    val l = normMembers.alias("l")
    val r = normMembers.alias("r")
    val normal = l.join(r,
        col("l.band") === col("r.band") && col("l.bh") === col("r.bh") &&
          col("l.id") < col("r.id") &&
          hamming(col("l.sh"), col("r.sh")) <= maxDist)
      .select(col("l.id").as("id_l"), col("r.id").as("id_r"),
        col("l.sh").as("sh_l"), col("r.sh").as("sh_r"))
    // MEGA buckets: min-id-hub star (connectivity-preserving bound —
    // array_min over an array of structs orders by the leading field,
    // so the hub is the min-id member). Star edges can exceed maxDist
    // for merely-colliding members, hence the post-filter below.
    // hub in its own projection then explode — an array_min referenced
    // inside a lambda is re-evaluated per element by the interpreted HOF
    // path (O(k²) per bucket; see candidatePairs / DegenerateCorpusSpec)
    val mega = buckets.filter(size(ms) > maxBucketSize)
      .withColumn("hub", array_min(ms))
      .select(col("hub"), explode(ms).as("m"))
      .filter(col("m.id") =!= col("hub.id"))
      .select(col("hub.id").as("id_l"), col("m.id").as("id_r"),
        col("hub.sh").as("sh_l"), col("m.sh").as("sh_r"))
    normal.union(mega)
      .select(col("id_l"), col("id_r"),
        hamming(col("sh_l"), col("sh_r")).as("dist"))
      .filter(col("dist") <= maxDist)
      .distinct()
  }

  // ------------------------------------------------------------------
  // Exact repeated substrings
  // ------------------------------------------------------------------

  /** Exact repeated-substring detection (the substring-level exact
    * dedup of Lee et al. 2021, "Deduplicating Training Data Makes
    * Language Models Better", §3.1 ExactSubstr): a w-token window that
    * occurs more than once ANYWHERE in the corpus (another document or
    * another position of the same document) marks its tokens as
    * duplicated text; overlapping/adjacent repeated windows merge into
    * maximal spans. Returns one row per document that contains at least
    * one repeated window: `id, n_windows, n_repeated, n_spans,
    * max_span_tokens, n_rep_tokens`.
    *
    * Scale shape (suffix arrays, the paper's single-node tool, don't
    * distribute; this is the shuffle-native equivalent):
    *  - windows come from ONE narrow kernel pass (`word_ngrams`) —
    *    docs × windows rows, no corpus materialization;
    *  - corpus-repeated windows use groupBy+count then an inner join
    *    back, NOT a count-over-gram-partition window: partial (map-side)
    *    aggregation absorbs the degenerate gram repeated 10⁶ times,
    *    where a window function would hand one task the whole gram
    *    partition;
    *  - the join prunes every non-repeated window before any per-doc
    *    work, so span assembly touches only duplicated text — a
    *    vanishing fraction of a real corpus;
    *  - span merging is lag/cumsum windows partitioned BY DOCUMENT
    *    (gaps-and-islands), bounded by per-doc window counts.
    */
  /** The corpus's repeated w-token windows as per-document exploded
    * positions: `(id, pos, gram)` for every window position. Shared by
    * span detection and span removal.
    */
  private def explodedWindows(df: DataFrame, idCol: String, textCol: String,
                              w: Int): DataFrame =
    df.select(col(idCol).as("id"),
      posexplode(graft.functions.Sketches.word_ngrams(col(textCol), w))
        .as(Seq("pos", "gram")))

  /** Merged maximal repeated spans `(id, sid, s, e, k)` from the exploded
    * window set: positions of corpus-repeated windows, merged when their
    * w-token intervals overlap or touch. The token interval of a span is
    * `[s, e + w)`. See `repeatedSubstringSpans` for the scale rationale
    * of each step.
    */
  private def mergedSpans(wins: DataFrame, w: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val repGrams = wins.groupBy("gram").agg(count(lit(1)).as("n_occ"))
      .filter(col("n_occ") > 1).select("gram")
    val rep = wins.join(repGrams, "gram").select("id", "pos")
    // windows at positions p, p' (p < p') merge iff p' - p <= w: their
    // token intervals [p, p+w) overlap or touch. lag+cumsum assigns
    // span ids; both windows share the (id, pos) sort, one shuffle.
    val byDoc = Window.partitionBy("id").orderBy("pos")
    val run = byDoc.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val lagPos = lag(col("pos"), 1).over(byDoc)
    val flagged = rep
      .withColumn("f",
        when(lagPos.isNull || col("pos") - lagPos > w, 1L).otherwise(0L))
      .withColumn("sid", sum(col("f")).over(run))
    flagged.groupBy("id", "sid")
      .agg(min("pos").as("s"), max("pos").as("e"), count(lit(1)).as("k"))
  }

  def repeatedSubstringSpans(df: DataFrame, idCol: String, textCol: String,
                             w: Int = 15): DataFrame = {
    val wins = explodedWindows(df, idCol, textCol, w)
    val spans = mergedSpans(wins, w)
    val perDoc = spans.groupBy("id")
      .agg(count(lit(1)).as("n_spans"),
        sum(col("e") - col("s") + w).as("n_rep_tokens"),
        max(col("e") - col("s") + w).cast("long").as("max_span_tokens"),
        sum(col("k")).as("n_repeated"))
    val totals = wins.groupBy("id").agg(count(lit(1)).as("n_windows"))
    perDoc.join(totals, "id")
      .select(col("id"), col("n_windows"), col("n_repeated"), col("n_spans"),
        col("max_span_tokens"), col("n_rep_tokens"))
  }

  /** Exact repeated-substring REMOVAL — the operation Lee et al.'s
    * ExactSubstr dedup actually performs (not just measures): every token
    * covered by a merged repeated span is cut from its document, and the
    * survivors reassemble in order into cleaned text. Returns one row per
    * input document: `(id, n_tokens, n_removed, n_kept, cleaned)` —
    * untouched documents pass through with their tokens rejoined
    * (single-space normalized, same as the cleaned docs) and
    * `n_removed = 0`.
    *
    * Scale shape: span detection is `repeatedSubstringSpans`'s pipeline
    * (groupBy+count+join, per-doc merge windows — see there). Removal
    * adds NO new corpus shuffle: spans aggregate to one bounded array per
    * affected document (a vanishing fraction of a real corpus), and that
    * tiny side broadcasts into a left join against a single narrow
    * re-tokenization pass. The per-token span-membership test runs only
    * on documents that actually carry spans (the CASE short-circuits the
    * rest), and spans within a doc are disjoint by construction (merge
    * distance = w), so `n_removed` is a plain sum of span widths.
    */
  def substringDedup(df: DataFrame, idCol: String, textCol: String,
                     w: Int = 15): DataFrame = {
    val wins = explodedWindows(df, idCol, textCol, w)
    val spanAgg = mergedSpans(wins, w).groupBy("id")
      .agg(sort_array(collect_list(struct(col("s"), col("e")))).as("spans"),
        sum(col("e") - col("s") + w).as("n_removed"))
    // tokens via the same kernel tokenization the windows came from
    // (word_ngrams with n=1), so span positions index this array exactly
    val docs = df.select(col(idCol).as("id"),
      graft.functions.Sketches.word_ngrams(col(textCol), 1).as("toks"))
    val sp = col("spans")
    docs.join(spanAgg, Seq("id"), "left")
      .withColumn("kept",
        when(sp.isNull, col("toks"))
          .otherwise(filter(col("toks"), (_, i) =>
            !exists(sp, s => i >= s.getField("s") &&
              i < s.getField("e") + lit(w)))))
      .select(col("id"),
        size(col("toks")).cast("long").as("n_tokens"),
        coalesce(col("n_removed"), lit(0L)).as("n_removed"),
        size(col("kept")).cast("long").as("n_kept"),
        concat_ws(" ", col("kept")).as("cleaned"))
  }
}
