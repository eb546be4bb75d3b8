package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Iterative BPE-style merge training over word symbols: each round
  * counts adjacent symbol pairs across the corpus, picks the single most
  * frequent pair (ties broken by the pair itself — fully deterministic),
  * and applies a left-to-right non-overlapping merge to every document.
  * `bpe_pair_counts` is one round's counting scan; this is the loop a
  * real tokenizer trainer runs (Sennrich et al. 2016 operate on
  * characters within words; word symbols keep the fixture's loop
  * identical in shape while staying oracle-verifiable).
  *
  * Scale design:
  *  - per round, ONE aggregation shuffle whose map side pre-combines to
  *    distinct-pairs-per-partition; only the global top-1 row reaches the
  *    driver (the "merge table" of the round — broadcast by construction,
  *    it rides into the next round's kernel as literals);
  *  - the merge pass is a narrow single-pass kernel
  *    (`Sketches.bpe_merge`) — no shuffle between rounds;
  *  - iterate-with-materialization (the `Dedup.loopLabels` pattern): each
  *    round's state lands in a spillable cache, with a durable checkpoint
  *    every `checkpointInterval`-th round when the session has a
  *    checkpoint dir — bounding lineage and the recompute window after
  *    executor loss on long trainings;
  *  - documents that can no longer pair (< 2 symbols) drop out of the
  *    working set permanently.
  */
object Bpe {

  /** Train `rounds` merges over whitespace-token WORD symbols of
    * `textCol`. Returns `(round, first, second, n)` — the merge chosen
    * each round and its pair frequency at selection time. Stops early if
    * the corpus runs out of pairs.
    */
  def train(docs: DataFrame, textCol: String, rounds: Int,
            checkpointInterval: Int = 3): DataFrame =
    trainLoop(
      docs.select(graft.functions.Sketches.word_ngrams(col(textCol), 1).as("syms"))
        .withColumn("cnt", lit(1L)),
      rounds, checkpointInterval)

  /** Sennrich et al. 2016 CHAR-mode training: initial symbols are the
    * characters WITHIN each word, the last carrying the `</w>`
    * end-of-word marker, and merges never cross word boundaries. The
    * working set is the frequency-weighted VOCABULARY, not the corpus —
    * identical words collapse to one row with `cnt` = corpus occurrences
    * and every pair count is `sum(cnt)` — which is also the 100 TB
    * design: after the one corpus-wide vocabulary aggregation, every
    * round's cost is O(|vocab|) regardless of corpus size (the classic
    * word-frequency-dict formulation of the paper's algorithm 1, as a
    * dataflow). Same kernels, same loop, same tie-break as word mode.
    */
  def trainChars(docs: DataFrame, textCol: String, rounds: Int,
                 checkpointInterval: Int = 3): DataFrame =
    trainLoop(
      docs.select(explode(
          graft.functions.Sketches.word_ngrams(col(textCol), 1)).as("word"))
        .groupBy("word").agg(count(lit(1)).as("cnt"))
        .select(graft.functions.Sketches.char_symbols(col("word")).as("syms"),
          col("cnt")),
      rounds, checkpointInterval)

  /** The shared loop over `(syms: ARRAY<STRING>, cnt: LONG)` state rows:
    * pair counts are weighted by `cnt` (word mode passes cnt=1 — sum ≡
    * count), so both modes share one plan shape.
    */
  private def trainLoop(init: DataFrame, rounds: Int,
                        checkpointInterval: Int): DataFrame = {
    val spark = init.sparkSession
    val reliable = spark.sparkContext.getCheckpointDir.isDefined
    val syms = col("syms")
    // rows that can never pair leave up front
    var state = init.filter(size(syms) >= 2)
      .persist(StorageLevel.MEMORY_AND_DISK)
    var prev: Option[DataFrame] = None
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    var r = 1
    var exhausted = false
    while (r <= rounds && !exhausted) {
      // adjacent pairs with multiplicity in ONE kernel walk per row
      // (the earlier transform(sequence)/element_at HOF paid interpreted
      // lambda dispatch per element, the dominant per-round cost)
      val top = state
        .select(col("cnt"),
          explode(graft.functions.Sketches.adjacent_pairs(syms)).as("p"))
        .groupBy(col("p.first").as("first"), col("p.second").as("second"))
        .agg(sum(col("cnt")).as("n"))
        .orderBy(desc("n"), col("first"), col("second"))
        .limit(1)
        .collect() // exactly one row per round — the round's merge table
      // the job above also materialized `state`'s cache; the previous
      // round's state fed it and is never read again
      prev.foreach(_.unpersist(blocking = false))
      prev = Some(state)
      if (top.isEmpty) exhausted = true
      else {
        val (f, s, n) = (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        merges += ((r, f, s, n))
        if (r < rounds) {
          val next = state
            .select(graft.functions.Sketches.bpe_merge(syms, f, s).as("syms"),
              col("cnt"))
            .filter(size(syms) >= 2)
          state =
            if (reliable && r % checkpointInterval == 0) next.checkpoint(eager = false)
            else next.persist(StorageLevel.MEMORY_AND_DISK)
        }
      }
      r += 1
    }
    prev.foreach(_.unpersist(blocking = false))
    if (state ne null) state.unpersist(blocking = false)
    toMergesDf(spark, merges.toSeq)
  }

  /** Tokenizer APPLICATION — the other half of the lifecycle: apply an
    * ordered merge list (what [[train]] produced) to the corpus, one
    * narrow kernel pass per merge, no shuffles at all. Unlike the
    * training loop, NO row is filtered out: a document too short to
    * pair still encodes to its own symbols (`bpe_merge` is the identity
    * on <2-symbol arrays). The merge table is driver-side literals —
    * trained vocabularies are broadcast-scale by construction.
    */
  def encode(docs: DataFrame, textCol: String,
             merges: Seq[(String, String)],
             keep: Seq[String] = Nil): DataFrame =
    merges.foldLeft(
      docs.select(keep.map(col) :+
        graft.functions.Sketches.word_ngrams(col(textCol), 1).as("syms"): _*)
    ) { case (df, (f, s)) =>
      df.select(keep.map(col) :+
        graft.functions.Sketches.bpe_merge(col("syms"), f, s).as("syms"): _*)
    }

  /** Inverse of [[encode]] — the decode half of the lifecycle. A merged
    * symbol carries its constituents SPACE-JOINED (`"a b"`, see
    * `BpeMergeExpr`), so word-mode decode is one `array_join` with a
    * single space; the result is the whitespace-NORMALIZED original
    * (tokenization collapses whitespace runs — BPE round-trips the token
    * sequence, not raw bytes). Zero-shuffle codegen'd projection; the
    * merge list is not needed to decode — exactly the property that
    * makes BPE vocabularies losslessly reversible.
    */
  def decode(encoded: DataFrame, symsCol: String = "syms",
             keep: Seq[String] = Nil): DataFrame =
    encoded.select(keep.map(col) :+
      array_join(col(symsCol), " ").as("text"): _*)

  /** Char-mode decode of ONE WORD's symbol array (the [[trainChars]]
    * representation): merged symbols interleave artificial spaces and
    * the last carries the `</w>` end-of-word marker, so decode joins,
    * strips every space (a whitespace-split word can contain none of its
    * own), and removes ONE trailing marker — a word whose literal text
    * ends in `</w>` keeps its own copy.
    */
  def decodeChars(syms: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    regexp_replace(
      regexp_replace(array_join(syms, ""), " ", ""),
      java.util.regex.Pattern.quote(
        graft.functions.CharSymbolsExpr.EndOfWord) + "$", "")

  private def toMergesDf(spark: SparkSession,
                         merges: Seq[(Int, String, String, Long)]): DataFrame = {
    import spark.implicits._
    merges.toDF("round", "first", "second", "n")
  }
}
